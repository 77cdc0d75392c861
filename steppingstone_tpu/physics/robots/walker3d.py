"""Walker3D / Mike humanoid morphologies.

21 actuated DoF in the exact action order the reference's HUD labels
(reference `common/render_utils.py:47-69`): abdomen z/y/x, right hip x/z/y,
right knee, right ankle, left hip x/z/y, left knee, left ankle, right
shoulder x/z/y, right elbow, left shoulder x/z/y, left elbow. Obs/action
dims (60/21) are pinned by the reference checkpoints (SURVEY.md §2.8).

3-DoF joints (abdomen, hips, shoulders) are chains of single-axis revolute
joints through two low-mass intermediate links, ordered so that
joint index == action index.

Frame convention: x forward, y left, z up; right side of the body is -y.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from steppingstone_tpu.physics.model import RobotModel, build_model

# mirror metadata in *joint index* space (== action index space here):
# joints rotating about x or z flip sign under the y -> -y reflection.
MIRROR = {
    "neg_joints": [0, 2, 3, 4, 8, 9, 13, 14, 17, 18],
    "right_joints": [3, 4, 5, 6, 7, 13, 14, 15, 16],
    "left_joints": [8, 9, 10, 11, 12, 17, 18, 19, 20],
}


def _leg(side: str, sign: float, mass_scale: float, len_scale: float):
    s = len_scale
    hip_anchor = (0.0, sign * 0.10 * s, -0.04 * s)
    return [
        dict(name=f"{side}_hip_x", parent="pelvis", anchor=hip_anchor,
             axis=(1, 0, 0), mass=0.5 * mass_scale, inertia=(0.004, 0.004, 0.004),
             limits=(-0.9, 0.9), torque_limit=100.0, damping=1.0),
        dict(name=f"{side}_hip_z", parent=f"{side}_hip_x", anchor=(0, 0, 0),
             axis=(0, 0, 1), mass=0.5 * mass_scale, inertia=(0.004, 0.004, 0.004),
             limits=(-0.7, 0.7), torque_limit=100.0, damping=1.0),
        dict(name=f"{side}_thigh", parent=f"{side}_hip_z", anchor=(0, 0, 0),
             joint_name=f"{side}_hip_y", axis=(0, 1, 0),
             mass=4.5 * mass_scale, com=(0, 0, -0.21 * s),
             inertia=(0.07, 0.07, 0.02),
             limits=(-2.1, 0.7), torque_limit=160.0, damping=1.0,
             init_angle=-0.25),
        dict(name=f"{side}_shin", parent=f"{side}_thigh", anchor=(0, 0, -0.42 * s),
             joint_name=f"{side}_knee", axis=(0, 1, 0),
             mass=2.7 * mass_scale, com=(0, 0, -0.20 * s),
             inertia=(0.04, 0.04, 0.007),
             limits=(-0.02, 2.3), torque_limit=140.0, damping=1.0,
             init_angle=0.45),
        dict(name=f"{side}_foot", parent=f"{side}_shin", anchor=(0, 0, -0.41 * s),
             joint_name=f"{side}_ankle", axis=(0, 1, 0),
             mass=1.0 * mass_scale, com=(0.05 * s, 0, -0.03 * s),
             inertia=(0.002, 0.005, 0.005),
             limits=(-0.9, 0.9), torque_limit=90.0, damping=1.0,
             init_angle=-0.2),
    ]


def _arm(side: str, sign: float, mass_scale: float, len_scale: float):
    s = len_scale
    return [
        dict(name=f"{side}_shoulder_x", parent="torso",
             anchor=(0.0, sign * 0.17 * s, 0.35 * s),
             axis=(1, 0, 0), mass=0.3 * mass_scale, inertia=(0.002, 0.002, 0.002),
             limits=(-1.6, 1.6), torque_limit=60.0, damping=0.5),
        dict(name=f"{side}_shoulder_z", parent=f"{side}_shoulder_x", anchor=(0, 0, 0),
             axis=(0, 0, 1), mass=0.3 * mass_scale, inertia=(0.002, 0.002, 0.002),
             limits=(-1.6, 1.6), torque_limit=60.0, damping=0.5),
        dict(name=f"{side}_upper_arm", parent=f"{side}_shoulder_z", anchor=(0, 0, 0),
             joint_name=f"{side}_shoulder_y", axis=(0, 1, 0),
             mass=1.5 * mass_scale, com=(0, 0, -0.14 * s),
             inertia=(0.011, 0.011, 0.003),
             limits=(-2.6, 1.2), torque_limit=60.0, damping=0.5),
        dict(name=f"{side}_forearm", parent=f"{side}_upper_arm",
             anchor=(0, 0, -0.28 * s),
             joint_name=f"{side}_elbow", axis=(0, 1, 0),
             mass=1.2 * mass_scale, com=(0, 0, -0.12 * s),
             inertia=(0.007, 0.007, 0.002),
             limits=(-2.3, 0.05), torque_limit=50.0, damping=0.5,
             init_angle=-0.6),
    ]


def _humanoid(name: str, mass_scale: float, len_scale: float) -> RobotModel:
    s = len_scale
    # standing: hip 0.04 below root; thigh 0.42 + shin 0.41; foot sphere
    # bottom 0.08 below ankle -> root height ~ 0.95 (slightly less when
    # knees start bent; reset drops the character onto the stance stone).
    bodies = [
        dict(name="pelvis", mass=8.0 * mass_scale, com=(0, 0, 0),
             inertia=(0.07, 0.08, 0.06), root_height=0.95 * s),
        dict(name="abdomen_z_link", parent="pelvis", anchor=(0, 0, 0.10 * s),
             joint_name="abdomen_z", axis=(0, 0, 1),
             mass=0.5 * mass_scale, inertia=(0.004, 0.004, 0.004),
             limits=(-0.8, 0.8), torque_limit=100.0, damping=2.0),
        dict(name="abdomen_y_link", parent="abdomen_z_link", anchor=(0, 0, 0),
             joint_name="abdomen_y", axis=(0, 1, 0),
             mass=0.5 * mass_scale, inertia=(0.004, 0.004, 0.004),
             limits=(-0.9, 0.6), torque_limit=100.0, damping=2.0),
        dict(name="torso", parent="abdomen_y_link", anchor=(0, 0, 0),
             joint_name="abdomen_x", axis=(1, 0, 0),
             mass=18.0 * mass_scale, com=(0, 0, 0.24 * s),
             inertia=(0.45, 0.40, 0.22),
             limits=(-0.7, 0.7), torque_limit=100.0, damping=2.0),
        *_leg("right", -1.0, mass_scale, len_scale),
        *_leg("left", +1.0, mass_scale, len_scale),
        *_arm("right", -1.0, mass_scale, len_scale),
        *_arm("left", +1.0, mass_scale, len_scale),
    ]
    contacts = [
        dict(body="right_foot", offset=(-0.06 * s, 0, -0.04 * s), radius=0.04, foot=0),
        dict(body="right_foot", offset=(0.13 * s, 0, -0.04 * s), radius=0.04, foot=0),
        dict(body="left_foot", offset=(-0.06 * s, 0, -0.04 * s), radius=0.04, foot=1),
        dict(body="left_foot", offset=(0.13 * s, 0, -0.04 * s), radius=0.04, foot=1),
        # body spheres: keep fallen characters from sinking through terrain
        dict(body="pelvis", offset=(0, 0, 0), radius=0.12),
        dict(body="torso", offset=(0, 0, 0.24 * s), radius=0.14),
        dict(body="right_shin", offset=(0, 0, -0.2 * s), radius=0.05),
        dict(body="left_shin", offset=(0, 0, -0.2 * s), radius=0.05),
        dict(body="right_forearm", offset=(0, 0, -0.24 * s), radius=0.04),
        dict(body="left_forearm", offset=(0, 0, -0.24 * s), radius=0.04),
    ]
    return build_model(name, bodies, contacts)


@lru_cache(maxsize=None)
def walker3d() -> RobotModel:
    m = _humanoid("walker3d", mass_scale=1.0, len_scale=1.0)
    _check(m)
    return m


@lru_cache(maxsize=None)
def mike() -> RobotModel:
    """Mike: same skeleton as Walker3D, heavier and slightly taller
    (SURVEY.md §2.9: 'same skeleton, different morphology/mass')."""
    m = _humanoid("mike", mass_scale=1.45, len_scale=1.04)
    _check(m)
    return m


def _check(m: RobotModel):
    assert m.njoints == 21 and m.action_dim == 21, (m.njoints, m.action_dim)
    expected = [
        "abdomen_z", "abdomen_y", "abdomen_x",
        "right_hip_x", "right_hip_z", "right_hip_y", "right_knee", "right_ankle",
        "left_hip_x", "left_hip_z", "left_hip_y", "left_knee", "left_ankle",
        "right_shoulder_x", "right_shoulder_z", "right_shoulder_y", "right_elbow",
        "left_shoulder_x", "left_shoulder_z", "left_shoulder_y", "left_elbow",
    ]
    assert list(m.joint_names) == expected, m.joint_names
    assert np.all(m.actuated)
