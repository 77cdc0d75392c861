"""Native URDF loader tests: C++ parse -> RobotModel -> simulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from steppingstone_tpu.physics import engine
from steppingstone_tpu.physics.urdf import load_urdf, parse_urdf

URDF = """<?xml version="1.0"?>
<robot name="testbot">
  <!-- a 2-link hopper with a fixed head -->
  <link name="base">
    <inertial>
      <mass value="5.0"/>
      <origin xyz="0 0 0.1"/>
      <inertia ixx="0.05" iyy="0.06" izz="0.04" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <origin xyz="0 0 0"/>
      <geometry><sphere radius="0.1"/></geometry>
    </collision>
  </link>
  <link name="head">
    <inertial>
      <mass value="1.0"/>
      <origin xyz="0 0 0.05"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="neck" type="fixed">
    <parent link="base"/>
    <child link="head"/>
    <origin xyz="0 0 0.3"/>
  </joint>
  <link name="right_thigh">
    <inertial>
      <mass value="2.0"/>
      <origin xyz="0 0 -0.2"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.005" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="right_hip" type="revolute">
    <parent link="base"/>
    <child link="right_thigh"/>
    <origin xyz="0 -0.1 -0.05" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.5" effort="80"/>
    <dynamics damping="0.5"/>
  </joint>
  <link name="right_foot">
    <inertial>
      <mass value="0.5"/>
      <origin xyz="0 0 -0.05"/>
      <inertia ixx="0.002" iyy="0.002" izz="0.002" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <origin xyz="0 0 -0.1"/>
      <geometry><sphere radius="0.04"/></geometry>
    </collision>
  </link>
  <joint name="right_knee" type="revolute">
    <parent link="right_thigh"/>
    <child link="right_foot"/>
    <origin xyz="0 0 -0.4" rpy="0.1 0 0"/>
    <axis xyz="0 1 0"/>
    <limit lower="-2.0" upper="0.1" effort="60"/>
  </joint>
</robot>
"""


def test_parse_raw():
    raw = parse_urdf(URDF)
    assert raw["name"] == "testbot"
    assert set(raw["links"]) == {"base", "head", "right_thigh", "right_foot"}
    types = {j["name"]: j["type"] for j in raw["joints"]}
    assert types == {"neck": "fixed", "right_hip": "revolute",
                     "right_knee": "revolute"}
    assert raw["links"]["base"]["mass"] == 5.0
    assert raw["links"]["right_foot"]["spheres"] == [[0, 0, -0.1, 0.04]]


def test_parse_error_reported():
    with pytest.raises(ValueError, match="URDF parse error"):
        parse_urdf("<robot><link name='x'></robot>")


def test_model_build_and_fixed_merge():
    m = load_urdf(URDF, root_height=1.0)
    # fixed head merged into base: 3 moving bodies, 2 joints
    assert m.nbodies == 3 and m.njoints == 2
    assert m.body_names == ("base", "right_thigh", "right_foot")
    assert m.joint_names == ("right_thigh", "right_foot")
    # lumped mass: base 5 + head 1
    assert m.mass[0] == pytest.approx(6.0)
    # lumped com between base com (0,0,.1) and head com (0,0,.35)
    assert m.com[0][2] == pytest.approx((5 * 0.1 + 1 * 0.35) / 6, rel=1e-5)
    # joint metadata flows through
    assert m.joint_lower[0] == pytest.approx(-1.5)
    assert m.torque_limit[1] == pytest.approx(60.0)
    assert m.joint_damping[0] == pytest.approx(0.5)
    # rpy on the knee joint produced a non-identity joint_rot
    assert abs(m.joint_rot[2][1]) > 0.01
    # contact spheres: base + foot
    assert m.ncontacts == 2


def test_urdf_model_simulates():
    m = load_urdf(URDF, root_height=1.2)
    state = engine.default_state(m)
    stones = jnp.zeros((1, 6))

    @jax.jit
    def run(state):
        def body(st, _):
            st, info = engine.step(m, st, jnp.zeros(m.njoints), stones, 0.3,
                                   jnp.asarray(True))
            return st, st.q[2]
        return jax.lax.scan(body, state, None, length=60)

    state, zs = run(state)
    assert np.isfinite(np.asarray(state.q)).all()
    # it fell and landed on its contact spheres, not through the floor
    assert float(state.q[2]) > -0.1
