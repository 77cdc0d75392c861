"""Forward kinematics for RobotModel trees.

The body loop is a static Python unroll (NB ~ 14-22 bodies) — XLA sees one
flat fused graph per robot; batching over envs comes from `vmap` outside.

Works on a single robot instance: q (nq,), qd (ndof,). All outputs are in
world coordinates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from steppingstone_tpu.core import quaternion as qt
from steppingstone_tpu.physics.model import RobotModel


class Kin(NamedTuple):
    """Per-body world-frame kinematics (leading axis NB)."""

    pos: jnp.ndarray    # (NB, 3) body frame origin
    quat: jnp.ndarray   # (NB, 4) body orientation
    axis: jnp.ndarray   # (NB, 3) world joint axis (row 0 zero)
    com: jnp.ndarray    # (NB, 3) world CoM position
    R: jnp.ndarray      # (NB, 3, 3) rotation matrices
    inertia_w: jnp.ndarray  # (NB, 3, 3) rotational inertia about CoM, world axes


def split_q(model: RobotModel, q: jnp.ndarray):
    return q[0:3], q[3:7], q[7:]


def split_qd(model: RobotModel, qd: jnp.ndarray):
    return qd[0:3], qd[3:6], qd[6:]


def forward_kinematics(model: RobotModel, q: jnp.ndarray) -> Kin:
    root_pos, root_quat, qj = split_q(model, q)

    pos = [root_pos]
    quat = [root_quat]
    axis = [jnp.zeros(3, dtype=q.dtype)]
    has_rot = model.joint_rot is not None
    for i in range(1, model.nbodies):
        p = int(model.parent[i])
        anchor = jnp.asarray(model.joint_anchor[i], dtype=q.dtype)
        ax_local = jnp.asarray(model.joint_axis[i], dtype=q.dtype)
        p_i = pos[p] + qt.rotate(quat[p], anchor)
        q_parent = quat[p]
        if has_rot:
            # fixed frame rotation (URDF <origin rpy>) before the hinge
            q_parent = qt.mul(q_parent, jnp.asarray(model.joint_rot[i], dtype=q.dtype))
        q_i = qt.mul(q_parent, qt.from_axis_angle(ax_local, qj[i - 1]))
        pos.append(p_i)
        quat.append(q_i)
        # rotating about own axis leaves it fixed: world axis via parent or self
        axis.append(qt.rotate(q_i, ax_local))

    pos = jnp.stack(pos)
    quat = jnp.stack(quat)
    axis = jnp.stack(axis)
    R = qt.to_matrix(quat)
    com = pos + jnp.einsum("bij,bj->bi", R, jnp.asarray(model.com, dtype=q.dtype),
                           precision="highest")
    I_body = jnp.zeros((model.nbodies, 3, 3), dtype=q.dtype).at[
        :, jnp.arange(3), jnp.arange(3)
    ].set(jnp.asarray(model.inertia, dtype=q.dtype))
    inertia_w = jnp.einsum("bij,bjk,blk->bil", R, I_body, R, precision="highest")
    return Kin(pos=pos, quat=quat, axis=axis, com=com, R=R, inertia_w=inertia_w)


def body_velocities(model: RobotModel, kin: Kin, qd: jnp.ndarray) -> jnp.ndarray:
    """Spatial velocities [w; v_O] of every body, origin at the root position.

    Returns (NB, 6). Root linear velocity in qd is the velocity of the root
    point itself, which coincides with the re-centered origin.
    """
    omega0, v0, qdj = split_qd(model, qd)
    root = kin.pos[0]
    v = [jnp.concatenate([omega0, v0])]
    for i in range(1, model.nbodies):
        p = int(model.parent[i])
        # motion subspace of revolute joint about world axis a through point p_i
        a = kin.axis[i]
        phi = jnp.concatenate([a, jnp.cross(kin.pos[i] - root, a)])
        v.append(v[p] + phi * qdj[i - 1])
    return jnp.stack(v)


def contact_points(model: RobotModel, kin: Kin) -> jnp.ndarray:
    """World positions of all contact sphere centers: (NC, 3)."""
    b = model.contact_body
    offs = jnp.asarray(model.contact_offset, dtype=kin.pos.dtype)
    return kin.pos[b] + jnp.einsum("cij,cj->ci", kin.R[b], offs,
                                   precision="highest")


def contact_point_velocities(
    model: RobotModel, kin: Kin, vel: jnp.ndarray, points: jnp.ndarray
) -> jnp.ndarray:
    """World velocities of contact sphere centers: (NC, 3)."""
    b = model.contact_body
    root = kin.pos[0]
    vb = vel[b]
    return vb[:, 3:] + jnp.cross(vb[:, :3], points - root)
