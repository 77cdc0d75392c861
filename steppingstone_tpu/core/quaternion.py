"""Quaternion and SO(3) primitives.

Pure jnp functions, shape-polymorphic over leading batch dimensions (every
function works on `(..., 4)` / `(..., 3)` arrays so they can be freely
`vmap`-ed or used directly on batched env state).

Convention: quaternions are `(w, x, y, z)`, unit-norm, acting as rotations
of vectors from the *local* frame into the *world* frame
(`rotate(q, v_local) = R(q) @ v_local`).
"""

from __future__ import annotations

import jax.numpy as jnp


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b (apply b's rotation first, then a's)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def inv(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a *unit* quaternion (= conjugate)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q: world_v = R(q) @ v.

    Uses the expanded 15-mul form (cheaper than two Hamilton products).
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of q: local_v = R(q)^T @ v."""
    return rotate(inv(q), v)


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion for rotation of `angle` about unit `axis`.

    axis: (..., 3); angle: (...,) — broadcast together.
    """
    half = 0.5 * angle[..., None]
    return jnp.concatenate(
        [jnp.cos(half), axis * jnp.sin(half)], axis=-1
    )


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_euler_zyx(yaw: jnp.ndarray, pitch: jnp.ndarray, roll: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic Z(yaw)-Y(pitch)-X(roll) Euler angles -> quaternion."""
    cz, sz = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cy, sy = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cx, sx = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    return jnp.stack(
        [
            cz * cy * cx + sz * sy * sx,
            cz * cy * sx - sz * sy * cx,
            cz * sy * cx + sz * cy * sx,
            sz * cy * cx - cz * sy * sx,
        ],
        axis=-1,
    )


def to_euler_zyx(q: jnp.ndarray):
    """Quaternion -> (yaw, pitch, roll) for intrinsic Z-Y-X convention."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    sinp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    return yaw, pitch, roll


def integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """First-order integration of q under world-frame angular velocity.

    q(t+dt) = normalize(q + dt/2 * [0, omega] * q). First-order is exact
    enough at physics substep rates (240 Hz) and cheaper than exp-map.
    """
    omega_q = jnp.concatenate(
        [jnp.zeros_like(omega_world[..., :1]), omega_world], axis=-1
    )
    dq = 0.5 * mul(omega_q, q)
    return normalize(q + dt * dq)


def heading(q: jnp.ndarray) -> jnp.ndarray:
    """Heading (yaw) angle of the body x-axis projected onto the ground."""
    fwd = rotate(q, jnp.array([1.0, 0.0, 0.0], dtype=q.dtype))
    return jnp.arctan2(fwd[..., 1], fwd[..., 0])
