"""6D spatial-vector algebra (Featherstone convention).

Spatial motion vectors are `[omega; v_O]` and force vectors `[n_O; f]`,
both expressed in a *world-aligned frame whose origin O is re-centered at
the robot root each dynamics call* (keeps magnitudes O(1) so fp32 stays
accurate as characters walk away from the world origin).

All functions broadcast over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix [v]x."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack(
        [zero, -z, y,
         z, zero, -x,
         -y, x, zero],
        axis=-1,
    )
    return m.reshape(v.shape[:-1] + (3, 3))


def cross_motion(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product v x m for motion vectors.

    v x m = [w_v x w_m ; w_v x v_m + v_v x w_m]
    """
    wv, vv = v[..., :3], v[..., 3:]
    wm, vm = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(wv, wm), jnp.cross(wv, vm) + jnp.cross(vv, wm)], axis=-1
    )


def cross_force(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product v x* f for force vectors.

    v x* f = [w_v x n_f + v_v x f_f ; w_v x f_f]
    """
    wv, vv = v[..., :3], v[..., 3:]
    nf, ff = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(wv, nf) + jnp.cross(vv, ff), jnp.cross(wv, ff)], axis=-1
    )


def inertia_matrix(mass, com, inertia_com: jnp.ndarray) -> jnp.ndarray:
    """6x6 spatial inertia about the (re-centered) origin.

    mass: (...,), com: (..., 3) position of the CoM relative to origin,
    inertia_com: (..., 3, 3) rotational inertia about the CoM, world axes.

        I = [[I_c - m*cx*cx,  m*cx ],
             [    -m*cx,      m*1_3]]

    (using cx^T = -cx; momentum h = I @ [w; v_O]).
    """
    cx = skew(com)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=com.dtype), cx.shape)
    top = jnp.concatenate(
        [inertia_com - m * jnp.matmul(cx, cx, precision="highest"), m * cx],
        axis=-1,
    )
    bot = jnp.concatenate([-m * cx, m * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inertia_mul(mass, com, inertia_com: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Compute I @ v without materializing the 6x6 (cheaper on the VPU).

    h_ang = I_c w + m * c x (v_O + w x c)
    h_lin = m * (v_O + w x c)
    """
    w, vo = v[..., :3], v[..., 3:]
    vc = vo + jnp.cross(w, com)
    h_lin = mass[..., None] * vc
    h_ang = (jnp.einsum("...ij,...j->...i", inertia_com, w, precision="highest")
             + jnp.cross(com, h_lin))
    return jnp.concatenate([h_ang, h_lin], axis=-1)


def force_at_point(f: jnp.ndarray, p: jnp.ndarray, torque: jnp.ndarray | None = None) -> jnp.ndarray:
    """Linear force f (..., 3) applied at point p (relative to origin) ->
    spatial force [p x f + torque ; f]."""
    n = jnp.cross(p, f)
    if torque is not None:
        n = n + torque
    return jnp.concatenate([n, f], axis=-1)


def point_velocity(v: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Velocity of the body-fixed point at position p (relative to origin)
    given the body's spatial velocity v = [w; v_O]: v_p = v_O + w x p."""
    return v[..., 3:] + jnp.cross(v[..., :3], p)
