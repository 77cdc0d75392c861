"""Penalty contact between robot contact spheres and the terrain.

Terrain = a set of stepping stones (tilted discs) plus an optional infinite
ground plane at z=0 — the geometry family of the reference's stepper envs
(SURVEY.md §2.9: `terrain_info` rows are (x, y, z, phi, x_tilt, y_tilt)).

Everything is branchless (`where`-masked) so it vmaps over envs and stones.
Forces are spring-damper normal + clamped viscous (Coulomb-capped) friction,
stable at the 240 Hz substep rate used by the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from steppingstone_tpu.core import spatial as sp


class ContactParams(NamedTuple):
    """Penalty gains, sized for explicit 240 Hz substeps. The binding
    constraint is the ANKLE-rotation effective mass at the toe lever
    (m_eff = I_foot / r^2 ~ 0.6 kg): explicit dampers need
    c < 2 m_eff / dt ~ 290 N s/m *summed over the foot's contacts*, and
    springs need sqrt(k/m_eff) dt < ~1 per contact. Friction is
    additionally Coulomb-capped, which bounds any residual chatter."""

    kn: float = 15000.0      # normal spring stiffness (N/m) per contact
    cn: float = 60.0         # normal damping (N s/m)
    mu: float = 1.0          # Coulomb friction coefficient
    kt: float = 150.0        # tangential viscous gain (N s/m)
    margin: float = 0.02     # lateral overhang allowed beyond stone rim (m)


class ContactOut(NamedTuple):
    force: jnp.ndarray        # (NC, 3) world contact force on each sphere
    normal_force: jnp.ndarray  # (NC,) scalar normal force magnitude
    stone_index: jnp.ndarray  # (NC,) int index of supporting stone (-1 = ground/none)
    in_contact: jnp.ndarray   # (NC,) bool


def stone_normals(stones: jnp.ndarray) -> jnp.ndarray:
    """Top-surface unit normals from (x_tilt, y_tilt) tilt angles.

    stones: (S, 6) rows (x, y, z, phi, x_tilt, y_tilt); the disc's normal is
    the +z axis rotated by x_tilt about x then y_tilt about y (small angles).
    """
    xt, yt = stones[..., 4], stones[..., 5]
    nx = jnp.sin(yt) * jnp.cos(xt)
    ny = -jnp.sin(xt)
    nz = jnp.cos(yt) * jnp.cos(xt)
    return jnp.stack([nx, ny, nz], axis=-1)


def support_axes(stones: jnp.ndarray):
    """In-plane unit axes of each stone's top surface: ux along the stone's
    heading phi (walking direction) projected onto the tilted plane,
    uy = n x ux (lateral). Used for box ("plank") support bounds —
    the reference's Plank/LargePlank support objects (mocca `plank_class`,
    SURVEY.md §2.9) are boxes elongated laterally, not discs."""
    normals = stone_normals(stones)
    phi = stones[..., 3]
    h = jnp.stack([jnp.cos(phi), jnp.sin(phi), jnp.zeros_like(phi)], axis=-1)
    hn = jnp.einsum("...k,...k->...", h, normals)
    ux = h - hn[..., None] * normals
    # 1e-12 guard matches the Pallas kernel (pallas_step.py): heading
    # parallel to the normal is unreachable at the 15-degree tilt bound
    # but must not NaN if ranges ever widen
    ux = ux / jnp.sqrt(
        jnp.sum(ux * ux, axis=-1, keepdims=True) + 1e-12
    )
    uy = jnp.cross(normals, ux)
    return ux, uy


def compute_contacts(
    points: jnp.ndarray,       # (NC, 3) sphere centers, world
    velocities: jnp.ndarray,   # (NC, 3) sphere center velocities
    radius: jnp.ndarray,       # (NC,)
    stones: jnp.ndarray,       # (S, 6) stone rows
    stone_radius,              # scalar disc radius / plank half-length (walking dir)
    use_ground: jnp.ndarray,   # scalar bool: include plane z=0
    params: ContactParams = ContactParams(),
    support_hy: float | None = None,  # None: disc; else plank lateral half-extent
) -> ContactOut:
    normals = stone_normals(stones)                      # (S, 3)
    centers = stones[:, :3]                              # (S, 3)

    rel = points[:, None, :] - centers[None, :, :]       # (NC, S, 3)
    dist_n = jnp.einsum("csk,sk->cs", rel, normals)      # signed height above plane
    lat = rel - dist_n[..., None] * normals[None]        # tangential offset
    lat_d = jnp.linalg.norm(lat, axis=-1)

    pen = radius[:, None] - dist_n                       # (NC, S) penetration
    if support_hy is None:
        on_disc = lat_d <= stone_radius + params.margin
    else:
        # plank support: box bound in the stone's in-plane frame
        ux, uy = support_axes(stones)                    # (S, 3) each
        x_l = jnp.einsum("csk,sk->cs", lat, ux)
        y_l = jnp.einsum("csk,sk->cs", lat, uy)
        on_disc = (jnp.abs(x_l) <= stone_radius + params.margin) & (
            jnp.abs(y_l) <= support_hy + params.margin
        )
    # only contact the top surface, with a cap so a sphere far below a stone
    # doesn't snag it: valid while the center is above the mid-plane
    valid = on_disc & (pen > 0.0) & (dist_n > -radius[:, None])
    pen = jnp.where(valid, pen, -jnp.inf)

    # ground plane as an extra pseudo-stone
    g_pen = radius - points[:, 2]
    g_pen = jnp.where(use_ground & (g_pen > 0), g_pen, -jnp.inf)

    all_pen = jnp.concatenate([pen, g_pen[:, None]], axis=1)      # (NC, S+1)
    best = jnp.argmax(all_pen, axis=1)                            # deepest support
    best_pen = jnp.take_along_axis(all_pen, best[:, None], axis=1)[:, 0]
    in_contact = best_pen > 0.0

    ground_n = jnp.array([0.0, 0.0, 1.0], dtype=points.dtype)
    n_all = jnp.concatenate([normals, ground_n[None]], axis=0)    # (S+1, 3)
    n = n_all[best]                                               # (NC, 3)

    pen_c = jnp.maximum(best_pen, 0.0)
    vn = jnp.einsum("ck,ck->c", velocities, n)
    fn = params.kn * pen_c - params.cn * vn * (pen_c > 0)
    fn = jnp.maximum(fn, 0.0) * in_contact

    vt = velocities - vn[:, None] * n
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-8)
    ft_mag = jnp.minimum(params.mu * fn, params.kt * vt_norm)
    ft = -ft_mag[:, None] * vt / vt_norm[:, None]

    force = fn[:, None] * n + ft
    nstones = stones.shape[0]
    stone_index = jnp.where(in_contact & (best < nstones), best, -1)
    return ContactOut(
        force=force,
        normal_force=fn,
        stone_index=stone_index,
        in_contact=in_contact,
    )


def contact_forces_to_bodies(
    nbodies: int,
    contact_body: jnp.ndarray,  # (NC,) body index per sphere (static)
    points: jnp.ndarray,        # (NC, 3)
    root_pos: jnp.ndarray,      # (3,)
    force: jnp.ndarray,         # (NC, 3)
) -> jnp.ndarray:
    """Scatter point forces into per-body spatial forces (NB, 6)."""
    f_sp = sp.force_at_point(force, points - root_pos)   # (NC, 6)
    f_ext = jnp.zeros((nbodies, 6), dtype=force.dtype)
    return f_ext.at[contact_body].add(f_sp)
