"""Stepping-stone terrain generation and curriculum-conditioned sampling.

On-device replacement for the terrain logic of the reference's missing
`mocca_envs` submodule, built to the call-site contract of SURVEY.md §2.9
and the upstream mocca_envs `generate_step_placements` conventions:
`terrain_info` rows are (x, y, z, phi, x_tilt, y_tilt); stones are placed
in spherical steps (r, yaw, pitch) cumulative in heading, with pitch
measured as theta = pi/2 + pitch (positive pitch sample = downhill); an
11x11 (yaw x pitch) difficulty grid (`yaw_samples`/`pitch_samples`) drives
curriculum sampling; `update_sample_prob` installs a categorical
distribution over that grid; discrete difficulty levels 0..5 widen the
uniform ranges (level 5 = full range, reference `train.py:118,503-506`).

All samplers are pure `(key, curriculum_state) -> stones` functions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# ---- the difficulty grid (reference contract: 11 yaw x 11 pitch) --------
# ranges follow mocca_envs Walker3DStepperEnv: yaw +-20 deg, pitch +-50 deg,
# tilt +-15 deg, step distance 0.65..1.25 m
N_LEVELS = 6
GRID = 11
YAW_MAX = np.deg2rad(20.0)
PITCH_MAX = np.deg2rad(50.0)
TILT_MAX = np.deg2rad(15.0)
R_MIN, R_MAX = 0.65, 1.25
INIT_STEP_SEPARATION = 0.75

YAW_SAMPLES = np.linspace(-YAW_MAX, YAW_MAX, GRID).astype(np.float32)
PITCH_SAMPLES = np.linspace(-PITCH_MAX, PITCH_MAX, GRID).astype(np.float32)
R_SAMPLES = np.linspace(R_MIN, R_MAX, GRID).astype(np.float32)


class CurriculumState(NamedTuple):
    """Per-env curriculum knobs, stored as arrays so that changing them
    never retraces the train step (SURVEY.md §7 'recompilation discipline')."""

    level: jnp.ndarray        # () float32 in [0, 5] (fractional = ramped
    #                           interpolation between the reference's
    #                           integer levels, runtime/curriculum.py)
    sample_prob: jnp.ndarray  # (GRID, GRID) categorical over (yaw, pitch)
    use_prob: jnp.ndarray     # () bool — sample from the grid vs uniform
    # Support-geometry assist level, DECOUPLED from the sampling level:
    # in grid mode (use_prob) the 11x11 categorical drives (yaw, pitch)
    # and `level` is unused for sampling, but the walking-direction
    # overlap assist (stepper.py r_eff) must still be able to ramp from
    # carpet to calibrated geometry — round-4 threshold runs slammed
    # level 5 on uniform rounds (curriculum.py:178-180) so value-based
    # runs never saw the level-0 learnability assist the fixed
    # curriculum needed (round-4 verdict missing #2).
    assist: jnp.ndarray       # () float32 in [0, 5]


def default_curriculum(level: float = 0, assist=None) -> CurriculumState:
    p = jnp.full((GRID, GRID), 1.0 / (GRID * GRID), dtype=jnp.float32)
    return CurriculumState(
        level=jnp.asarray(level, dtype=jnp.float32),
        sample_prob=p,
        use_prob=jnp.asarray(False),
        assist=jnp.asarray(level if assist is None else assist, jnp.float32),
    )


def level_scale(level: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(level.astype(jnp.float32) / (N_LEVELS - 1), 0.0, 1.0)


def specialist_band_prob(k) -> jnp.ndarray:
    """Uniform distribution over the difficulty band (annulus) k of the
    grid: cells whose Chebyshev ring index max(|yi-5|, |pi-5|) == k.
    Env-side `update_specialist(k)` semantics (reference `train.py:226,
    542-549`, `envs_utils.py:585-587`)."""
    c = (GRID - 1) // 2
    yi, pi = np.meshgrid(np.arange(GRID), np.arange(GRID), indexing="ij")
    ring = np.maximum(np.abs(yi - c), np.abs(pi - c))
    k = jnp.asarray(k, jnp.int32)
    mask = jnp.asarray(ring)[None] == jnp.arange(N_LEVELS)[:, None, None]
    sel = mask[jnp.clip(k, 0, N_LEVELS - 1)].astype(jnp.float32)
    return sel / jnp.sum(sel)


def sample_step_params(key: jax.Array, cur: CurriculumState):
    """Draw one (r, yaw, pitch, x_tilt, y_tilt) stone-placement parameter set.

    Uniform mode scales the ranges by level/5 (mocca generate_step_placements:
    the r upper bound widens from R_MIN toward R_MAX, angles scale by ratio);
    grid mode draws (yaw, pitch) from the installed 11x11 categorical
    (reference `update_sample_prob` fan-out, `envs_utils.py:568-571`)."""
    ku, kg, kr, kt = jax.random.split(key, 4)
    s = level_scale(cur.level)

    # --- uniform draw at the current level ---------------------------
    u = jax.random.uniform(ku, (4,), minval=-1.0, maxval=1.0)
    yaw_u = u[0] * YAW_MAX * s
    pitch_u = u[1] * PITCH_MAX * s
    xt_u = u[2] * TILT_MAX * s
    yt_u = u[3] * TILT_MAX * s
    r_u = jax.random.uniform(
        kr, (), minval=R_MIN, maxval=R_MIN + (R_MAX - R_MIN) * s
    )

    # --- categorical draw from the difficulty grid -------------------
    flat = cur.sample_prob.reshape(-1)
    idx = jax.random.categorical(kg, jnp.log(flat + 1e-12))
    yi, pi = idx // GRID, idx % GRID
    yaw_g = jnp.asarray(YAW_SAMPLES)[yi]
    pitch_g = jnp.asarray(PITCH_SAMPLES)[pi]
    r_g = jax.random.uniform(kt, (), minval=R_MIN, maxval=R_MAX)

    yaw = jnp.where(cur.use_prob, yaw_g, yaw_u)
    pitch = jnp.where(cur.use_prob, pitch_g, pitch_u)
    r = jnp.where(cur.use_prob, r_g, r_u)
    x_tilt = jnp.where(cur.use_prob, xt_u * 0.0, xt_u)
    y_tilt = jnp.where(cur.use_prob, yt_u * 0.0, yt_u)
    return r, yaw, pitch, x_tilt, y_tilt


def next_stone(prev: jnp.ndarray, r, yaw, pitch, x_tilt, y_tilt) -> jnp.ndarray:
    """Place a stone relative to `prev` = (x, y, z, phi, xt, yt).

    mocca spherical convention: theta = pi/2 + pitch, so horizontal reach
    is r*cos(pitch) and dz = r*cos(theta) = -r*sin(pitch) (positive pitch
    sample = stone placed lower)."""
    heading = prev[3] + yaw
    dist_h = r * jnp.cos(pitch)
    dz = -r * jnp.sin(pitch)
    x = prev[0] + dist_h * jnp.cos(heading)
    y = prev[1] + dist_h * jnp.sin(heading)
    z = prev[2] + dz
    return jnp.stack([x, y, z, heading, x_tilt, y_tilt])


def generate_terrain(
    key: jax.Array, cur: CurriculumState, n_stones: int
) -> jnp.ndarray:
    """Full terrain at reset: (n_stones, 6). Stone 0 sits under the
    character; stone 1 is flat at INIT_STEP_SEPARATION ahead (mocca
    generate_step_placements: dr[0]=0, dr[1]=init_step_separation)."""
    start0 = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=jnp.float32)
    start1 = jnp.array(
        [INIT_STEP_SEPARATION, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=jnp.float32
    )

    def gen(prev, k):
        r, yaw, pitch, xt, yt = sample_step_params(k, cur)
        stone = next_stone(prev, r, yaw, pitch, xt, yt)
        return stone, stone

    keys = jax.random.split(key, n_stones - 2)
    _, rest = jax.lax.scan(gen, start1, keys)
    return jnp.concatenate([start0[None], start1[None], rest], axis=0)


def resample_stone(
    key: jax.Array, terrain: jnp.ndarray, index: jnp.ndarray, cur: CurriculumState
) -> jnp.ndarray:
    """Re-place the stone at `index` relative to the one before it — the
    on-device analog of `sample_next_next_step` (reference
    `playground/enjoy.py:55`): called when a step is hit so the *next-next*
    stone reflects the current curriculum distribution."""
    prev = terrain[jnp.maximum(index - 1, 0)]
    r, yaw, pitch, xt, yt = sample_step_params(key, cur)
    stone = next_stone(prev, r, yaw, pitch, xt, yt)
    n = terrain.shape[0]
    do = (index >= 2) & (index < n)
    return jnp.where(do, terrain.at[jnp.clip(index, 0, n - 1)].set(stone), terrain)


def candidate_stones(terrain: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """All GRID*GRID candidate placements of stone `index` over the
    (yaw, pitch) grid at mid spacing — the geometry behind
    `create_temp_states` (reference `train.py:338`). (GRID*GRID, 6)."""
    prev = terrain[jnp.maximum(index - 1, 0)]
    yy, pp = jnp.meshgrid(
        jnp.asarray(YAW_SAMPLES), jnp.asarray(PITCH_SAMPLES), indexing="ij"
    )
    r_mid = (R_MIN + R_MAX) * 0.5
    place = jax.vmap(
        lambda yaw, pitch: next_stone(prev, r_mid, yaw, pitch, 0.0, 0.0)
    )
    return place(yy.reshape(-1), pp.reshape(-1))
