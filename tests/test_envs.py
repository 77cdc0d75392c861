"""Env contract tests: dims (oracle: reference checkpoints, SURVEY.md §2.8),
mirror-index consistency, terrain sampling, auto-reset, temp states."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from steppingstone_tpu.envs import make_env
from steppingstone_tpu.envs import terrain as terr
from steppingstone_tpu.envs.stepper import create_temp_states, observe
from steppingstone_tpu.envs.vector import VecEnv


@pytest.fixture(scope="module")
def walker():
    return make_env("mocca_envs:Walker3DStepperEnv-v0")


@pytest.fixture(scope="module")
def cassie():
    return make_env("CassieStepper-v1")


def test_dims_match_reference_checkpoints(walker, cassie):
    assert walker.observation_dim == 60 and walker.action_dim == 21
    assert cassie.observation_dim == 51 and cassie.action_dim == 10
    mike = make_env("MikeStepperEnv-v0")
    assert mike.observation_dim == 60 and mike.action_dim == 21


def test_reset_obs_shape_and_finite(walker, cassie):
    for env in (walker, cassie):
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (env.observation_dim,)
        assert np.isfinite(np.asarray(obs)).all()
        assert int(state.next_step_index) == 1


def test_step_runs_and_is_finite(walker):
    state, obs = walker.reset(jax.random.PRNGKey(1))
    step = jax.jit(walker.step)
    for i in range(3):
        action = 0.1 * jax.random.normal(jax.random.PRNGKey(i), (walker.action_dim,))
        state, out = step(state, action)
        assert out.obs.shape == (60,)
        assert np.isfinite(np.asarray(out.obs)).all()
        assert np.isfinite(float(out.reward))


def test_terrain_level0_is_easy():
    cur = terr.default_curriculum(0)
    t = terr.generate_terrain(jax.random.PRNGKey(0), cur, 24)
    # level 0: no yaw/pitch/tilt variation, spacing in the easy band
    d = np.diff(np.asarray(t[1:, :2]), axis=0)
    dists = np.linalg.norm(d, axis=1)
    assert (dists > 0.6).all() and (dists < 1.0).all()
    assert np.allclose(np.asarray(t[:, 2]), 0.0, atol=1e-5)
    assert np.allclose(np.asarray(t[:, 4:6]), 0.0, atol=1e-6)


def test_terrain_level5_spans_range():
    cur = terr.default_curriculum(5)
    t = terr.generate_terrain(jax.random.PRNGKey(0), cur, 200)
    yaw_deltas = np.diff(np.asarray(t[1:, 3]))
    assert np.abs(yaw_deltas).max() > 0.3  # wide turns appear (yaw max 20 deg)
    assert np.abs(np.asarray(t[:, 2])).max() > 0.3  # vertical variation


def test_sample_prob_distribution():
    """With a one-hot grid probability, sampled placements concentrate on
    that (yaw, pitch) cell."""
    cur = terr.default_curriculum(5)
    p = jnp.zeros((terr.GRID, terr.GRID)).at[2, 7].set(1.0)
    cur = cur._replace(sample_prob=p, use_prob=jnp.asarray(True))
    keys = jax.random.split(jax.random.PRNGKey(3), 64)
    rs, yaws, pitches, _, _ = jax.vmap(lambda k: terr.sample_step_params(k, cur))(keys)
    assert np.allclose(np.asarray(yaws), terr.YAW_SAMPLES[2], atol=1e-5)
    assert np.allclose(np.asarray(pitches), terr.PITCH_SAMPLES[7], atol=1e-5)


def test_mirror_indices_involution(walker, cassie):
    """Mirroring an obs twice must be the identity, and index sets must be
    disjoint/valid (reference `get_mirror_function`, envs_utils.py:687-740)."""
    for env in (walker, cassie):
        neg, right, left, neg_a, right_a, left_a = env.get_mirror_indices()
        D, A = env.observation_dim, env.action_dim
        assert len(right) == len(left)
        assert len(right_a) == len(left_a)
        for arr, n in [(neg, D), (right, D), (left, D), (neg_a, A), (right_a, A), (left_a, A)]:
            assert (arr >= 0).all() and (arr < n).all()
        assert not set(right) & set(left)

        obs = np.random.RandomState(0).randn(D).astype(np.float32)

        def mirror(x):
            y = x.copy()
            y[neg] *= -1
            y[np.concatenate([right, left])] = y[np.concatenate([left, right])]
            return y

        assert np.allclose(mirror(mirror(obs)), obs)


def test_temp_states_shape(walker):
    state, _ = walker.reset(jax.random.PRNGKey(0))
    ts = create_temp_states(walker.cfg, state)
    assert ts.shape == (terr.GRID * terr.GRID, 60)
    assert np.isfinite(np.asarray(ts)).all()
    # candidates differ only in the lookahead-target features
    base = np.asarray(observe(walker.cfg, state))
    diffs = np.abs(np.asarray(ts) - base[None]).max(axis=0)
    assert (diffs[:52] < 1e-5).all()
    assert diffs[56:].max() > 0.01  # second target varies


def test_vec_env_and_autoreset(walker):
    n = 4
    venv = VecEnv(walker, n)
    state, obs = venv.reset(jax.random.PRNGKey(0))
    assert obs.shape == (n, 60)
    step = jax.jit(venv.step)
    # hard random actions for a while: someone should fall and auto-reset
    key = jax.random.PRNGKey(1)
    saw_done = False
    for i in range(40):
        key, k = jax.random.split(key)
        actions = jax.random.uniform(k, (n, 21), minval=-1, maxval=1)
        state, out = step(state, actions)
        if bool(out.done.any()):
            saw_done = True
            # episodes that ended report their return; fresh obs are finite
            assert np.isfinite(np.asarray(out.ep_return)).all()
    assert saw_done
    assert np.asarray(state.elapsed).max() <= 40
    assert np.isfinite(np.asarray(out.obs)).all()


def test_phase_mirror(cassie):
    """set_mirror: in the mirrored half-cycle the obs is the mirror image
    of the unmirrored obs, and actions are un-mirrored before dynamics."""
    state, obs = cassie.reset(jax.random.PRNGKey(0))
    state_m = cassie.set_mirror(state, True)
    assert bool(state_m.mirror_enabled)
    # first half of the gait cycle: no mirroring yet
    from steppingstone_tpu.envs.stepper import observe, _mirror_active
    assert not bool(_mirror_active(cassie.cfg, state_m))
    # force phase into the second half
    state_m2 = state_m._replace(phase=jnp.asarray(0.6))
    assert bool(_mirror_active(cassie.cfg, state_m2))
    raw = np.asarray(observe(cassie.cfg, state_m2))
    mirrored = np.asarray(cassie._mirror_obs(jnp.asarray(raw)))
    # mirroring twice is identity
    assert np.allclose(
        np.asarray(cassie._mirror_obs(jnp.asarray(mirrored))), raw, atol=1e-6
    )
    # stepping with the mirror flag produces finite results
    st, out = jax.jit(cassie.step)(state_m2, jnp.zeros(cassie.action_dim))
    assert np.isfinite(np.asarray(out.obs)).all()


def test_set_env_and_robot_params(walker):
    """set_env_params/set_robot_params inject sticky per-env values
    (reference envs_utils.py:560-566) that survive auto-resets."""
    state, _ = walker.reset(jax.random.PRNGKey(0))
    state = walker.set_robot_params(state, {"power": 0.5})
    state = walker.set_env_params(state, {"stone_radius": 0.4})
    assert float(state.robot_power) == pytest.approx(0.5)
    assert float(state.stone_radius) == pytest.approx(0.4)
    step = jax.jit(walker.step)
    # force a fall so auto-reset triggers, params must persist
    key = jax.random.PRNGKey(1)
    for i in range(40):
        key, k = jax.random.split(key)
        state, out = step(state, jax.random.uniform(k, (21,), minval=-1, maxval=1))
        if bool(out.done):
            break
    assert float(state.robot_power) == pytest.approx(0.5)
    assert float(state.stone_radius) == pytest.approx(0.4)


def test_update_curriculum_and_sample_prob(walker):
    venv = VecEnv(walker, 3)
    state, _ = venv.reset(jax.random.PRNGKey(0))
    state = venv.update_curriculum(state, 4)
    assert (np.asarray(state.cur.level) == 4).all()
    p = jnp.ones((terr.GRID, terr.GRID))
    state = venv.update_sample_prob(state, p)
    assert np.allclose(np.asarray(state.cur.sample_prob).sum(axis=(1, 2)), 1.0)
    assert np.asarray(state.cur.use_prob).all()


# ---- support geometry (reference plank_class, SURVEY.md §2.9) ------------

def test_plank_support_contact_bounds():
    """Plank support: forgiving laterally (half-extent plank_hy), bounded
    along the walking direction (half-extent stone_radius), rotated with
    the stone heading."""
    from steppingstone_tpu.physics import contact as ct

    stones = jnp.array([[0.0, 0.0, 0.0, 0.0, 0.0, 0.0]])
    pts = jnp.array([
        [0.0, 1.2, 0.03],   # far lateral: on plank, off disc
        [0.5, 0.0, 0.03],   # far along heading: off both
        [0.0, 0.0, 0.03],   # center: on both
    ])
    vel = jnp.zeros((3, 3))
    rad = jnp.full((3,), 0.05)
    disc = ct.compute_contacts(pts, vel, rad, stones, 0.25, jnp.asarray(False))
    plank = ct.compute_contacts(
        pts, vel, rad, stones, 0.25, jnp.asarray(False), support_hy=1.5
    )
    assert list(np.asarray(disc.in_contact)) == [False, False, True]
    assert list(np.asarray(plank.in_contact)) == [True, False, True]
    # heading rotation: a 90-degree stone swaps the roles of x and y
    stones_rot = stones.at[0, 3].set(jnp.pi / 2)
    plank_rot = ct.compute_contacts(
        pts, vel, rad, stones_rot, 0.25, jnp.asarray(False), support_hy=1.5
    )
    assert list(np.asarray(plank_rot.in_contact)) == [False, True, True]


def test_plank_class_kwarg_and_static_support():
    """`plank_class` env kwarg maps to plank support. Only the LATERAL
    half-extent (plank_hy) and the level-5 geometry are static: the
    walking-direction half-extent ramps with the assist level (the
    carpet->calibrated overlap assist, stepper.py plank branch)."""
    env = make_env("Walker3DStepperEnv-v0", plank_class="LargePlank")
    assert env.cfg.support == "plank" and env.cfg.plank_hy == 1.5
    pillar = make_env("Walker3DStepperEnv-v0", plank_class="Pillar")
    assert pillar.cfg.support == "pillar"
    # default stays the disc curriculum
    assert make_env("Walker3DStepperEnv-v0").cfg.support == "disc"
    state, obs = env.reset(jax.random.PRNGKey(0), terr.default_curriculum(5))
    step = jax.jit(env.step)
    for i in range(3):
        state, out = step(state, jnp.zeros(env.action_dim))
        assert np.isfinite(np.asarray(out.obs)).all()


def test_fractional_level_interpolates_terrain():
    """Fractional curriculum levels scale the sampling ranges between the
    reference's integer levels (ramped advance, runtime/curriculum.py)."""
    def spread(level):
        t = terr.generate_terrain(
            jax.random.PRNGKey(3), terr.default_curriculum(level), 24
        )
        return float(jnp.abs(jnp.asarray(t[2:, 2])).max())  # |z| spread

    s0, s25, s5 = spread(0.0), spread(2.5), spread(5.0)
    assert s0 < 1e-5
    assert s0 < s25 < s5


def test_stall_timeout_terminates(walker):
    """No new stone hit for stall_timeout steps => episode ends (the
    standing-still reward optimum is strictly dominated; StepperConfig
    rationale)."""
    state, obs = walker.reset(jax.random.PRNGKey(0))
    cfg = walker.cfg
    # surgery: pretend we're one step away from the stall deadline
    state = state._replace(
        elapsed=jnp.asarray(cfg.stall_timeout - 1, jnp.int32),
        last_hit=jnp.asarray(0, jnp.int32),
    )
    state, out = jax.jit(walker.step)(state, jnp.zeros(walker.action_dim))
    assert bool(out.done)
    assert not bool(out.timeout)  # a stall is a failure, not a time limit
    # STANDING at the final stone is exempt (the intended success, the
    # target_bonus condition) — but merely TARGETING the final stone from
    # afar is not: that let a policy park at the second-to-last stone and
    # farm the tall bonus to timeout (round-4 advisor finding #1)
    state2, _ = walker.reset(jax.random.PRNGKey(1))
    last = cfg.n_stones - 1
    at_goal = state2.terrain.at[last].set(
        jnp.concatenate([state2.phys.q[0:2], jnp.zeros(4)])
    )
    state2 = state2._replace(
        elapsed=jnp.asarray(cfg.stall_timeout - 1, jnp.int32),
        last_hit=jnp.asarray(0, jnp.int32),
        next_step_index=jnp.asarray(last, jnp.int32),
        terrain=at_goal,
    )
    state2, out2 = jax.jit(walker.step)(state2, jnp.zeros(walker.action_dim))
    assert not bool(out2.done)
    # targeting the final stone from > 0.15 m away still stalls
    state3, _ = walker.reset(jax.random.PRNGKey(2))
    state3 = state3._replace(
        elapsed=jnp.asarray(cfg.stall_timeout - 1, jnp.int32),
        last_hit=jnp.asarray(0, jnp.int32),
        next_step_index=jnp.asarray(last, jnp.int32),
    )
    state3, out3 = jax.jit(walker.step)(state3, jnp.zeros(walker.action_dim))
    assert bool(out3.done)
