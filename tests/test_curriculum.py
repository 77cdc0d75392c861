"""Curriculum strategy tests: value-grid evaluation, probability shapes,
threshold uniform-round bookkeeping, fixed advancement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from steppingstone_tpu.agents.networks import ActorCritic
from steppingstone_tpu.envs import make_env
from steppingstone_tpu.envs import terrain as terr
from steppingstone_tpu.envs.vector import VecEnv
from steppingstone_tpu.runtime import curriculum as curr


@pytest.fixture(scope="module")
def setup():
    env = make_env("Walker3DStepperEnv-v0")
    net = ActorCritic(action_dim=env.action_dim, num_ensembles=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 60)))
    return env, net, params


def test_value_grid_eval(setup):
    env, net, params = setup
    fn = curr.make_value_grid_fn(env, net.apply, max_steps=60)
    grid, count = fn(params, jax.random.PRNGKey(1))
    assert grid.shape == (terr.GRID, terr.GRID)
    assert np.isfinite(np.asarray(grid)).all()
    # normalized to max |.| = 1 when any event fired
    if int(count) > 0:
        assert np.abs(np.asarray(grid)).max() == pytest.approx(1.0, abs=1e-4)


def test_adaptive_sampling_installs_probs(setup):
    env, net, params = setup
    venv = VecEnv(env, 2)
    state, _ = venv.reset(jax.random.PRNGKey(0))
    ad = curr.AdaptiveSampling(venv, env, net.apply)
    ad.value_grid = curr.make_value_grid_fn(env, net.apply, max_steps=60)
    state = ad.pre_update(state, params, jax.random.PRNGKey(2))
    p = np.asarray(state.cur.sample_prob)
    assert p.shape == (2, terr.GRID, terr.GRID)
    assert np.allclose(p.sum(axis=(1, 2)), 1.0, atol=1e-5)
    assert np.asarray(state.cur.use_prob).all()


def test_threshold_sampling_uniform_rounds(setup):
    env, net, params = setup
    venv = VecEnv(env, 2)
    state, _ = venv.reset(jax.random.PRNGKey(0))
    th = curr.ThresholdSampling(venv, env, net.apply, uniform_every=3)
    th.value_grid = curr.make_value_grid_fn(env, net.apply, max_steps=60)
    # round 1 is uniform (reference train.py:125-126): level 5, no probs
    assert th.uniform_sampling
    state = th.pre_update(state, params, jax.random.PRNGKey(1))
    assert (np.asarray(state.cur.level) == terr.N_LEVELS - 1).all()
    assert not np.asarray(state.cur.use_prob).any()
    th.post_test()
    assert not th.uniform_sampling
    # non-uniform round installs threshold-shaped probs
    state = th.pre_update(state, params, jax.random.PRNGKey(2))
    assert np.asarray(state.cur.use_prob).all()
    # counter cycles back to uniform every `uniform_every` rounds
    th.post_test()
    th.post_test()
    assert th.uniform_sampling


def test_fixed_curriculum_advances():
    env = make_env("Walker3DStepperEnv-v0")
    venv = VecEnv(env, 2)
    state, _ = venv.reset(jax.random.PRNGKey(0))
    fx = curr.FixedCurriculum(venv)
    state = fx.install(state)
    assert (np.asarray(state.cur.level) == 0).all()
    state, adv = fx.post_update(state, mean_rew=500.0)
    assert fx.level == 0 and not adv
    state, adv = fx.post_update(state, mean_rew=1500.0)
    assert fx.level == 1 and adv
    assert (np.asarray(state.cur.level) == 1).all()
    for _ in range(10):
        state, _ = fx.post_update(state, mean_rew=1500.0)
    assert fx.level == 5  # caps at 5 (advance only while level <= 4)


def test_fixed_curriculum_ramp():
    """Ramped advance: the installed level interpolates to the target over
    ramp_updates ticks, and no new advance can fire mid-ramp."""
    env = make_env("Walker3DStepperEnv-v0")
    venv = VecEnv(env, 2)
    state, _ = venv.reset(jax.random.PRNGKey(0))
    fx = curr.FixedCurriculum(venv, ramp_updates=4)
    state = fx.install(state)
    state, adv = fx.post_update(state, mean_rew=1500.0)
    assert adv and fx.level == 1
    assert np.allclose(np.asarray(state.cur.level), 0.25)
    # mid-ramp: reward above threshold must NOT advance the target again
    state, adv = fx.post_update(state, mean_rew=1500.0)
    assert not adv and fx.level == 1
    for _ in range(3):
        state = fx.tick(state)
    assert np.allclose(np.asarray(state.cur.level), 1.0)
    state = fx.tick(state)  # at target: no-op
    assert np.allclose(np.asarray(state.cur.level), 1.0)
    state, adv = fx.post_update(state, mean_rew=1500.0)
    assert adv and fx.level == 2


def test_reinflate_and_project_logstd():
    from steppingstone_tpu.agents.networks import (
        LOGSTD_MIN,
        clamped_logstd,
        project_logstd,
        reinflate_logstd,
    )

    params = {"params": {"logstd": jnp.array([-2.9, -1.2]), "w": jnp.ones(2)}}
    p2 = reinflate_logstd(params, -1.7)
    assert np.allclose(np.asarray(p2["params"]["logstd"]), [-1.7, -1.2])
    # projection restores a sunk param to the floor
    sunk = {"params": {"logstd": jnp.array([-5.0, -1.0]), "w": jnp.ones(2)}}
    pj = project_logstd(sunk)
    assert np.allclose(np.asarray(pj["params"]["logstd"]), [LOGSTD_MIN, -1.0])
    # straight-through clamp: value floored, gradient passes through
    g = jax.grad(lambda p: jnp.sum(clamped_logstd(p)))(sunk)
    assert np.allclose(np.asarray(g["params"]["logstd"]), 1.0)
    assert np.allclose(np.asarray(clamped_logstd(sunk)), [LOGSTD_MIN, -1.0])
