"""Curriculum controllers: fixed levels, adaptive sampling, threshold
sampling, specialist schedule.

Host-side orchestration over jitted on-device evaluation, mirroring the
three strategies of the reference driver:

- fixed 6-level curriculum: advance when mean episode reward > 1000
  (`playground/train.py:115-118,503-506`)
- adaptive sampling: roll a single eval env until 5 stone-hit events,
  score all 11x11 candidate stones with the critic ensemble, install
  probs = softmax(-10 * normalized V) (`train.py:320-361`)
- threshold sampling: same metric, probs = softmax(-10 * |V - 0.85|),
  alternating with uniform rounds (`train.py:123-132,224-273,473-482`)
- specialist schedule: save a specialist policy and harden the env each
  time mean reward crosses 1000 (`train.py:119-122,542-549`)
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from steppingstone_tpu.agents.rollout import policy_action
from steppingstone_tpu.envs import terrain as terr
from steppingstone_tpu.envs.stepper import StepperEnv, create_temp_states

N_EVENTS = 5          # stone-hit events per evaluation (train.py:259,353)
MAX_EVAL_STEPS = 600  # cap; the reference loops until 5 events


def make_value_grid_fn(env: StepperEnv, apply_fn: Callable,
                       max_steps: int = MAX_EVAL_STEPS):
    """Jitted: deterministic single-env rollout accumulating the candidate
    value grid over the first N_EVENTS terrain updates."""

    cfg = env.cfg

    @jax.jit
    def value_grid(params, key):
        k_reset, k_roll = jax.random.split(key)
        # eval env runs at level 0 (easy terrain) like the reference
        # (`train.py:131,137`); the candidate grid still spans full range
        state, obs = env.reset(k_reset, terr.default_curriculum(0))

        def body(carry, _):
            state, obs, grid, count = carry
            action, _ = policy_action(apply_fn, params, obs, None, True)
            state, out = env.step(state, action)

            def scored(_):
                temp = create_temp_states(cfg, state)          # (121, D)
                v = apply_fn(params, temp, method="ensemble_values")
                return jnp.mean(v, axis=-1)                    # (121,)

            event = state.update_terrain & (count < N_EVENTS)
            vals = jax.lax.cond(
                event, scored, lambda _: jnp.zeros(terr.GRID * terr.GRID), None
            )
            return (state, out.obs, grid + vals, count + event), None

        init = (state, obs, jnp.zeros(terr.GRID * terr.GRID), jnp.asarray(0, jnp.int32))
        (state, obs, grid, count), _ = jax.lax.scan(
            body, init, None, length=max_steps
        )
        # normalize like the reference: metric /= max |metric| (train.py:354)
        grid = grid / (jnp.max(jnp.abs(grid)) + 1e-8)
        return grid.reshape(terr.GRID, terr.GRID), count

    return value_grid


class FixedCurriculum:
    """Reference fixed 6-level curriculum."""

    def __init__(self, venv):
        self.venv = venv
        self.level = 0

    def install(self, env_state):
        return self.venv.update_curriculum(env_state, self.level)

    def post_update(self, env_state, mean_rew: float):
        if mean_rew > 1000 and self.level <= 4:
            self.level += 1
            print("curriculum", self.level, flush=True)
            env_state = self.venv.update_curriculum(env_state, self.level)
        return env_state


class AdaptiveSampling:
    """Reference adaptive value-based sampling (train.py:320-361)."""

    def __init__(self, venv, env: StepperEnv, apply_fn):
        self.venv = venv
        self.value_grid = make_value_grid_fn(env, apply_fn)
        self.last_probs = None

    def pre_update(self, env_state, params, key):
        grid, _ = self.value_grid(params, key)
        probs = jax.nn.softmax(-10.0 * grid.reshape(-1)).reshape(grid.shape)
        self.last_probs = np.asarray(probs)
        return self.venv.update_sample_prob(env_state, probs)


class ThresholdSampling:
    """Reference threshold sampling (train.py:123-132,224-273,473-482):
    target stones whose normalized value sits near `threshold`, with
    periodic uniform rounds."""

    def __init__(self, venv, env: StepperEnv, apply_fn, threshold: float = 0.85,
                 uniform_every: int = 500000):
        self.venv = venv
        self.value_grid = make_value_grid_fn(env, apply_fn)
        self.threshold = threshold
        self.uniform_every = uniform_every
        self.uniform_counter = 1
        self.uniform_sampling = True   # first round is uniform (train.py:125)
        self.last_probs = None

    def pre_update(self, env_state, params, key):
        if self.uniform_sampling:
            # full-range uniform round (train.py:273-274,481)
            return self.venv.update_curriculum(env_state, terr.N_LEVELS - 1)
        grid, _ = self.value_grid(params, key)
        probs = jax.nn.softmax(
            -10.0 * jnp.abs(grid.reshape(-1) - self.threshold)
        ).reshape(grid.shape)
        self.last_probs = np.asarray(probs)
        return self.venv.update_sample_prob(env_state, probs)

    def post_test(self):
        """Uniform-round bookkeeping after the test rollout
        (train.py:473-482)."""
        if self.uniform_counter % self.uniform_every == 0:
            self.uniform_sampling = True
            self.uniform_counter = 0
        else:
            self.uniform_sampling = False
        self.uniform_counter += 1


class SpecialistSchedule:
    """Reference specialist curriculum (train.py:119-122,542-549)."""

    def __init__(self, venv):
        self.venv = venv
        self.specialist = 0

    def install(self, env_state):
        return self.venv.update_specialist(env_state, self.specialist)

    def post_update(self, env_state, mean_rew: float, save_fn=None):
        if mean_rew > 1000 and self.specialist <= 4:
            if save_fn is not None:
                save_fn(self.specialist)
            self.specialist += 1
            env_state = self.venv.update_specialist(env_state, self.specialist)
        return env_state
