"""Batched env API: the reference's ShmemVecEnv collapsed into `vmap`.

The reference runs 1 OS process per env with pipes + shared memory
(`common/envs_utils.py:486-675`); here the whole fleet is one stacked
`EnvState` pytree living in HBM, and stepping N envs is a single fused XLA
program. Curriculum "RPCs" (`set_env_params`/`update_curriculum`/
`update_sample_prob` fan-outs, `envs_utils.py:560-590`) become replicated
array updates on the batched state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from steppingstone_tpu.envs import terrain as terr
from steppingstone_tpu.envs.stepper import EnvState, StepperEnv, create_temp_states


class VecEnv:
    """Thin, stateless-functional vector wrapper: methods return new states."""

    def __init__(self, env: StepperEnv, num_envs: int):
        self.env = env
        self.num_envs = num_envs
        # jit-wrapped: these are also called OUTSIDE the trainer's compiled
        # update (reset at startup, enjoy/eval loops); eager vmapped physics
        # would dispatch thousands of tiny ops to the device
        self._reset = jax.jit(jax.vmap(env.reset, in_axes=(0, None)))
        self._reset_cur = jax.jit(jax.vmap(env.reset, in_axes=(0, 0)))
        self._step = jax.jit(jax.vmap(env.step))
        self._temp_states = jax.jit(jax.vmap(lambda s: create_temp_states(env.cfg, s)))

    # -- gym-ish metadata ------------------------------------------------
    @property
    def observation_dim(self):
        return self.env.observation_dim

    @property
    def action_dim(self):
        return self.env.action_dim

    def reset(self, key, cur: terr.CurriculumState | None = None):
        keys = jax.random.split(key, self.num_envs)
        if cur is None:
            return self._reset(keys, terr.default_curriculum())
        return self._reset_cur(keys, cur)

    def step(self, state: EnvState, actions: jnp.ndarray):
        return self._step(state, actions)

    def create_temp_states(self, state: EnvState):
        return self._temp_states(state)

    # -- curriculum fan-outs --------------------------------------------
    def set_mirror(self, state: EnvState, enabled: bool) -> EnvState:
        return self.env.set_mirror(state, enabled)

    def set_env_params(self, state: EnvState, params: dict) -> EnvState:
        return self.env.set_env_params(state, params)

    def set_robot_params(self, state: EnvState, params: dict) -> EnvState:
        return self.env.set_robot_params(state, params)

    def update_curriculum(self, state: EnvState, level) -> EnvState:
        cur = state.cur._replace(
            level=jnp.full((self.num_envs,), level, jnp.int32),
            use_prob=jnp.zeros((self.num_envs,), bool),
        )
        return state._replace(cur=cur)

    def update_sample_prob(self, state: EnvState, prob: jnp.ndarray) -> EnvState:
        """prob: (GRID, GRID) shared grid, broadcast to every env (the
        reference broadcasts per-process copies, `train.py:357-360`)."""
        prob = prob / (jnp.sum(prob) + 1e-12)
        probs = jnp.broadcast_to(prob, (self.num_envs,) + prob.shape)
        cur = state.cur._replace(
            sample_prob=probs, use_prob=jnp.ones((self.num_envs,), bool)
        )
        return state._replace(cur=cur)
