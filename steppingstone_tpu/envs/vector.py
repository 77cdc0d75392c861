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
    """Thin, stateless-functional vector wrapper: methods return new states.

    With `mesh` set, `step` runs under `jax.shard_map` over the mesh's env
    axis: each device steps only its local shard, so the fused Pallas
    control-step kernel (physics/pallas_step.py) sees the *per-shard* batch
    size and stays active under multi-chip pjit (pallas_call does not GSPMD
    partition on its own; shard_map is how it rides the mesh)."""

    def __init__(self, env: StepperEnv, num_envs: int, mesh=None):
        self.env = env
        self.num_envs = num_envs
        self.mesh = mesh
        step_batch = jax.vmap(env.step)
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            axis = mesh.axis_names[0]
            assert num_envs % mesh.devices.size == 0, (
                f"num_envs={num_envs} must divide over {mesh.devices.size} "
                "devices"
            )
            step_batch = jax.shard_map(
                step_batch,
                mesh=mesh,
                in_specs=(P(axis), P(axis)),
                out_specs=(P(axis), P(axis)),
                check_vma=False,
            )
        # jit-wrapped: these are also called OUTSIDE the trainer's compiled
        # update (reset at startup, enjoy/eval loops); eager vmapped physics
        # would dispatch thousands of tiny ops to the device
        self._reset = jax.jit(jax.vmap(env.reset, in_axes=(0, None)))
        self._reset_cur = jax.jit(jax.vmap(env.reset, in_axes=(0, 0)))
        self._step = jax.jit(step_batch)
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

    def update_curriculum(self, state: EnvState, level, assist=None) -> EnvState:
        """assist=None ties the support assist to the level; an explicit
        assist preserves the learnability ramp under a different sampling
        range (see StepperEnv.update_curriculum)."""
        cur = state.cur._replace(
            level=jnp.full((self.num_envs,), level, jnp.float32),
            use_prob=jnp.zeros((self.num_envs,), bool),
            assist=jnp.full(
                (self.num_envs,), level if assist is None else assist,
                jnp.float32,
            ),
        )
        return state._replace(cur=cur)

    def update_assist(self, state: EnvState, assist) -> EnvState:
        cur = state.cur._replace(
            assist=jnp.full((self.num_envs,), assist, jnp.float32)
        )
        return state._replace(cur=cur)

    def update_specialist(self, state: EnvState, k) -> EnvState:
        """Reference `envs.update_specialist(k)` fan-out
        (`envs_utils.py:585-587`): restrict every env's stone sampling to
        difficulty band k."""
        prob = terr.specialist_band_prob(k)
        cur = state.cur._replace(
            sample_prob=jnp.broadcast_to(
                prob, (self.num_envs,) + prob.shape
            ),
            use_prob=jnp.ones((self.num_envs,), bool),
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
