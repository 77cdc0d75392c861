"""Attribute the rollout-only rate across configurations.

BENCH_r01 reported 3.40M env-steps/s rollout-only; r02 2.95M; r03 2.56M.
Between those rounds the env gained fidelity (3-sphere feet + body
spheres = 12 contact points vs 8, stricter reward pipeline, phase-mirror
gates, running start, radius curriculum) and the step moved under a
shard_map mesh. This probe separates the factors on the real chip:

  mesh+pallas   — the bench configuration
  nomesh+pallas — vmap straight to the kernel (no shard_map wrapper)
  nomesh+jnp    — PALLAS_ENABLED=False (XLA-fused scan path)

Run: python scripts/rollout_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

N = 4096
CHUNK = 25
REPEATS = 4


def measure(mesh_on: bool, pallas_on: bool):
    from steppingstone_tpu.agents.networks import ActorCritic
    from steppingstone_tpu.agents.rollout import policy_action
    from steppingstone_tpu.envs import make_env
    from steppingstone_tpu.envs.vector import VecEnv
    from steppingstone_tpu.parallel import mesh as pmesh
    from steppingstone_tpu.physics import engine

    engine.PALLAS_ENABLED = pallas_on
    engine._step_core.cache_clear()
    engine._step_core_pd.cache_clear()

    env = make_env("Walker3DStepperEnv-v0")
    mesh = pmesh.make_mesh(1) if mesh_on else None
    venv = VecEnv(env, N, mesh=mesh)
    net = ActorCritic(action_dim=env.action_dim, num_ensembles=1)
    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1, env.observation_dim)))
    env_state, obs = venv.reset(key)

    @jax.jit
    def chunk(params, env_state, obs, key):
        def body(carry, _):
            env_state, obs, key = carry
            key, k = jax.random.split(key)
            action, _ = policy_action(net.apply, params, obs, k, False)
            env_state, out = venv.step(env_state, action)
            return (env_state, out.obs, key), out.reward

        (env_state, obs, key), rew = jax.lax.scan(
            body, (env_state, obs, key), None, length=CHUNK
        )
        return env_state, obs, key, rew.sum()

    env_state, obs, key, _ = jax.block_until_ready(chunk(params, env_state, obs, key))
    env_state, obs, key, _ = jax.block_until_ready(chunk(params, env_state, obs, key))
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        env_state, obs, key, r = chunk(params, env_state, obs, key)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    rate = N * CHUNK * REPEATS / dt
    print(
        f"mesh={int(mesh_on)} pallas={int(pallas_on)}: "
        f"{rate:,.0f} env-steps/s",
        flush=True,
    )
    engine.PALLAS_ENABLED = True
    engine._step_core.cache_clear()
    engine._step_core_pd.cache_clear()
    return rate


def main():
    measure(True, True)
    measure(False, True)
    measure(False, False)


if __name__ == "__main__":
    main()
