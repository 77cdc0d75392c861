"""Headline benchmark: env-steps/s on Walker3DStepper @ 4096 envs.

Measures the full actor path (policy MLP + batched physics/env step) as a
scanned, jit-compiled rollout — the shape of the training hot loop — and
prints ONE JSON line.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is
computed against an estimated 30k env-frames/s for the reference rig
(100 PyBullet worker processes at the reference's logged `fps` metric,
`playground/train.py:571` — a generous estimate for a 21-DoF humanoid at
60 Hz control with frame-skip 4 on a cluster CPU node).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_FPS_ESTIMATE = 30_000.0
NUM_ENVS = 4096
CHUNK = 25          # control steps per timed program
REPEATS = 4


def main():
    from steppingstone_tpu.agents.networks import ActorCritic
    from steppingstone_tpu.agents.rollout import policy_action
    from steppingstone_tpu.envs import make_env
    from steppingstone_tpu.envs.vector import VecEnv

    backend = jax.default_backend()
    n_envs = NUM_ENVS if backend in ("tpu", "gpu") else 256

    env = make_env("Walker3DStepperEnv-v0")
    venv = VecEnv(env, n_envs)
    net = ActorCritic(action_dim=env.action_dim, num_ensembles=1)

    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1, env.observation_dim)))
    env_state, obs = venv.reset(key)

    @jax.jit
    def rollout_chunk(params, env_state, obs, key):
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

    # warm up / compile
    env_state, obs, key, _ = jax.block_until_ready(
        rollout_chunk(params, env_state, obs, key)
    )

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        env_state, obs, key, r = rollout_chunk(params, env_state, obs, key)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    steps_per_s = n_envs * CHUNK * REPEATS / dt
    print(json.dumps({
        "metric": f"env-steps/s (Walker3DStepper, {n_envs} envs, {backend})",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / REFERENCE_FPS_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
