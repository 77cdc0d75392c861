"""Headline benchmark: END-TO-END training throughput on Walker3DStepper.

Times the full compiled `train_iteration` (rollout scan + bootstrap + GAE +
10 PPO epochs of minibatch SGD — everything the reference's per-update
`fps` metric covers, `playground/train.py:571`) at the BASELINE.json
north-star shape: 4096 envs on one chip.  Also reports the rollout-only
(policy act + physics step) rate as a breakdown field.

The reference publishes no numbers (BASELINE.md); `vs_baseline` divides by
an estimated 30k env-frames/s for the reference rig (100 PyBullet worker
processes at the reference's logged end-to-end `fps` on a cluster CPU
node — generous for a 21-DoF humanoid at 60 Hz control, frame-skip 4).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_FPS_ESTIMATE = 30_000.0
NUM_ENVS = 4096
ROLLOUT_CHUNK = 25      # control steps per rollout-only timed program
ROLLOUT_REPEATS = 4
TRAIN_STEPS = 100       # rollout length inside the timed train iteration
TRAIN_REPEATS = 3


def _rollout_only(net, venv, params, env_state, obs, n_envs):
    from steppingstone_tpu.agents.rollout import policy_action

    @jax.jit
    def rollout_chunk(params, env_state, obs, key):
        def body(carry, _):
            env_state, obs, key = carry
            key, k = jax.random.split(key)
            action, _ = policy_action(net.apply, params, obs, k, False)
            env_state, out = venv.step(env_state, action)
            return (env_state, out.obs, key), out.reward

        (env_state, obs, key), rew = jax.lax.scan(
            body, (env_state, obs, key), None, length=ROLLOUT_CHUNK
        )
        return env_state, obs, key, rew.sum()

    key = jax.random.PRNGKey(1)
    env_state, obs, key, _ = jax.block_until_ready(
        rollout_chunk(params, env_state, obs, key)
    )
    t0 = time.perf_counter()
    for _ in range(ROLLOUT_REPEATS):
        env_state, obs, key, r = rollout_chunk(params, env_state, obs, key)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    return n_envs * ROLLOUT_CHUNK * ROLLOUT_REPEATS / dt


def main():
    from steppingstone_tpu.agents.rollout import EpisodeStats
    from steppingstone_tpu.runtime.config import TrainConfig
    from steppingstone_tpu.runtime.train import Trainer

    backend = jax.default_backend()
    n_envs = NUM_ENVS if backend in ("tpu", "gpu") else 256
    steps = TRAIN_STEPS if backend in ("tpu", "gpu") else 8
    frames = n_envs * steps
    # keep the reference's ~39-minibatch/epoch ratio
    # (episode_steps/mini_batch = 40000/1024, playground/train.py:59-63)
    mini = max(256, frames // 39)

    cfg = TrainConfig(
        env_name="Walker3DStepperEnv-v0",
        num_processes=n_envs,
        episode_steps=frames,
        mini_batch_size=mini,
        num_frames=frames,
        num_tests=0,
        use_mirror=True,
        mesh_devices=1 if backend == "tpu" else 0,
    )
    trainer = Trainer(cfg)
    key = jax.random.PRNGKey(0)
    params = trainer.init_params(key)
    opt_state = trainer.tx.init(params)
    env_state, obs = trainer.venv.reset(key)
    stats = EpisodeStats.init(n_envs)

    rollout_rate = _rollout_only(
        trainer.net, trainer.venv, params, env_state, obs, n_envs
    )
    print(f"rollout-only: {rollout_rate:,.0f} env-steps/s", file=sys.stderr)

    lr = jnp.asarray(3e-4, jnp.float32)
    args = (params, opt_state, env_state, obs, stats, key, lr)
    args = jax.block_until_ready(trainer._train_iteration(*args))[:6] + (lr,)
    t0 = time.perf_counter()
    for _ in range(TRAIN_REPEATS):
        out = trainer._train_iteration(*args)
        args = out[:6] + (lr,)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    train_rate = frames * TRAIN_REPEATS / dt

    print(json.dumps({
        "metric": (
            f"end-to-end train env-steps/s (Walker3DStepper, {n_envs} envs, "
            f"rollout+GAE+10-epoch PPO, {backend})"
        ),
        "value": round(train_rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(train_rate / REFERENCE_FPS_ESTIMATE, 3),
        "rollout_only_steps_per_s": round(rollout_rate, 1),
        "update_seconds_per_iteration": round(dt / TRAIN_REPEATS, 4),
    }))


if __name__ == "__main__":
    main()
