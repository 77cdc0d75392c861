"""Time the composed train iteration phase-by-phase at the bench shape.

update_probe.py showed ppo_update alone runs at ~700k frames/s, yet
BENCH_r02 reported 11.9 s per composed iteration — this script finds the
gap: per-iteration wall times for (a) the full `_train_iteration`, (b)
rollout-only, (c) GAE-only, with jax compile logging on to catch
silent retraces.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

N_ENVS = 4096
STEPS = 100


def main():
    from steppingstone_tpu.agents.rollout import EpisodeStats
    from steppingstone_tpu.runtime.config import TrainConfig
    from steppingstone_tpu.runtime.train import Trainer

    cfg = TrainConfig(
        env_name="Walker3DStepperEnv-v0",
        num_processes=N_ENVS,
        episode_steps=N_ENVS * STEPS,
        mini_batch_size=max(256, N_ENVS * STEPS // 39),
        num_frames=N_ENVS * STEPS,
        num_tests=0,
        use_mirror=True,
        mesh_devices=1,
    )
    trainer = Trainer(cfg)
    key = jax.random.PRNGKey(0)
    params = trainer.init_params(key)
    opt_state = trainer.tx.init(params)
    env_state, obs = trainer.venv.reset(key)
    stats = EpisodeStats.init(N_ENVS)
    lr = jnp.asarray(3e-4, jnp.float32)

    args = (params, opt_state, env_state, obs, stats, key, lr)
    print("compiling...", flush=True)
    t0 = time.perf_counter()
    out = jax.block_until_ready(trainer._train_iteration(*args))
    print(f"first call (compile+run): {time.perf_counter() - t0:.1f} s", flush=True)
    args = out[:6] + (lr,)

    jax.config.update("jax_log_compiles", True)
    for i in range(5):
        t0 = time.perf_counter()
        out = trainer._train_iteration(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        args = out[:6] + (lr,)
        print(
            f"iter {i}: {dt:6.3f} s  ({N_ENVS * STEPS / dt:,.0f} frames/s)",
            flush=True,
        )
    jax.config.update("jax_log_compiles", False)


if __name__ == "__main__":
    main()
