"""Isolate the PPO-update throughput cliff (BENCH_r02: 11.9 s/iter at the
4096-env bench shape vs 123k fps demonstrated in a real 512-env run).

Times `ppo_update` alone on synthetic data over a grid of
(minibatch size, mirror on/off, permutation strategy) to find where the
time goes. Run on the real TPU:  python scripts/update_probe.py
"""

import itertools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from steppingstone_tpu.agents.mirror import MirrorSpec
from steppingstone_tpu.agents.networks import ActorCritic
from steppingstone_tpu.agents.ppo import PPOConfig, make_optimizer, ppo_update
from steppingstone_tpu.envs import make_env

B = 409_600  # 4096 envs x 100 steps
OBS, ACT = 60, 21


def main():
    env = make_env("Walker3DStepperEnv-v0")
    mirror = MirrorSpec.from_env(env)
    net = ActorCritic(action_dim=ACT, num_ensembles=1)
    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1, OBS)))

    batch = dict(
        obs=jax.random.normal(key, (B, OBS)),
        actions=jax.random.normal(key, (B, ACT)) * 0.1,
        log_probs=jnp.zeros((B, 1)),
        values=jnp.zeros((B, 1)),
        returns=jnp.ones((B, 1)),
        adv=jax.random.normal(key, (B, 1)),
    )
    lr = jnp.asarray(3e-4, jnp.float32)

    for mini, use_mirror in itertools.product(
        (10778, 2048, 4096, 8192, 12800), (True, False)
    ):
        nmb = B // mini
        cfg = PPOConfig(num_mini_batch=nmb, mirror=mirror if use_mirror else None)
        tx = make_optimizer(cfg)
        opt_state = tx.init(params)

        upd = jax.jit(
            lambda p, o, b, k: ppo_update(net.apply, tx, cfg, p, o, b, k, lr)
        )
        out = jax.block_until_ready(upd(params, opt_state, batch, key))
        t0 = time.perf_counter()
        out = upd(params, opt_state, batch, key)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(
            f"mini={mini:6d} nmb={nmb:3d} mirror={int(use_mirror)}  "
            f"update={dt:7.3f} s   ({B / dt:,.0f} frames/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
