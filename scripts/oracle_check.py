"""Reward/obs-fidelity oracle (VERDICT round-1 item 8).

The best available oracle for the reconstructed obs/reward conventions
(SURVEY.md §2.9 [reconstructed]) is the reference's own trained policy
(`playground/models/Walker3DStepperEnv-v0_latest.pt`): if the import is
faithful AND the env conventions are right, the imported policy should score
far above a random policy and hit several stones.

Runs three policies (imported reference, random, zeros) over a batched
deterministic fleet in a single scanned program and prints a comparison.

Usage: python scripts/oracle_check.py [--envs 64] [--level 0]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from steppingstone_tpu.agents.networks import ActorCritic
from steppingstone_tpu.agents.rollout import EpisodeStats, policy_action
from steppingstone_tpu.envs import make_env
from steppingstone_tpu.envs import terrain as terr
from steppingstone_tpu.envs.vector import VecEnv


def rollout_stats(venv, act_fn, key, num_steps):
    """Scan num_steps; returns per-env (ret, len, valid) of the FIRST
    completed episode plus stone hits accumulated before that episode ended."""

    k_env, k_run = jax.random.split(key)
    state, obs = venv.reset(k_env)

    def body(carry, _):
        state, obs, key, hits, first_done, stats = carry
        key, k = jax.random.split(key)
        action = act_fn(obs, k)
        state, out = venv.step(state, action)
        # count stone hits only until the first episode ends per env
        hits = hits + jnp.where(first_done, 0, out.hit.astype(jnp.int32))
        newly = out.done & ~first_done
        stats = EpisodeStats(
            ret=jnp.where(newly, out.ep_return, stats.ret),
            length=jnp.where(newly, out.ep_len, stats.length),
            valid=stats.valid | newly,
        )
        return (state, out.obs, key, hits, first_done | out.done, stats), None

    n = venv.num_envs
    init = (
        state, obs, k_run,
        jnp.zeros(n, jnp.int32), jnp.zeros(n, bool), EpisodeStats.init(n),
    )
    (state, obs, _, hits, first_done, stats), _ = jax.lax.scan(
        body, init, None, length=num_steps
    )
    # envs that never finished: report running return/elapsed
    ret = jnp.where(stats.valid, stats.ret, state.ep_return)
    length = jnp.where(stats.valid, stats.length, state.elapsed)
    return ret, length, hits, stats.valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--level", type=int, default=0)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--env", default="Walker3DStepperEnv-v0")
    args = ap.parse_args()

    env = make_env(args.env)
    venv = VecEnv(env, args.envs)
    net = ActorCritic(action_dim=env.action_dim, num_ensembles=1)

    from steppingstone_tpu.runtime.torch_import import load_reference_checkpoint

    path = f"/root/reference/playground/models/mocca_envs:{args.env}_latest.pt"
    import os
    if not os.path.exists(path):
        path = f"/root/reference/playground/models/{args.env}_latest.pt"
    params, _ = load_reference_checkpoint(path, env.action_dim)

    # pin the curriculum level for all fleets
    cur0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (args.envs,) + jnp.shape(x)),
        terr.default_curriculum(args.level),
    )
    real_reset = venv.reset
    venv.reset = lambda key, cur=None: real_reset(key, cur0)

    def make_act(mode):
        # mode: traced int — 0 reference-deterministic, 1 uniform-random, 2 zeros
        def act(obs, k):
            mean, _ = policy_action(net.apply, params, obs, None, True)
            rnd = jax.random.uniform(
                k, (obs.shape[0], env.action_dim), minval=-1.0, maxval=1.0
            )
            return jnp.where(mode == 0, mean, jnp.where(mode == 1, rnd, 0.0))
        return act

    @jax.jit
    def run(mode, key):
        return rollout_stats(venv, make_act(mode), key, args.steps)

    t0 = time.time()
    run_l = run.lower(jnp.int32(0), jax.random.PRNGKey(0))
    run_c = run_l.compile()
    print(f"compiled in {time.time()-t0:.1f}s", flush=True)

    results = {}
    for fnid, name in [(0, "reference"), (1, "random"), (2, "zeros")]:
        t0 = time.time()
        ret, length, hits, valid = jax.block_until_ready(
            run_c(jnp.int32(fnid), jax.random.PRNGKey(1093 + fnid))
        )
        ret, length, hits = map(np.asarray, (ret, length, hits))
        results[name] = (ret, length, hits)
        print(
            f"{name:10s}: reward mean {ret.mean():9.1f} median "
            f"{np.median(ret):9.1f} max {ret.max():9.1f} | ep len mean "
            f"{length.mean():6.1f} | stone hits mean {hits.mean():5.2f} "
            f"max {hits.max()} | {time.time()-t0:.1f}s"
        )

    ref_r = results["reference"][0].mean()
    rand_r = results["random"][0].mean()
    ok = ref_r > max(5.0 * abs(rand_r), rand_r + 50.0) and results["reference"][2].mean() > 1.0
    print(f"\noracle {'PASS' if ok else 'FAIL'}: reference policy "
          f"{'beats' if ok else 'does NOT beat'} random "
          f"({ref_r:.1f} vs {rand_r:.1f}; hits {results['reference'][2].mean():.2f})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
