"""Transplant check: run the reference's shipped torch checkpoint
(`/root/reference/playground/models/*.pt`, decoded by
`runtime/torch_import.py`) inside OUR env and compare against a random
policy — the best available oracle for the reconstructed obs/reward
conventions (SURVEY §2.9: the env source is absent from the reference
checkout; conventions were rebuilt from call sites + the ALLSTEPS paper).

Usage:  python scripts/validate_reference_policy.py [--steps N] [--envs N]

Writes a small JSON report to stdout. Interpretation: if the imported
policy beats random by a wide margin, the obs layout matches the training
distribution of the original mocca_envs; if not, the reconstruction
deviates somewhere the policy is sensitive to (this does NOT affect the
framework's own training, which learns from scratch in its own
conventions — the SURVEY acceptance test is the learning curve).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def rollout_stats(venv, net, params, key, steps, n_envs):
    from steppingstone_tpu.agents.rollout import EpisodeStats, collect_rollout

    st, obs = venv.reset(key)
    stats = EpisodeStats.init(n_envs)
    st, obs, stats, traj, aux = collect_rollout(
        venv.step, net.apply, params, st, obs, stats, key, steps,
        deterministic=True,
    )
    valid = np.asarray(stats.valid)
    return {
        "mean_step_reward": float(traj.rewards.mean()),
        "total_stone_hits": int(aux["hits"]),
        "completed_episode_returns": np.asarray(stats.ret)[valid].tolist(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--envs", type=int, default=8)
    ap.add_argument(
        "--net",
        default="/root/reference/playground/models/"
        "mocca_envs:Walker3DStepperEnv-v0_latest.pt",
    )
    args = ap.parse_args()

    from steppingstone_tpu.agents.networks import ActorCritic
    from steppingstone_tpu.envs import make_env
    from steppingstone_tpu.envs.vector import VecEnv
    from steppingstone_tpu.runtime.torch_import import load_reference_checkpoint

    env = make_env("Walker3DStepperEnv-v0")
    venv = VecEnv(env, args.envs)
    net = ActorCritic(action_dim=env.action_dim, num_ensembles=1)
    imported, _ = load_reference_checkpoint(args.net, env.action_dim)
    random_p = net.init(jax.random.PRNGKey(1), jnp.zeros((1, env.observation_dim)))

    key = jax.random.PRNGKey(0)
    report = {
        "checkpoint": args.net,
        "imported": rollout_stats(venv, net, imported, key, args.steps, args.envs),
        "random": rollout_stats(venv, net, random_p, key, args.steps, args.envs),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
