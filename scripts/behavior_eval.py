"""Walking-behavior evaluation: the metric that catches reward gaming.

Mean episode reward can be farmed by standing still (tall bonus ~2/step;
see commit d279f44), so capability claims are backed by BEHAVIOR: stones
crossed, distance traveled, falls — per curriculum level, deterministic
policy, N envs x T steps.

Usage:
  JAX_PLATFORMS=cpu python scripts/behavior_eval.py runs/r3_w3d_pallas \
      [--env Walker3DStepperEnv-v0] [--levels 0 2 5] [--ensembles 1]
Writes JSON to stdout.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--env", default="Walker3DStepperEnv-v0")
    ap.add_argument("--levels", type=int, nargs="*", default=[0, 2, 5])
    ap.add_argument("--ensembles", type=int, default=1)
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--tag", default="best")
    args = ap.parse_args()

    from steppingstone_tpu.agents.networks import ActorCritic
    from steppingstone_tpu.envs import make_env
    from steppingstone_tpu.envs import terrain as terr
    from steppingstone_tpu.runtime.checkpoint import CheckpointManager

    env = make_env(args.env)
    net = ActorCritic(action_dim=env.action_dim, num_ensembles=args.ensembles)
    mgr = CheckpointManager(os.path.join(args.run_dir, "checkpoints"))
    snap = mgr.restore(args.tag)
    params = jax.device_put(snap["params"])

    N, T = args.envs, args.steps
    report = {"run": args.run_dir, "env": args.env, "tag": args.tag,
              "envs": N, "steps": T}
    for level in args.levels:
        keys = jax.random.split(jax.random.PRNGKey(7), N)
        state, obs = jax.vmap(env.reset, in_axes=(0, None))(
            keys, terr.default_curriculum(level)
        )

        @jax.jit
        def run(params, state, obs):
            def body(c, _):
                state, obs = c
                a = net.apply(params, obs, method="action_mean")
                state, out = jax.vmap(env.step)(state, a)
                return (state, out.obs), (out.reward, out.hit, out.done)

            (state, obs), ys = jax.lax.scan(body, (state, obs), None, length=T)
            return ys, state

        (rew, hit, done), fstate = run(params, state, obs)
        rew, hit, done = (np.asarray(v) for v in (rew, hit, done))
        report[f"level_{level}"] = {
            "reward_per_step": round(float(rew.mean()), 2),
            "stone_hits_total": int(hit.sum()),
            "stone_hits_per_episode_equiv": round(
                float(hit.sum()) / max(1, int(done.sum()) + N), 1
            ),
            "falls": int(done.sum()),
            "mean_final_next_step_index": round(
                float(np.asarray(fstate.next_step_index).mean()), 1
            ),
            "mean_final_x_m": round(float(np.asarray(fstate.phys.q[:, 0]).mean()), 1),
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
