"""Walking-behavior evaluation: the metric that catches reward gaming.

Mean episode reward can be farmed by standing still (tall bonus ~2/step;
see commit d279f44), so capability claims are backed by BEHAVIOR: stones
crossed, falls, distance traveled, per-episode returns — per curriculum
level, deterministic policy, N envs x T steps (default 256 x 1000, sized
for on-chip eval; round-3 verdict task 7).

Usage:
  python scripts/behavior_eval.py runs/r4_w3d \
      [--env Walker3DStepperEnv-v0] [--levels 0 2 5] [--ensembles 1]
      [--plank_class LargePlank] [--platform axon|cpu]
Writes JSON to stdout.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--env", default="Walker3DStepperEnv-v0")
    ap.add_argument("--levels", type=float, nargs="*", default=[0, 2, 5])
    ap.add_argument("--ensembles", type=int, default=1)
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--tag", default="latest")
    ap.add_argument("--plank_class", default=None,
                    help="evaluate on this support geometry (stepper.PLANK_CLASSES)")
    ap.add_argument("--bands", type=int, nargs="*", default=None,
                    help="evaluate at specialist difficulty BANDS (annuli "
                    "of the 11x11 grid, terrain.specialist_band_prob) "
                    "instead of levels; support geometry fixed at level 5")
    ap.add_argument("--specialists", action="store_true",
                    help="with --bands: load checkpoints/specialist_k for "
                    "band k (vs the single --tag policy for every band)")
    ap.add_argument("--platform", default=os.environ.get("JAX_PLATFORMS", "cpu"))
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()
    os.environ["JAX_PLATFORMS"] = args.platform

    import jax
    import jax.numpy as jnp
    import numpy as np

    from steppingstone_tpu.agents.networks import ActorCritic
    from steppingstone_tpu.envs import make_env
    from steppingstone_tpu.envs import terrain as terr
    from steppingstone_tpu.runtime.checkpoint import CheckpointManager

    kw = {"plank_class": args.plank_class} if args.plank_class else {}
    env = make_env(args.env, **kw)
    net = ActorCritic(action_dim=env.action_dim, num_ensembles=args.ensembles)
    mgr = CheckpointManager(os.path.join(args.run_dir, "checkpoints"))
    snap = mgr.restore(args.tag)
    params = jax.device_put(snap["params"])

    N, T = args.envs, args.steps
    report = {"run": args.run_dir, "env": args.env, "tag": args.tag,
              "envs": N, "steps": T, "support": env.cfg.support,
              "plank_class": args.plank_class}
    # evaluation entries: curriculum levels, or specialist bands (annuli
    # of the (yaw, pitch) grid at level-5 support geometry) — the latter
    # backs the specialist-vs-generalist comparison (round-4 verdict
    # task 8; reference update_specialist semantics, train.py:542-549)
    entries = []
    if args.bands is not None:
        for k in args.bands:
            p = params
            if args.specialists:
                sk = mgr.restore(f"specialist_{min(k, 4)}")
                p = jax.device_put(sk["params"])
            cur = terr.default_curriculum(terr.N_LEVELS - 1)._replace(
                sample_prob=terr.specialist_band_prob(k),
                use_prob=jnp.asarray(True),
            )
            name = f"band_{k}" + ("_specialist" if args.specialists else "")
            entries.append((name, cur, p))
    else:
        for level in args.levels:
            entries.append(
                (f"level_{level:g}", terr.default_curriculum(level), params)
            )

    for label, cur, params in entries:
        keys = jax.random.split(jax.random.PRNGKey(7), N)
        state, obs = jax.jit(
            jax.vmap(env.reset, in_axes=(0, None))
        )(keys, cur)

        last = env.cfg.n_stones - 1

        @jax.jit
        def run(params, state, obs):
            def body(c, _):
                state, obs = c
                ns_pre = state.next_step_index  # target BEFORE this step
                a = net.apply(params, obs, method="action_mean")
                state, out = jax.vmap(env.step)(state, a)
                return (state, out.obs), (
                    out.reward, out.hit, out.done, out.timeout,
                    out.ep_return, out.ep_len, ns_pre,
                )

            (state, obs), ys = jax.lax.scan(body, (state, obs), None, length=T)
            return ys, state

        (rew, hit, done, tout, ep_ret, ep_len, ns_pre), fstate = run(
            params, state, obs
        )
        rew, hit, done, tout, ep_ret, ep_len, ns_pre = (
            np.asarray(v) for v in (rew, hit, done, tout, ep_ret, ep_len, ns_pre)
        )
        ended = int(done.sum())              # completed episodes
        falls = int(done.sum() - tout.sum())  # ended by falling, not time
        # the terrain is a FINITE track of n_stones (the reference's is an
        # infinite treadmill, enjoy.py resamples forever): an episode whose
        # target index reached the LAST stone has walked the whole track —
        # ending there (running off the end / stopping) is success, not a
        # capability fall. Capability metrics below exclude those.
        reached_end = done & (ns_pre >= last)
        falls_mid = int((done & ~tout & (ns_pre < last)).sum())
        # episodes in flight at the horizon count once each for rates
        n_ep = ended + N
        d = ep_ret[done]
        report[label] = {
            "episodes_completed": ended,
            "falls": falls,
            "fall_rate": round(falls / max(n_ep, 1), 3),
            "walked_whole_track": int(reached_end.sum()),
            "walked_whole_track_rate": round(
                float(reached_end.sum()) / max(n_ep, 1), 3
            ),
            "falls_before_track_end": falls_mid,
            "fall_before_end_rate": round(falls_mid / max(n_ep, 1), 3),
            "stone_hits_total": int(hit.sum()),
            "stones_per_episode": round(float(hit.sum()) / max(n_ep, 1), 2),
            "mean_episode_reward": round(float(d.mean()), 1) if d.size else None,
            "median_episode_reward": round(float(np.median(d)), 1) if d.size else None,
            "mean_episode_len": round(float(ep_len[done].mean()), 1) if ended else None,
            "reward_per_step": round(float(rew.mean()), 2),
            "mean_final_next_step_index": round(
                float(np.asarray(fstate.next_step_index).mean()), 1
            ),
            "mean_final_x_m": round(float(np.asarray(fstate.phys.q[:, 0]).mean()), 1),
        }
        print(f"{label} done", file=sys.stderr, flush=True)
    js = json.dumps(report, indent=2)
    print(js)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")


if __name__ == "__main__":
    main()
