"""Inference / visualization driver — the reference `playground/enjoy.py`
re-designed for offline TPU workflows.

Instead of a live PyBullet GUI, this rolls out a trained policy
deterministically (optionally with specialist switching), records the full
kinematic trajectory + terrain on device, and writes:

- a .npz trajectory dump (body positions/orientations, stones, rewards,
  contacts) for the viz/ renderers (reference `--dump` mp4 path,
  enjoy.py:352-377)
- per-hit candidate-stone value heatmaps (reference value plotting,
  enjoy.py:234-316)
- a console episode report (reward, steps, stones reached)

Usage:
  python -m steppingstone_tpu.runtime.enjoy --env Walker3DStepperEnv-v0 \
      --net runs/exp/checkpoints/latest [--steps 1000] [--dump traj.npz] \
      [--plot-value] [--curriculum 5]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from steppingstone_tpu.agents.networks import ActorCritic
from steppingstone_tpu.agents.rollout import policy_action
from steppingstone_tpu.envs import make_env
from steppingstone_tpu.envs import terrain as terr
from steppingstone_tpu.envs.stepper import create_temp_states
from steppingstone_tpu.physics import kinematics as km


def load_params(net_path: str, env, num_ensembles: int):
    """Load either an orbax checkpoint dir or a reference torch .pt."""
    if net_path.endswith(".pt"):
        from steppingstone_tpu.runtime.torch_import import load_reference_checkpoint

        params, n = load_reference_checkpoint(net_path, env.action_dim)
        return params, n
    from steppingstone_tpu.runtime.checkpoint import CheckpointManager

    mgr = CheckpointManager(os.path.dirname(net_path) or ".")
    snap = mgr.restore(os.path.basename(net_path))
    params = snap["params"] if "params" in snap else snap
    n = len([k for k in params["params"] if k.startswith("c") and k[1:].isdigit()])
    return params, n


def run_episode(env, net, params, key, max_steps: int, plot_value: bool,
                curriculum_level: int, specialists=None):
    """Roll one deterministic episode; `specialists` is an optional list of
    param trees switched by difficulty level (reference `--use_specialist`,
    enjoy.py:104-110 + specialist switching)."""
    cfg = env.cfg
    cur = terr.default_curriculum(curriculum_level)
    state, obs = env.reset(key, cur)

    @jax.jit
    def step_fn(params, state, obs):
        action, _ = policy_action(net.apply, params, obs, None, True)
        state, out = env.step(state, action)
        return state, out, action

    @jax.jit
    def kin_of(state):
        kin = km.forward_kinematics(cfg.model, state.phys.q)
        return kin.pos, kin.quat

    @jax.jit
    def value_grid_of(state):
        temp = create_temp_states(cfg, state)
        v = net.apply(params, temp, method="ensemble_values")
        return jnp.mean(v, axis=-1).reshape(terr.GRID, terr.GRID)

    @jax.jit
    def value_of(params, obs):
        return net.apply(params, obs, method="value")[0]

    frames, rewards, contacts, value_grids = [], [], [], []
    actions_log, values_log = [], []
    stones0 = np.asarray(state.terrain)
    total, hits = 0.0, 0
    active = params
    for t in range(max_steps):
        pos, quat = kin_of(state)
        frames.append((np.asarray(pos), np.asarray(quat)))
        if specialists:
            # switch specialist by how deep into the terrain we are (one
            # specialist per difficulty band)
            band = min(int(state.next_step_index) * len(specialists)
                       // cfg.n_stones, len(specialists) - 1)
            active = specialists[band]
        values_log.append(float(value_of(active, obs)))
        state, out, action = step_fn(active, state, obs)
        obs = out.obs
        rewards.append(float(out.reward))
        actions_log.append(np.asarray(action))
        contacts.append(np.asarray(state.foot_contact))
        total += float(out.reward)
        hits += int(out.hit)
        if plot_value and bool(state.update_terrain):
            value_grids.append(np.asarray(value_grid_of(state)))
        if bool(out.done):
            break
    return dict(
        frames=frames,
        rewards=np.array(rewards),
        actions=np.array(actions_log),
        values=np.array(values_log),
        contacts=np.array(contacts),
        stones=stones0,
        value_grids=value_grids,
        total_reward=total,
        hits=hits,
        steps=len(rewards),
        final_terrain=np.asarray(state.terrain),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="Walker3DStepperEnv-v0")
    ap.add_argument("--net", default=None,
                    help="orbax checkpoint dir or reference .pt file")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=1093)  # reference enjoy.py:102
    ap.add_argument("--dump", default=None, help="write trajectory .npz here")
    ap.add_argument("--plot-value", action="store_true")
    ap.add_argument("--curriculum", type=float, default=0)
    ap.add_argument("--num-ensembles", type=int, default=1)
    ap.add_argument("--episodes", type=int, default=1)
    ap.add_argument("--use-specialist", action="store_true",
                    help="load <net>_specialist_{0..4} and switch by depth")
    ap.add_argument("--plank-class", default=None,
                    help="support geometry (stepper.PLANK_CLASSES)")
    args = ap.parse_args(argv)

    kw = {"plank_class": args.plank_class} if args.plank_class else {}
    env = make_env(args.env, **kw)
    print(f"Env: {args.env}")

    if args.net is None:
        # reference default: models/{env}_latest.pt (enjoy.py:100)
        args.net = os.path.join(
            "/root/reference/playground/models", f"{args.env}_latest.pt"
        )
    print(f"Model: {os.path.basename(args.net)}")
    params, n_ens = load_params(args.net, env, args.num_ensembles)
    net = ActorCritic(action_dim=env.action_dim, num_ensembles=max(n_ens, 1))

    specialists = None
    if args.use_specialist:
        # reference loads {env}_specialist_{0..4}.pt (enjoy.py:104-110)
        specialists = []
        for i in range(5):
            for cand in (f"{args.net}_specialist_{i}",
                         args.net.replace("latest", f"specialist_{i}")):
                if os.path.exists(cand) or os.path.isdir(cand):
                    specialists.append(load_params(cand, env, n_ens)[0])
                    break
        if not specialists:
            raise SystemExit("no specialist checkpoints found next to --net")
        print(f"loaded {len(specialists)} specialists")

    key = jax.random.PRNGKey(args.seed)
    for ep in range(args.episodes):
        key, k = jax.random.split(key)
        result = run_episode(
            env, net, params, k, args.steps, args.plot_value, args.curriculum,
            specialists=specialists,
        )
        print(
            f"episode {ep}: reward {result['total_reward']:.1f} over "
            f"{result['steps']} steps, stones hit: {result['hits']}"
        )
        if args.dump:
            path = args.dump if args.episodes == 1 else f"{args.dump}.{ep}"
            pos = np.stack([f[0] for f in result["frames"]])
            quat = np.stack([f[1] for f in result["frames"]])
            np.savez_compressed(
                path,
                body_pos=pos, body_quat=quat,
                rewards=result["rewards"], contacts=result["contacts"],
                actions=result["actions"], values=result["values"],
                stones=result["final_terrain"],
                body_names=np.array(env.cfg.model.body_names),
                joint_names=np.array(env.cfg.model.joint_names),
                value_grids=np.array(result["value_grids"])
                if result["value_grids"] else np.zeros((0, terr.GRID, terr.GRID)),
            )
            print(f"wrote {path}")


if __name__ == "__main__":
    main()
