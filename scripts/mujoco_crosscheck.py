"""Cross-validate our JAX physics engine against MuJoCo on the SAME model.

Why: the reference's env layer (mocca_envs) is absent from its checkout, so
the only behavioral oracles are (a) the shipped policy checkpoints and
(b) an independent reference-grade engine. This script uses the installed
MuJoCo (the engine the reference itself uses for Cassie, SURVEY.md §2.10)
as oracle (b):

  1. passive free-fall in air          -> tight trajectory match expected
  2. actuated swing in air (sinusoid)  -> tight match expected
  3. standing settle on the floor      -> qualitative match (contact models
                                          differ: penalty vs soft-LCP)
  4. the imported reference policy rolled out in BOTH engines with the
     same obs/reward pipeline -> if it fails in both, the transplant gap
     is the (unrecoverable) model parameterization, not our dynamics.

Run:  JAX_PLATFORMS=cpu python scripts/mujoco_crosscheck.py [--policy]
Writes JSON to stdout.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax
import jax.numpy as jnp

import mujoco

from steppingstone_tpu.physics import engine
from steppingstone_tpu.physics.engine import PhysicsState
from steppingstone_tpu.physics.robots.walker3d import walker3d
from steppingstone_tpu.physics import mjcf_export as mx


def run_ours(model, q0, qd0, taus, stones, substeps_total):
    """Step our engine substep-by-substep with per-substep torques."""
    st = PhysicsState(q=jnp.asarray(q0), qd=jnp.asarray(qd0))
    step1 = jax.jit(
        lambda s, tau: engine._step_scan(
            model, s, tau, jnp.asarray(stones), jnp.asarray(0.25),
            jnp.asarray(True), substeps=1,
        )[0]
    )
    traj = [np.asarray(st.q)]
    for i in range(substeps_total):
        st = step1(st, jnp.asarray(taus[i]))
        traj.append(np.asarray(st.q))
    return np.stack(traj)


def run_mujoco(model, q0, qd0, taus, substeps_total, with_floor):
    mj_model = mx.make_mj_model(model, with_floor=with_floor)
    mj_data = mujoco.MjData(mj_model)
    mx.set_state(mj_model, mj_data, q0, qd0)
    act_idx = model.actuated_idx
    lim = model.torque_limit[act_idx]
    traj = [np.asarray(mj_data.qpos).copy()]
    for i in range(substeps_total):
        # our taus are raw joint torques; MuJoCo motors have gear=torque_limit
        mj_data.ctrl[:] = np.asarray(taus[i])[act_idx] / lim
        mujoco.mj_step(mj_model, mj_data)
        traj.append(np.asarray(mj_data.qpos).copy())
    return np.stack(traj)


def compare(tag, ours, mjs, horizon):
    dq_root = np.abs(ours[:horizon, :3] - mjs[:horizon, :3]).max()
    dq_joint = np.abs(ours[:horizon, 7:] - mjs[:horizon, 7:]).max()
    dquat = np.abs(ours[:horizon, 3:7] - mjs[:horizon, 3:7]).max()
    return {
        f"{tag}_max_root_pos_err_m": float(dq_root),
        f"{tag}_max_joint_angle_err_rad": float(dq_joint),
        f"{tag}_max_quat_err": float(dquat),
    }


def policy_rollout_mujoco(model, params, apply_fn, n_episodes=4, max_steps=300,
                          policy_mode="net"):
    """Roll the policy in a MuJoCo port of the stepper env (flat-ground
    level-0 stones): same obs builder, same reward pipeline, MuJoCo
    dynamics. policy_mode: 'net' | 'zero' | 'random'."""
    from steppingstone_tpu.envs.stepper import (
        EnvState, observe, walker3d_stepper,
    )
    from steppingstone_tpu.envs import terrain as terr

    env = walker3d_stepper()
    cfg = env.cfg
    mj_model = mx.make_mj_model(model, with_floor=True)
    rng = np.random.RandomState(0)

    # map foot bodies for contact flags
    results = []
    for ep in range(n_episodes):
        key = jax.random.PRNGKey(100 + ep)
        state, obs = env.reset(key, terr.default_curriculum(0))
        mj_data = mujoco.MjData(mj_model)
        mx.set_state(mj_model, mj_data, np.asarray(state.phys.q),
                     np.asarray(state.phys.qd))
        ep_rew, steps = 0.0, 0
        for t in range(max_steps):
            if policy_mode == "net":
                a = np.asarray(apply_fn(params, obs[None], method="action_mean")[0])
            elif policy_mode == "zero":
                a = np.zeros(cfg.action_dim, np.float32)
            else:
                a = rng.uniform(-1, 1, cfg.action_dim).astype(np.float32)
            act_idx = model.actuated_idx
            mj_data.ctrl[:] = np.clip(a, -1, 1)[act_idx] if len(act_idx) == len(a) else a
            for _ in range(engine.SUBSTEPS):
                mujoco.mj_step(mj_model, mj_data)
            q, qd = mx.get_state(mj_data)
            # push MuJoCo state back into the env pytree, reuse our
            # obs/reward machinery for consistency
            foot_xyz = _foot_xyz_np(env, q)
            height = q[2] - foot_xyz[:, 2].min()
            state = state._replace(
                phys=PhysicsState(q=jnp.asarray(q, jnp.float32),
                                  qd=jnp.asarray(qd, jnp.float32)),
                foot_xyz=jnp.asarray(foot_xyz, jnp.float32),
            )
            obs = np.asarray(observe(cfg, state))
            steps += 1
            if height < cfg.termination_height:
                break
        results.append({"steps_alive": steps, "final_height": float(height)})
    return results


def _foot_xyz_np(env, q):
    from steppingstone_tpu.envs.stepper import _foot_xyz

    return np.asarray(_foot_xyz(env.cfg.model, jnp.asarray(q, jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", action="store_true",
                    help="also run the imported reference policy in MuJoCo")
    ap.add_argument("--substeps", type=int, default=120)  # 0.5 s at 240 Hz
    args = ap.parse_args()

    model = walker3d()
    report = {}
    stones = np.zeros((2, 6), np.float32)
    stones[:, 2] = -100.0  # far below: air/ground only

    base = engine.default_state(model)
    nj = model.njoints

    # ---- 1. passive free-fall in air ---------------------------------
    q0 = np.asarray(base.q).copy()
    q0[2] = 3.0
    qd0 = np.zeros(model.ndof)
    taus = np.zeros((args.substeps, nj), np.float32)
    ours = run_ours(model, q0, qd0, taus, stones, args.substeps)
    mjs = run_mujoco(model, q0, qd0, taus, args.substeps, with_floor=False)
    report.update(compare("freefall", ours, mjs, args.substeps))

    # ---- 2. actuated swing in air ------------------------------------
    t = np.arange(args.substeps)[:, None]
    jidx = np.arange(nj)[None, :]
    taus = (0.4 * model.torque_limit[None, :]
            * np.sin(2 * np.pi * (t / 120.0) + jidx)).astype(np.float32)
    ours = run_ours(model, q0, qd0, taus, stones, args.substeps)
    mjs = run_mujoco(model, q0, qd0, taus, args.substeps, with_floor=False)
    report.update(compare("actuated", ours, mjs, args.substeps))

    # ---- 3. standing settle on floor ---------------------------------
    from steppingstone_tpu.envs.stepper import walker3d_stepper

    env = walker3d_stepper()
    q0 = np.asarray(base.q).copy()
    q0[2] = env.standing_height + 0.01
    taus = np.zeros((args.substeps * 2, nj), np.float32)
    flat = np.zeros((2, 6), np.float32)  # stone discs at origin + ground
    ours = run_ours(model, q0, qd0, taus, flat, args.substeps * 2)
    mjs = run_mujoco(model, q0, qd0, taus, args.substeps * 2, with_floor=True)
    report["settle_final_height_ours"] = float(ours[-1, 2])
    report["settle_final_height_mujoco"] = float(mjs[-1, 2])
    report["settle_ours_upright"] = bool(abs(ours[-1, 3]) > 0.9)
    report["settle_mujoco_upright"] = bool(abs(mjs[-1, 3]) > 0.9)

    # ---- 4. reference policy in the MuJoCo port ----------------------
    if args.policy:
        from steppingstone_tpu.agents.networks import ActorCritic
        from steppingstone_tpu.runtime.torch_import import load_reference_checkpoint

        net = ActorCritic(action_dim=21, num_ensembles=1)
        params, _ = load_reference_checkpoint(
            "/root/reference/playground/models/"
            "mocca_envs:Walker3DStepperEnv-v0_latest.pt", 21,
        )
        report["mujoco_policy_net"] = policy_rollout_mujoco(
            model, params, net.apply, policy_mode="net")
        report["mujoco_policy_zero"] = policy_rollout_mujoco(
            model, params, net.apply, policy_mode="zero")
        report["mujoco_policy_random"] = policy_rollout_mujoco(
            model, params, net.apply, policy_mode="random")

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
