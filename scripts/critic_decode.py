"""Decode the imported critic's expected observation manifold.

V(our reset obs) ~ 0.2 while V(noise) ~ -11.5 (transplant_sweep.py): the
imported critic recognizes structure in our obs but places it off its
training manifold. This probe sweeps obs components one at a time around
our reset obs and reports where the critic's value peaks — i.e. what
component values the ORIGINAL mocca_envs observations had. Mismatched
peaks localize reconstruction errors (e.g. expected standing height,
velocity scale, target distance).

Run:  JAX_PLATFORMS=cpu python scripts/critic_decode.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from steppingstone_tpu.agents.networks import ActorCritic
    from steppingstone_tpu.envs import terrain as terr
    from steppingstone_tpu.envs.stepper import walker3d_stepper
    from steppingstone_tpu.runtime.torch_import import load_reference_checkpoint

    env = walker3d_stepper()
    net = ActorCritic(action_dim=21, num_ensembles=1)
    params, _ = load_reference_checkpoint(
        "/root/reference/playground/models/"
        "mocca_envs:Walker3DStepperEnv-v0_latest.pt", 21,
    )
    st, obs0 = env.reset(jax.random.PRNGKey(0), terr.default_curriculum(0))
    obs0 = np.asarray(obs0)

    value = jax.jit(lambda o: net.apply(params, o, method="value")[..., 0])
    act = jax.jit(lambda o: net.apply(params, o, method="action_mean"))

    report = {
        "reset_obs_header": obs0[:6].tolist(),
        "reset_obs_targets": obs0[48:].tolist(),
        "v_at_reset": float(value(obs0[None])[0]),
        "actor_mean_abs_action_at_reset": float(np.abs(np.asarray(act(obs0[None]))).mean()),
        "actor_max_abs_action_at_reset": float(np.abs(np.asarray(act(obs0[None]))).max()),
    }

    # ---- sweep scalar components -------------------------------------
    sweeps = {
        "height[0]": (0, np.linspace(0.6, 1.8, 61)),
        "vx[1]": (1, np.linspace(-2.0, 4.0, 61)),
        "vy[2]": (2, np.linspace(-2.0, 2.0, 61)),
        "vz[3]": (3, np.linspace(-2.0, 2.0, 61)),
        "roll[4]": (4, np.linspace(-1.0, 1.0, 61)),
        "pitch[5]": (5, np.linspace(-1.0, 1.0, 61)),
    }
    for name, (idx, grid) in sweeps.items():
        batch = np.repeat(obs0[None], len(grid), 0)
        batch[:, idx] = grid
        v = np.asarray(value(jnp.asarray(batch)))
        report[f"sweep_{name}"] = {
            "argmax": float(grid[int(v.argmax())]),
            "v_max": float(v.max()),
            "v_at_ours": float(value(obs0[None])[0]),
            "ours": float(obs0[idx]),
        }

    # ---- block scale sweeps ------------------------------------------
    blocks = {
        "joint_angles[6:27]": slice(6, 27),
        "joint_speeds[27:48]": slice(27, 48),
        "targets[50:60]": slice(50, 60),
    }
    scales = np.linspace(0.0, 3.0, 31)
    for name, sl in blocks.items():
        batch = np.repeat(obs0[None], len(scales), 0)
        batch[:, sl] = obs0[sl][None] * scales[:, None]
        v = np.asarray(value(jnp.asarray(batch)))
        report[f"scale_{name}"] = {
            "argmax_scale": float(scales[int(v.argmax())]),
            "v_max": float(v.max()),
        }

    # ---- target-distance sweep: rebuild the 2 lookahead rows for a
    # stone straight ahead at distance d, flat ----------------------------
    ds = np.linspace(0.2, 2.5, 47)
    batch = np.repeat(obs0[None], len(ds), 0)
    for i, d in enumerate(ds):
        batch[i, 48:53] = [0.0, d, 0.0, 0.0, 0.0]           # sin*d, cos*d, dz, tilts
        batch[i, 53:58] = [0.0, d + 0.8, 0.0, 0.0, 0.0]
    v = np.asarray(value(jnp.asarray(batch)))
    report["sweep_target_distance"] = {
        "argmax_d": float(ds[int(v.argmax())]),
        "v_max": float(v.max()),
    }

    # ---- joint-angle sweep per joint (normalized space) ---------------
    best = {}
    for j in range(21):
        grid = np.linspace(-1.0, 1.0, 41)
        batch = np.repeat(obs0[None], len(grid), 0)
        batch[:, 6 + j] = grid
        v = np.asarray(value(jnp.asarray(batch)))
        best[env.cfg.model.joint_names[j]] = {
            "ours": round(float(obs0[6 + j]), 3),
            "argmax": round(float(grid[int(v.argmax())]), 3),
            "dv": round(float(v.max() - value(obs0[None])[0]), 2),
        }
    report["per_joint_normalized_angle"] = best

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
