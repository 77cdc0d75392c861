"""Second-stage transplant decoding: test CONSISTENT convention
transforms (obs + action together) against the imported policy.

critic_decode.py suggested (a) the critic prefers much smaller height
values than our 1.25, and (b) per-joint preferred normalized angles that
look like SIGN-FLIPPED versions of ours (right_knee: ours +0.52, critic
peak -0.55). A flipped joint-sign convention upstream is exactly
emulated by negating that joint's normalized-angle obs, speed obs, AND
action (limits mirror too, so the normalization midpoint flips sign).

For each candidate transform this reports:
  v_reset    critic value of the transformed reset obs (manifold check)
  rollout    deterministic 4-env x 200-step run with the transform
             applied to obs before the net and to actions after it

Run:  JAX_PLATFORMS=cpu python scripts/critic_decode2.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

N_ENVS = 4
STEPS = 200

J = {  # joint name -> action/joint index (render_utils order)
    n: i for i, n in enumerate([
        "abdomen_z", "abdomen_y", "abdomen_x",
        "right_hip_x", "right_hip_z", "right_hip_y", "right_knee",
        "right_ankle", "left_hip_x", "left_hip_z", "left_hip_y",
        "left_knee", "left_ankle",
        "right_shoulder_x", "right_shoulder_z", "right_shoulder_y",
        "right_elbow", "left_shoulder_x", "left_shoulder_z",
        "left_shoulder_y", "left_elbow",
    ])
}


def flip_tf(joints):
    idx = np.array([J[n] for n in joints])

    def obs_tf(obs):
        o = obs.at[..., 6 + idx].multiply(-1.0)
        return o.at[..., 27 + idx].multiply(-1.0)

    def act_tf(a):
        return a.at[..., idx].multiply(-1.0)

    return obs_tf, act_tf


def height_shift_tf(shift):
    def obs_tf(obs):
        return obs.at[..., 0].add(shift)

    return obs_tf, None


def dz_feet_tf(obs):
    """Target dz relative to the lowest foot instead of the root:
    dz_feet = dz_root + height_obs."""
    h = obs[..., 0]
    o = obs.at[..., 52].add(h)
    return o.at[..., 57].add(h)


def rollout(env, net, params, obs_tf=None, act_tf=None, steps=STEPS):
    from steppingstone_tpu.envs import terrain as terr

    keys = jax.random.split(jax.random.PRNGKey(0), N_ENVS)
    state, obs = jax.vmap(env.reset, in_axes=(0, None))(
        keys, terr.default_curriculum(0)
    )

    @jax.jit
    def run(params, state, obs):
        def body(carry, _):
            state, obs = carry
            o = obs_tf(obs) if obs_tf is not None else obs
            a = net.apply(params, o, method="action_mean")
            if act_tf is not None:
                a = act_tf(a)
            state, out = jax.vmap(env.step)(state, a)
            return (state, out.obs), (out.reward, out.done, out.hit)

        (state, obs), (rew, done, hit) = jax.lax.scan(
            body, (state, obs), None, length=steps
        )
        return rew, done, hit

    rew, done, hit = run(params, state, obs)
    d = np.asarray(done)
    first = np.where(d.any(0), d.argmax(0) + 1, steps)
    return {
        "mean_step_reward": round(float(np.asarray(rew).mean()), 3),
        "mean_steps_to_first_done": float(first.mean()),
        "total_hits": int(np.asarray(hit).sum()),
    }


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
    value = jax.jit(lambda o: net.apply(params, o, method="value")[..., 0])

    report = {}

    # ---- extended scalar sweeps on the reset obs ----------------------
    for name, idx, lo, hi in (
        ("height_ext", 0, -0.5, 1.8),
    ):
        grid = np.linspace(lo, hi, 93)
        batch = np.repeat(np.asarray(obs0)[None], len(grid), 0)
        batch[:, idx] = grid
        v = np.asarray(value(jnp.asarray(batch)))
        report[f"sweep_{name}"] = {
            "argmax": round(float(grid[int(v.argmax())]), 3),
            "v_max": round(float(v.max()), 2),
        }
    # dz of both lookahead targets swept jointly
    grid = np.linspace(-1.6, 0.6, 89)
    batch = np.repeat(np.asarray(obs0)[None], len(grid), 0)
    batch[:, 52] = grid
    batch[:, 57] = grid
    v = np.asarray(value(jnp.asarray(batch)))
    report["sweep_target_dz"] = {
        "argmax": round(float(grid[int(v.argmax())]), 3),
        "v_max": round(float(v.max()), 2),
        "ours": round(float(np.asarray(obs0)[52]), 3),
    }

    # ---- candidate transforms ----------------------------------------
    cands = {
        "baseline": (None, None),
        "flip_knees": flip_tf(["right_knee", "left_knee"]),
        "flip_hips_y": flip_tf(["right_hip_y", "left_hip_y"]),
        "flip_knees_hips_y": flip_tf(
            ["right_knee", "left_knee", "right_hip_y", "left_hip_y"]
        ),
        "flip_abdomen_y": flip_tf(["abdomen_y"]),
        "flip_all_y": flip_tf([
            "abdomen_y", "right_hip_y", "left_hip_y", "right_knee",
            "left_knee", "right_ankle", "left_ankle",
            "right_shoulder_y", "left_shoulder_y", "right_elbow", "left_elbow",
        ]),
        "flip_elbows": flip_tf(["right_elbow", "left_elbow"]),
        "height_minus_init": height_shift_tf(-float(np.asarray(obs0)[0])),
        "dz_rel_feet": (dz_feet_tf, None),
    }
    # combo: best structural guesses together
    ot1, at1 = cands["flip_knees_hips_y"]
    ot2, _ = cands["height_minus_init"]
    cands["combo_flipKH_heightInit"] = (
        lambda o: ot2(ot1(o)), at1
    )
    ot3, at3 = cands["flip_all_y"]
    cands["combo_flipAllY_heightInit_dzFeet"] = (
        lambda o: ot2(dz_feet_tf(ot3(o))), at3
    )

    for name, (obs_tf, act_tf) in cands.items():
        o = obs_tf(obs0) if obs_tf is not None else obs0
        report[name] = {
            "v_reset": round(float(value(o[None])[0]), 2),
            "rollout": rollout(env, net, params, obs_tf, act_tf),
        }

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
