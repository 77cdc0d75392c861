"""Convention-sensitivity sweep for the reference-policy transplant.

The imported Walker3D checkpoint underperforms random in the rebuilt env
(scripts/validate_reference_policy.py) AND in a MuJoCo port of the same
model (scripts/mujoco_crosscheck.py --policy), so the gap is in the
reconstructed model/conventions, not a specific engine. This sweep
perturbs ONE convention at a time and measures whether the imported
policy improves — the way to locate (or rule out) recoverable mismatches:

  power x{0.5..2}  : global torque scale (PyBullet gains unknown)
  stiff_limits     : joint-limit spring 600 -> 6000 (PyBullet limits are
                     near-rigid constraints; ours are soft penalties)
  speeds x{0.1,10} : joint-speed obs scaling (mocca composes a 0.1 factor
                     with pybullet's current_relative_position, which may
                     itself scale velocity by 0.1)
  raw_angles       : un-normalized joint angles in obs
  swap_rp          : [.., pitch, roll] instead of [.., roll, pitch]
  flat_terrain     : all stones at z=0 exactly (isolate terrain shape)

Run:  JAX_PLATFORMS=cpu python scripts/transplant_sweep.py
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


def rollout(env, venv, net, params, obs_tf=None, power=None, steps=STEPS):
    """Deterministic vmapped rollout; returns summary stats."""
    from steppingstone_tpu.envs import terrain as terr

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, N_ENVS)
    state, obs = jax.vmap(env.reset, in_axes=(0, None))(
        keys, terr.default_curriculum(0)
    )
    if power is not None:
        state = state._replace(
            robot_power=jnp.full_like(state.robot_power, power)
        )

    @jax.jit
    def run(params, state, obs):
        def body(carry, _):
            state, obs = carry
            o = obs_tf(obs) if obs_tf is not None else obs
            a = net.apply(params, o, method="action_mean")
            state, out = jax.vmap(env.step)(state, a)
            return (state, out.obs), (out.reward, out.done, out.hit)

        (state, obs), (rew, done, hit) = jax.lax.scan(
            body, (state, obs), None, length=steps
        )
        return rew, done, hit

    rew, done, hit = run(params, state, obs)
    # steps until first fall, per env
    d = np.asarray(done)
    first = np.where(d.any(0), d.argmax(0) + 1, steps)
    return {
        "mean_step_reward": float(np.asarray(rew).mean()),
        "mean_steps_to_first_done": float(first.mean()),
        "total_hits": int(np.asarray(hit).sum()),
        "episodes_ended": int(d.sum()),
    }


def main():
    from steppingstone_tpu.agents.networks import ActorCritic
    from steppingstone_tpu.envs.stepper import walker3d_stepper
    from steppingstone_tpu.envs.vector import VecEnv
    from steppingstone_tpu.runtime.torch_import import load_reference_checkpoint
    from steppingstone_tpu.physics import engine

    env = walker3d_stepper()
    venv = VecEnv(env, N_ENVS)
    net = ActorCritic(action_dim=21, num_ensembles=1)
    params, _ = load_reference_checkpoint(
        "/root/reference/playground/models/"
        "mocca_envs:Walker3DStepperEnv-v0_latest.pt", 21,
    )
    rnd = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 60)))

    model = env.cfg.model
    lo = np.asarray(model.joint_lower)
    hi = np.asarray(model.joint_upper)
    mid, half = 0.5 * (lo + hi), 0.5 * (hi - lo)

    def tf_speeds(scale):
        def tf(obs):
            return obs.at[..., 27:48].multiply(scale)
        return tf

    def tf_raw_angles(obs):
        return obs.at[..., 6:27].set(obs[..., 6:27] * half + mid)

    def tf_swap_rp(obs):
        return obs.at[..., 4].set(obs[..., 5]).at[..., 5].set(obs[..., 4])

    report = {}
    report["imported_baseline"] = rollout(env, venv, net, params)
    report["random_baseline"] = rollout(env, venv, net, rnd)
    for pw in (0.5, 0.75, 1.25, 1.5, 2.0):
        report[f"imported_power_{pw}"] = rollout(env, venv, net, params, power=pw)
    report["imported_speeds_x0.1"] = rollout(env, venv, net, params, obs_tf=tf_speeds(0.1))
    report["imported_speeds_x10"] = rollout(env, venv, net, params, obs_tf=tf_speeds(10.0))
    report["imported_raw_angles"] = rollout(env, venv, net, params, obs_tf=tf_raw_angles)
    report["imported_swap_roll_pitch"] = rollout(env, venv, net, params, obs_tf=tf_swap_rp)

    # stiff joint limits: patch the module constants and rebuild the step
    engine.LIMIT_K, engine.LIMIT_C = 6000.0, 60.0
    engine._step_core.cache_clear()
    env2 = walker3d_stepper.__wrapped__() if hasattr(walker3d_stepper, "__wrapped__") else walker3d_stepper()
    report["imported_stiff_limits"] = rollout(env2, venv, net, params)
    report["random_stiff_limits"] = rollout(env2, venv, net, rnd)
    engine.LIMIT_K, engine.LIMIT_C = 600.0, 20.0
    engine._step_core.cache_clear()

    # critic plausibility: imported critic's value on reset obs vs random
    # states (a layout-sanity, not a dynamics, check)
    key = jax.random.PRNGKey(0)
    from steppingstone_tpu.envs import terrain as terr

    st, obs0 = env.reset(key, terr.default_curriculum(0))
    v_reset = float(net.apply(params, obs0[None], method="value")[0, 0])
    v_noise = float(
        net.apply(params, jax.random.normal(key, (16, 60)), method="value").mean()
    )
    report["critic_value_at_reset_obs"] = v_reset
    report["critic_value_on_gaussian_noise"] = v_noise

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
