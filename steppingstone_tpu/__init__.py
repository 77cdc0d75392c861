"""steppingstone_tpu — a TPU-native ALLSTEPS framework.

A from-scratch JAX/XLA re-design of the capabilities of
belinghy/SteppingStone (ALLSTEPS, SCA 2020): curriculum-driven PPO training
of stepping-stone locomotion for simulated bipeds (Walker3D, Mike, Cassie).

Instead of PyBullet worker processes behind a shared-memory VecEnv feeding a
PyTorch learner (reference `common/envs_utils.py:486`), everything here runs
on-device under `jit`:

- `core/`     quaternion / 6D spatial algebra primitives
- `physics/`  batched articulated rigid-body engine (CRBA + RNEA forward
              dynamics, penalty contact, PD/torque motors), `vmap`-ed over
              thousands of characters
- `envs/`     functional stepping-stone environments: terrain generation,
              curriculum state, rewards, auto-reset — all array programs
- `agents/`   PPO actor-learner (GAE scan, minibatch SGD, mirror
              augmentation, critic ensembles)
- `parallel/` device-mesh sharding of the env batch, replicated learner
- `runtime/`  experiment driver, config, progress.csv logging, Orbax
              checkpointing
- `viz/`      trajectory dump / rendering / learning-curve plotting
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even when the host image pins a platform list via a
# sitecustomize hook that calls jax.config.update("jax_platforms", ...)
# AFTER jax reads the env var (symptom: JAX_PLATFORMS=cpu still dispatches
# to the tunneled TPU at ~100 ms/op). An explicit config update wins.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass  # backend already initialized; leave it be
