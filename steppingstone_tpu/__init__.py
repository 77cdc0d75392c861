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
