"""Device mesh + sharding layout for the env-batch data-parallel strategy.

The reference's only parallelism axis is data-parallel env workers feeding
one learner (SURVEY.md §2.11). The TPU-native analog: a 1-D `env` mesh
axis; the stacked EnvState/observation/rollout pytrees shard their leading
env axis across chips (collectives ride ICI), while params + optimizer
state are replicated and XLA inserts the gradient all-reduce
automatically from the sharding annotations (no hand-written psum — the
scaling-book recipe: annotate, let XLA place collectives).

Model-parallel axes are deliberately absent: the networks are 256-wide
MLPs (SURVEY.md §2.11 — "model-parallel strategies are N/A").
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(n_devices: int = 0) -> Mesh:
    """1-D mesh over the first `n_devices` devices (0 = all)."""
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env-batch) axis across the mesh."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _global_put(x, sharding: NamedSharding):
    """device_put that also works when the mesh spans multiple host
    processes: every process holds the full host value (same seed on every
    host) and contributes its addressable shards."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def shard_env_tree(mesh: Mesh, tree):
    """Place a stacked env-state pytree with its leading axis sharded."""
    s = env_sharding(mesh)
    return jax.tree.map(lambda x: _global_put(x, s), tree)


def replicate_tree(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: _global_put(x, s), tree)


def maybe_initialize_distributed():
    """Multi-host bring-up (JAX distributed runtime over DCN). No-op when
    the coordinator env vars are absent — single-host runs unchanged.

    Env contract (set by scripts/pod_run_train.sh or the cluster launcher):
      JAX_COORDINATOR_ADDRESS  host:port of process 0
      JAX_NUM_PROCESSES        total host processes (optional on TPU pods)
      JAX_PROCESS_ID           this process's rank   (optional on TPU pods)
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True
