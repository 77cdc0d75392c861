"""Orbax checkpointing: full-resume snapshots with latest/best aliases.

Upgrades the reference's `torch.save(whole module)` pattern
(`playground/train.py:523-562`): we persist params + optimizer state +
batched env/curriculum/PRNG state + counters, so a resumed run continues
bit-compatibly (the reference loses optimizer state and env/curriculum
state on restart, SURVEY.md §5). Cadence mirrors the reference: `_latest`
every update, `_best` on new max mean reward, numbered snapshots every
`save_every` frames.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """`async_=True` defers the commit to orbax's background thread
    (StandardCheckpointer IS an AsyncCheckpointer): `save` returns once the
    host snapshot is handed off, and the next `save`/`restore` joins any
    in-flight write first. The trainer passes host-numpy pytrees, so the
    handoff itself costs no device sync.

    Multi-process safety: orbax's save/finalize runs barrier collectives
    internally (`multihost.sync_global_processes`), so on multi-host meshes
    **every** process must call `save` with the same (replicated) pytree —
    orbax lets only the primary host touch the filesystem."""

    def __init__(self, directory: str, async_: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._async = async_

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def save(self, tag: str, state: Any):
        """Save a pytree under `tag` (e.g. 'latest', 'best', '10000000')."""
        self._ckptr.wait_until_finished()  # join any in-flight async save
        self._ckptr.save(self._path(tag), state, force=True)
        if not self._async:
            self._ckptr.wait_until_finished()

    def wait(self):
        self._ckptr.wait_until_finished()

    def restore(self, tag: str, target: Any | None = None) -> Any:
        """Restore; `target` provides the pytree structure/shapes."""
        self._ckptr.wait_until_finished()
        if target is not None:
            return self._ckptr.restore(self._path(tag), target=target)
        return self._ckptr.restore(self._path(tag))

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self._path(tag))

    def tags(self):
        return sorted(os.listdir(self.directory)) if os.path.isdir(self.directory) else []


def host_pytree(tree):
    """Device -> host numpy copy of a pytree (for saving).

    Per-leaf transfers pay one host<->device round trip each — over a
    tunneled TPU that is ~25 ms * n_leaves. Instead, concatenate all leaves
    of a common dtype on device (one fused XLA program) and move ONE buffer
    per dtype, then split on host.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    # cross-host sharded leaves (multi-host env state): allgather to every
    # process first — a collective, so host_pytree must be called by all
    if any(
        isinstance(l, jax.Array) and not l.is_fully_addressable for l in leaves
    ):
        from jax.experimental import multihost_utils

        leaves = [
            multihost_utils.process_allgather(l, tiled=True)
            if isinstance(l, jax.Array) and not l.is_fully_addressable else l
            for l in leaves
        ]
    # leaves may live on device or already be numpy; only batch jax arrays
    out = [None] * len(leaves)
    by_dtype: dict = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array) and leaf.size > 0:
            by_dtype.setdefault(jnp.dtype(leaf.dtype).name, []).append(i)
        else:
            out[i] = np.asarray(leaf)
    if by_dtype:
        groups = [[leaves[i] for i in idxs] for idxs in by_dtype.values()]
        flats = _flatten_groups(groups)
        for idxs, flat in zip(by_dtype.values(), flats):
            host = np.asarray(flat)  # one D2H transfer per dtype
            off = 0
            for i in idxs:
                n = int(np.prod(leaves[i].shape, dtype=np.int64))
                out[i] = host[off:off + n].reshape(leaves[i].shape)
                off += n
    return jax.tree_util.tree_unflatten(treedef, out)


# One jitted program that ravels+concatenates every leaf group — a single
# device program and one output buffer per dtype, instead of per-leaf eager
# ops (each of which costs a host round trip). jit caches per structure.
_flatten_groups = jax.jit(
    lambda groups: [
        jnp.concatenate([l.reshape(-1) for l in g]) if len(g) > 1
        else g[0].reshape(-1)
        for g in groups
    ]
)
