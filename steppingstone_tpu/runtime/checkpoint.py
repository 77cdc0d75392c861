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
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def save(self, tag: str, state: Any):
        """Save a pytree under `tag` (e.g. 'latest', 'best', '10000000')."""
        self._ckptr.save(self._path(tag), state, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, tag: str, target: Any | None = None) -> Any:
        """Restore; `target` provides the pytree structure/shapes."""
        if target is not None:
            return self._ckptr.restore(self._path(tag), target=target)
        return self._ckptr.restore(self._path(tag))

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self._path(tag))

    def tags(self):
        return sorted(os.listdir(self.directory)) if os.path.isdir(self.directory) else []


def host_pytree(tree):
    """Device -> host numpy copy of a pytree (for saving)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
