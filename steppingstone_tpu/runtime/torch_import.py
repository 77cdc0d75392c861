"""Import reference PyTorch checkpoints into flax params.

The reference ships whole pickled `Policy` modules (SURVEY.md §2.8;
`playground/models/*.pt`, saved by `torch.save(actor_critic, ...)`
`train.py:557`). Their class definitions live in the reference repo, so we
unpickle with stub classes (generic `nn.Module` subclasses created on the
fly) — no reference code is imported or copied — and then map the state
dict onto our `ActorCritic` parameter tree:

    actor.fc1..fc5,out      -> params/actor/TorchDense_0..5 (kernel = W^T)
    c{i}.0,2,4,6,8          -> params/c{i}/Dense_0..4
    critic.* (legacy attr)  -> params/c0 (reference fallback
                               `controller.py:127-128`)
    dist.logstd._bias (A,1) -> params/logstd (A,)
"""

from __future__ import annotations

import io
import pickle

import jax.numpy as jnp
import numpy as np


def _load_torch_module_state(path: str) -> dict:
    import torch

    class _StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith(("common.", "playground.", "algorithms.", "mocca_envs")):
                # fabricate an empty nn.Module subclass; unpickling restores
                # its __dict__ (incl. _parameters/_modules) so state_dict()
                # works without the original source
                return type(name, (torch.nn.Module,), {})
            return super().find_class(module, name)

    with open(path, "rb") as f:
        data = f.read()
    # torch >= 2.x zipfile format: let torch handle storage loading but
    # inject our unpickler
    try:
        obj = torch.load(
            io.BytesIO(data), map_location="cpu", weights_only=False,
            pickle_module=_PickleShim(_StubUnpickler),
        )
    except TypeError:
        obj = torch.load(io.BytesIO(data), map_location="cpu",
                         pickle_module=_PickleShim(_StubUnpickler))
    return {k: v.detach().cpu().numpy() for k, v in obj.state_dict().items()}


class _PickleShim:
    """Minimal pickle-module shim exposing the custom Unpickler to
    torch.load."""

    __name__ = "pickle"

    def __init__(self, unpickler_cls):
        self.Unpickler = unpickler_cls
        self.load = pickle.load
        self.loads = pickle.loads
        self.__version__ = pickle.format_version


def torch_state_to_flax(
    sd: dict, action_dim: int, num_ensembles: int | None = None
) -> dict:
    """Map a reference Policy state_dict to our ActorCritic param tree."""
    p: dict = {}

    # ---- actor ------------------------------------------------------
    actor = {}
    order = ["fc1", "fc2", "fc3", "fc4", "fc5", "out"]
    for i, layer in enumerate(order):
        w = sd[f"actor.{layer}.weight"]
        b = sd[f"actor.{layer}.bias"]
        actor[f"TorchDense_{i}"] = {
            "kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)
        }
    p["actor"] = actor

    # ---- critics ----------------------------------------------------
    def critic_tree(prefix):
        tree = {}
        seq_ids = [0, 2, 4, 6, 8]
        for j, sid in enumerate(seq_ids):
            w = sd[f"{prefix}.{sid}.weight"]
            b = sd[f"{prefix}.{sid}.bias"]
            tree[f"Dense_{j}"] = {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}
        return tree

    ens = [k.split(".")[0] for k in sd if k[0] == "c" and k[1].isdigit()]
    ens_names = sorted(set(ens))
    if ens_names:
        for name in ens_names:
            p[name] = critic_tree(name)
    elif any(k.startswith("critic.") for k in sd):
        # legacy single-critic checkpoints (controller.py:127-128)
        p["c0"] = critic_tree("critic")
        ens_names = ["c0"]
    if num_ensembles is not None:
        assert len(ens_names) == num_ensembles, (ens_names, num_ensembles)

    # ---- logstd -----------------------------------------------------
    logstd = sd["dist.logstd._bias"].reshape(-1)
    assert logstd.shape == (action_dim,), logstd.shape
    p["logstd"] = jnp.asarray(logstd)

    return {"params": p}


def load_reference_checkpoint(path: str, action_dim: int) -> tuple[dict, int]:
    """Load a reference .pt into flax params. Returns (params, n_critics)."""
    sd = _load_torch_module_state(path)
    names = {k.split(".")[0] for k in sd}
    n_critics = len([n for n in names if n[0] == "c" and n[1:].isdigit()])
    if n_critics == 0 and "critic" in names:
        n_critics = 1
    params = torch_state_to_flax(sd, action_dim)
    return params, n_critics
