"""Mirror-symmetry batch augmentation.

Pure-array re-design of the reference's `get_mirror_function`
(`common/envs_utils.py:687-740`): negate the sign-flipping indices, swap
left/right index blocks, and stack the mirrored copies onto the minibatch
(observations/actions mirrored; everything else repeated).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class MirrorSpec(NamedTuple):
    neg_obs: np.ndarray
    right_obs: np.ndarray
    left_obs: np.ndarray
    neg_act: np.ndarray
    right_act: np.ndarray
    left_act: np.ndarray

    @staticmethod
    def from_env(env) -> "MirrorSpec":
        return MirrorSpec(*env.get_mirror_indices())


def _mirror_array(x: jnp.ndarray, neg, right, left) -> jnp.ndarray:
    """Apply sign flips + L/R swap along the last axis (static indices)."""
    sign = np.ones(x.shape[-1], dtype=np.float32)
    sign[neg] = -1.0
    perm = np.arange(x.shape[-1])
    perm[np.concatenate([right, left])] = perm[np.concatenate([left, right])]
    return x[..., perm] * jnp.asarray(sign)


def mirror_obs(spec: MirrorSpec, obs: jnp.ndarray) -> jnp.ndarray:
    return _mirror_array(obs, spec.neg_obs, spec.right_obs, spec.left_obs)


def mirror_act(spec: MirrorSpec, act: jnp.ndarray) -> jnp.ndarray:
    return _mirror_array(act, spec.neg_act, spec.right_act, spec.left_act)


def mirror_minibatch(spec: MirrorSpec, mb: dict) -> dict:
    """Double a PPO minibatch with its mirror image (reference
    `mirror_function`: obs/actions mirrored, the rest repeated)."""
    out = {}
    for k, v in mb.items():
        if k == "obs":
            out[k] = jnp.concatenate([v, mirror_obs(spec, v)], axis=0)
        elif k == "actions":
            out[k] = jnp.concatenate([v, mirror_act(spec, v)], axis=0)
        else:
            out[k] = jnp.concatenate([v, v], axis=0)
    return out
