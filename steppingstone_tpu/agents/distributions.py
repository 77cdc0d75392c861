"""Diagonal Gaussian policy distribution.

Matches the reference's monkey-patched `FixedNormal` semantics
(`common/controller.py:7-17`): log_probs sums over the action axis
(keepdim), entropy sums over the action axis, mode = mean.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# python float, not a jnp array: module import must not initialize the XLA
# backend (jax.distributed.initialize for multi-host runs comes later)
LOG_2PI = math.log(2.0 * math.pi)


def sample(key, mean, logstd):
    return mean + jnp.exp(logstd) * jax.random.normal(key, mean.shape, mean.dtype)


def log_prob(mean, logstd, actions):
    """Summed over the action axis, keepdims — reference `log_probs`."""
    var = jnp.exp(2.0 * logstd)
    lp = -0.5 * ((actions - mean) ** 2 / var + 2.0 * logstd + LOG_2PI)
    return jnp.sum(lp, axis=-1, keepdims=True)


def entropy(logstd, action_dim=None):
    """Summed over the action axis — reference `entropy`."""
    return jnp.sum(logstd + 0.5 * (LOG_2PI + 1.0), axis=-1)


def mode(mean):
    return mean
