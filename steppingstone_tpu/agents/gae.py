"""Generalized Advantage Estimation as a backward `lax.scan`.

Bit-matches the reference recurrence (`algorithms/storage.py:59-71`),
including the `bad_masks` time-limit bootstrapping: on a timeout boundary
the accumulated GAE is zeroed so return[t] collapses to V[t] (the
TimeLimitMask/bad_transition machinery of `envs_utils.py:59-65`).

Shapes use the reference layout: T steps, leading time axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jnp.ndarray,      # (T, N)
    values: jnp.ndarray,       # (T+1, N) — V of obs[0..T]
    masks: jnp.ndarray,        # (T+1, N) — 0 where episode ended *before* obs[t]
    bad_masks: jnp.ndarray,    # (T+1, N) — 0 where that end was a time limit
    gamma: float,
    lam: float,
):
    """Returns (returns (T, N), advantages (T, N)).

    advantages are the raw (unnormalized) `returns - values[:-1]`.
    """

    def step(gae, inp):
        r, v, v_next, mask_next, bad_next = inp
        delta = r + gamma * v_next * mask_next - v
        gae = delta + gamma * lam * mask_next * gae
        gae = gae * bad_next
        return gae, gae + v

    inputs = (rewards, values[:-1], values[1:], masks[1:], bad_masks[1:])
    _, returns = jax.lax.scan(
        step, jnp.zeros_like(rewards[0]), inputs, reverse=True
    )
    advantages = returns - values[:-1]
    return returns, advantages


def normalize_advantages(adv: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Reference `ppo.py:41-42`: global mean/std normalization."""
    return (adv - adv.mean()) / (adv.std() + eps)
