"""Policy / value networks.

Shapes mirror the reference checkpoints exactly (SURVEY.md §2.8):
- actor: obs -> 256 x5 -> act, softsign x3 + relu x2 + tanh out
  (reference `common/controller.py:217-261`)
- critic: obs -> 256 x4 -> 1, relu, orthogonal init, N-way ensemble
  `c0..cN` (reference `common/controller.py:71-95`)
- state-independent diagonal-Gaussian with a learned logstd bias,
  init -1.5, reset to -2.5 on fine-tune (reference `controller.py:20-33,102`)

Init matches the reference: torch-default (fan-in uniform) for the actor,
orthogonal(gain=sqrt(2)) for critics.

The 256-wide MLP stack is MXU-friendly as-is: six (B,256)x(256,256)
matmuls fuse into one XLA program; fp32 params with default matmul
precision (bf16 inputs gain nothing at this size on v4/v5e).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

HIDDEN = 256

# Exploration floor: the reference never clamps its learned logstd and its
# warm-start floor is -2.5 (`controller.py:102`); without a floor long runs
# can collapse exploration (observed: mean reward 1157 -> 277 at logstd
# ~ -2.9 late in a 2e8-frame run). Everything that *consumes* the logstd
# param goes through `clamped_logstd`.
LOGSTD_MIN = -3.0


def clamped_logstd(params):
    """The policy's logstd param with the exploration floor applied.

    Straight-through clamp: the *value* is floored at LOGSTD_MIN but the
    gradient passes through unscaled, so a parameter that has been driven
    below the floor still receives gradient from every consumer and can
    recover if the objective later favors more exploration (a plain
    `jnp.maximum` zeroes the gradient below the floor and pins entropy
    permanently). `ppo_update` additionally projects the raw parameter
    back to >= LOGSTD_MIN after each optimizer step so it cannot sink
    arbitrarily far while clamped."""
    raw = params["params"]["logstd"]
    return raw + jax.lax.stop_gradient(jnp.maximum(raw, LOGSTD_MIN) - raw)


def project_logstd(params):
    """Clip the raw logstd param to >= LOGSTD_MIN (post-optimizer-step
    projection; see `clamped_logstd`)."""
    flat = dict(params["params"])
    flat["logstd"] = jnp.maximum(flat["logstd"], LOGSTD_MIN)
    return {**params, "params": flat}


def reinflate_logstd(params, value: float):
    """Raise exploration noise to at least `value` (per-dim max) — used on
    curriculum level advances. The reference's analog is the warm-start
    `reset_dist` to -2.5 (`common/controller.py:102-104`); on-advance
    re-inflation restores exploration that the previous level's
    convergence consumed, so the harder level is actually explored."""
    flat = dict(params["params"])
    flat["logstd"] = jnp.maximum(flat["logstd"], value)
    return {**params, "params": flat}


def cap_logstd(params, value: float):
    """Cap exploration noise at `value` (per-dim min) — the late-run
    deterministic-gait anneal: a policy whose stochastic return is carried
    by exploration noise (round-4 Cassie: training test ~2900 at level 0
    but 93% deterministic falls, reports/behavior_r4_cassie.json) is
    forced toward its mean action as the cap descends, so PPO's objective
    converges to the DETERMINISTIC behavior the evals measure. Keep the
    cap above LOGSTD_MIN."""
    flat = dict(params["params"])
    flat["logstd"] = jnp.minimum(flat["logstd"], value)
    return {**params, "params": flat}


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """Dense layer with torch-default initialization."""

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init, (fan_in, self.features))
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        return x @ kernel + bias


class SoftsignActor(nn.Module):
    """Reference `SoftsignActor` (controller.py:217): 6-layer 256 MLP."""

    action_dim: int

    @nn.compact
    def __call__(self, x):
        for _ in range(3):
            x = nn.soft_sign(TorchDense(HIDDEN)(x))
        for _ in range(2):
            x = nn.relu(TorchDense(HIDDEN)(x))
        return nn.tanh(TorchDense(self.action_dim)(x))


class Critic(nn.Module):
    """Reference critic (controller.py:71-95): 5-layer 256 relu MLP,
    orthogonal(sqrt(2)) weights, zero bias."""

    @nn.compact
    def __call__(self, x):
        dense = lambda f: nn.Dense(
            f,
            kernel_init=nn.initializers.orthogonal(jnp.sqrt(2.0)),
            bias_init=nn.initializers.zeros_init(),
        )
        for _ in range(4):
            x = nn.relu(dense(HIDDEN)(x))
        return dense(1)(x)


class ActorCritic(nn.Module):
    """Reference `Policy` (controller.py:55): actor + critic ensemble +
    state-independent logstd."""

    action_dim: int
    num_ensembles: int = 1
    logstd_init: float = -1.5

    def setup(self):
        self.actor = SoftsignActor(self.action_dim)
        self.critics = [Critic(name=f"c{i}") for i in range(self.num_ensembles)]
        self.logstd = self.param(
            "logstd",
            lambda key, shape: jnp.full(shape, self.logstd_init),
            (self.action_dim,),
        )

    def __call__(self, obs):
        """(mean, logstd, value) — used for init/inspection."""
        return self.action_mean(obs), self.logstd, self.value(obs)

    def action_mean(self, obs):
        return self.actor(obs)

    def ensemble_values(self, obs):
        """(..., num_ensembles) — reference `get_ensemble_values`."""
        return jnp.concatenate([c(obs) for c in self.critics], axis=-1)

    def value(self, obs):
        """(..., 1) ensemble mean — reference `get_value`."""
        return jnp.mean(self.ensemble_values(obs), axis=-1, keepdims=True)


def reset_logstd(params, value: float = -2.5):
    """Reference `Policy.reset_dist` (controller.py:102): shrink exploration
    noise when fine-tuning from a pretrained controller."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    flat = dict(params["params"])
    flat["logstd"] = jnp.full_like(flat["logstd"], value)
    return {**params, "params": flat}
