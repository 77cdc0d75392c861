"""PPO learner as one compiled update.

Re-design of the reference learner (`algorithms/ppo.py:40-108`): clipped
surrogate + (optionally clipped) value loss over the critic ensemble,
`ppo_epoch` x `num_mini_batch` Adam steps with global-norm clipping,
optional mirror-augmented minibatches, and the value-only update variant
(`ppo.py:111`). Differences from the torch original, by design:

- The epoch/minibatch loops are `lax.scan`s inside a single jit — the
  whole update is one XLA program per iteration (no per-minibatch python).
- Minibatches are equal-sized (batch // num_mini_batch, remainder dropped)
  so shapes are static; the reference's last ragged minibatch of
  `BatchSampler(drop_last=False)` is the only behavioral delta.
- The learning rate is an *argument* (donated scalar), so the LR schedule
  never retraces (reference re-sets optimizer lr per update,
  `train.py:213-220`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from steppingstone_tpu.agents import distributions as dist
from steppingstone_tpu.agents.mirror import MirrorSpec, mirror_minibatch


@dataclasses.dataclass(frozen=True, eq=False)
class PPOConfig:
    """Static PPO hyperparameters (reference `train.py:77-87`)."""

    clip_param: float = 0.2
    ppo_epoch: int = 10
    num_mini_batch: int = 39
    value_loss_coef: float = 1.0
    entropy_coef: float = 0.0
    max_grad_norm: float = 2.0
    eps: float = 1e-5
    use_clipped_value_loss: bool = False
    mirror: Optional[MirrorSpec] = None
    # Approximate-KL trust guard: when > 0, a minibatch whose mean
    # approx KL (old_logp - new_logp) exceeds the cutoff applies NO
    # parameter update (the compiled-scan analog of early stopping).
    # Plain PPO clipping does not bound total policy drift over the
    # epoch*minibatch scan: a warm-started gait was destroyed by ONE
    # 4000-step update (runs/r4_mike_warmfail3: mean 784 -> 75).
    kl_cutoff: float = 0.0


class PPOMetrics(NamedTuple):
    value_loss: jnp.ndarray
    action_loss: jnp.ndarray
    dist_entropy: jnp.ndarray
    grad_norm: jnp.ndarray
    clip_frac: jnp.ndarray
    approx_kl: jnp.ndarray


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    """clip-by-global-norm + Adam *direction*; the step size is applied
    manually so the LR can be a traced argument."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.scale_by_adam(eps=cfg.eps),
    )


def _losses(apply_fn, params, cfg: PPOConfig, mb):
    from steppingstone_tpu.agents.networks import clamped_logstd

    mean = apply_fn(params, mb["obs"], method="action_mean")
    logstd = clamped_logstd(params)
    values = apply_fn(params, mb["obs"], method="ensemble_values")  # (B, E)

    log_probs = dist.log_prob(mean, logstd, mb["actions"])          # (B, 1)
    entropy = jnp.mean(dist.entropy(jnp.broadcast_to(logstd, mean.shape)))

    # approx KL for the trust guard: with mirror augmentation the
    # SECOND half of the minibatch are mirrored rows carrying the
    # ORIGINAL rows' log_probs (the asymmetry-regularizing surrogate of
    # the reference mirror loss), so only the first (original) half
    # measures actual policy drift — including the mirrored half froze a
    # run permanently once asymmetry alone exceeded the cutoff
    # (runs/r4_mike: entropy pinned at -5.90 for 480 updates)
    n_orig = log_probs.shape[0] // 2 if cfg.mirror is not None else log_probs.shape[0]
    approx_kl = jnp.mean(mb["log_probs"][:n_orig] - log_probs[:n_orig])
    ratio = jnp.exp(log_probs - mb["log_probs"])
    surr1 = ratio * mb["adv"]
    surr2 = jnp.clip(ratio, 1.0 - cfg.clip_param, 1.0 + cfg.clip_param) * mb["adv"]
    action_loss = -jnp.mean(jnp.minimum(surr1, surr2))
    clip_frac = jnp.mean((jnp.abs(ratio - 1.0) > cfg.clip_param).astype(jnp.float32))

    # value loss over the ensemble, broadcasting the shared target
    # (reference `evaluate_actions` returns all ensemble heads, ppo.py:63,85)
    if cfg.use_clipped_value_loss:
        v_clip = mb["values"] + jnp.clip(
            values - mb["values"], -cfg.clip_param, cfg.clip_param
        )
        vl = jnp.square(values - mb["returns"])
        vl_c = jnp.square(v_clip - mb["returns"])
        value_loss = 0.5 * jnp.mean(jnp.maximum(vl, vl_c))
    else:
        value_loss = 0.5 * jnp.mean(jnp.square(mb["returns"] - values))

    return action_loss, value_loss, entropy, clip_frac, approx_kl


def _minibatch_step(apply_fn, tx, cfg: PPOConfig, value_only: bool):
    def step(carry, mb):
        params, opt_state, lr = carry
        if cfg.mirror is not None:
            mb = mirror_minibatch(cfg.mirror, mb)

        def loss_fn(p):
            action_loss, value_loss, entropy, clip_frac, approx_kl = _losses(
                apply_fn, p, cfg, mb
            )
            if value_only:
                total = value_loss * cfg.value_loss_coef
            else:
                total = (
                    value_loss * cfg.value_loss_coef
                    + action_loss
                    - entropy * cfg.entropy_coef
                )
            return total, (value_loss, action_loss, entropy, clip_frac, approx_kl)

        grads, (value_loss, action_loss, entropy, clip_frac, approx_kl) = jax.grad(
            loss_fn, has_aux=True
        )(params)
        gnorm = optax.global_norm(grads)
        step_lr = lr
        if cfg.kl_cutoff > 0.0 and not value_only:
            # trust guard: drifted-too-far minibatches apply no update
            # (Adam moments still advance; the scan stays shape-static)
            step_lr = jnp.where(approx_kl > cfg.kl_cutoff, 0.0, lr)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p - step_lr * u, params, updates
        )
        from steppingstone_tpu.agents.networks import project_logstd

        params = project_logstd(params)
        metrics = PPOMetrics(
            value_loss, action_loss, entropy, gnorm, clip_frac, approx_kl
        )
        return (params, opt_state, lr), metrics

    return step


def ppo_update(
    apply_fn,
    tx: optax.GradientTransformation,
    cfg: PPOConfig,
    params,
    opt_state,
    batch: dict,
    key: jax.Array,
    lr: jnp.ndarray,
    value_only: bool = False,
):
    """Run `ppo_epoch` epochs of shuffled minibatch SGD over `batch`.

    batch: dict of (B, ·) arrays — obs, actions, values (B, 1), returns,
    log_probs, adv. Returns (params, opt_state, PPOMetrics-averages).
    """
    B = batch["obs"].shape[0]
    mbs = B // cfg.num_mini_batch
    used = mbs * cfg.num_mini_batch
    step = _minibatch_step(apply_fn, tx, cfg, value_only)

    def epoch(carry, ekey):
        perm = jax.random.permutation(ekey, B)[:used]
        mbatches = jax.tree_util.tree_map(
            lambda x: x[perm].reshape(cfg.num_mini_batch, mbs, *x.shape[1:]), batch
        )
        carry, metrics = jax.lax.scan(step, carry, mbatches)
        return carry, metrics

    keys = jax.random.split(key, cfg.ppo_epoch)
    (params, opt_state, _), metrics = jax.lax.scan(
        epoch, (params, opt_state, lr), keys
    )
    mean_metrics = jax.tree_util.tree_map(jnp.mean, metrics)
    return params, opt_state, mean_metrics
