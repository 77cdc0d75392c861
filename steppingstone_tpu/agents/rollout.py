"""On-device rollout collection: `lax.scan` over control steps.

Replaces the reference's host-side rollout hot loop
(`playground/train.py:363-469`): policy act + env step + storage insert
become one scanned, jit-compiled program over the whole (T, N) batch, with
episode bookkeeping carried on device (the Monitor/deque machinery of
`envs_utils.py:71-194` reduced to a per-env "last completed episode" slot).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from steppingstone_tpu.agents import distributions as dist


class Transition(NamedTuple):
    """One time-slice of rollout storage (leading axis T after scan) —
    the reference's RolloutStorage rows (`algorithms/storage.py:6-15`)."""

    obs: jnp.ndarray        # (N, D) obs at t (input to the policy)
    actions: jnp.ndarray    # (N, A)
    log_probs: jnp.ndarray  # (N, 1)
    values: jnp.ndarray     # (N, 1)
    rewards: jnp.ndarray    # (N,)
    masks: jnp.ndarray      # (N,) 0 if episode ended at t+1 (reference masks)
    bad_masks: jnp.ndarray  # (N,) 0 if that end was a time limit


class EpisodeStats(NamedTuple):
    """Per-env last-completed-episode slots — the on-device analog of the
    reference's `deque(maxlen=num_processes)` of Monitor episode returns
    (`train.py:194,454`)."""

    ret: jnp.ndarray    # (N,) return of the most recent completed episode
    length: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,) bool — env has completed >= 1 episode

    @staticmethod
    def init(n: int) -> "EpisodeStats":
        return EpisodeStats(
            ret=jnp.zeros(n), length=jnp.zeros(n, jnp.int32),
            valid=jnp.zeros(n, bool),
        )

    def update(self, done, ep_return, ep_len) -> "EpisodeStats":
        return EpisodeStats(
            ret=jnp.where(done, ep_return, self.ret),
            length=jnp.where(done, ep_len, self.length),
            valid=self.valid | done,
        )


def policy_action(apply_fn, params, obs, key, deterministic: bool):
    from steppingstone_tpu.agents.networks import clamped_logstd

    mean = apply_fn(params, obs, method="action_mean")
    logstd = jnp.broadcast_to(clamped_logstd(params), mean.shape)
    if deterministic:
        action = mean
    else:
        action = dist.sample(key, mean, logstd)
    log_p = dist.log_prob(mean, logstd, action)
    return action, log_p


def collect_rollout(
    step_env: Callable,
    apply_fn: Callable,
    params,
    env_state,
    obs: jnp.ndarray,
    stats: EpisodeStats,
    key: jax.Array,
    num_steps: int,
    deterministic: bool = False,
):
    """Scan T control steps. Returns
    (env_state, last_obs, stats, Transition stacked over T, hit_count)."""

    def body(carry, _):
        env_state, obs, stats, key = carry
        key, k_act = jax.random.split(key)
        action, log_p = policy_action(apply_fn, params, obs, k_act, deterministic)
        value = apply_fn(params, obs, method="value")
        env_state, out = step_env(env_state, action)
        stats = stats.update(out.done, out.ep_return, out.ep_len)
        tr = Transition(
            obs=obs,
            actions=action,
            log_probs=log_p,
            values=value,
            rewards=out.reward,
            masks=1.0 - out.done.astype(jnp.float32),
            bad_masks=1.0 - out.timeout.astype(jnp.float32),
        )
        ep = (out.done, out.ep_return, out.ep_len)
        return (env_state, out.obs, stats, key), (tr, out.hit, ep)

    (env_state, obs, stats, _), (traj, hits, episodes) = jax.lax.scan(
        body, (env_state, obs, stats, key), None, length=num_steps
    )
    aux = dict(
        hits=jnp.sum(hits),
        ep_done=episodes[0],     # (T, N) — for Monitor-style episode logs
        ep_return=episodes[1],
        ep_len=episodes[2],
    )
    return env_state, obs, stats, traj, aux


def evaluate(
    step_env: Callable,
    apply_fn: Callable,
    params,
    env_state,
    obs: jnp.ndarray,
    key: jax.Array,
    num_steps: int,
):
    """Deterministic test-fleet rollout (reference `train.py:472-500`):
    run `num_steps` (= `_max_episode_steps`) steps and report stats over
    the episodes that completed."""
    stats = EpisodeStats.init(obs.shape[0])
    env_state, obs, stats, _, _aux = collect_rollout(
        step_env, apply_fn, params, env_state, obs, stats, key,
        num_steps, deterministic=True,
    )
    return env_state, obs, stats
