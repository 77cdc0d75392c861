"""Agent tests: GAE vs the reference recurrence (`storage.py:59-71`),
network shapes vs checkpoint oracle (SURVEY.md §2.8), PPO update sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from steppingstone_tpu.agents import distributions as dist
from steppingstone_tpu.agents.gae import compute_gae, normalize_advantages
from steppingstone_tpu.agents.networks import ActorCritic, reset_logstd
from steppingstone_tpu.agents.ppo import PPOConfig, make_optimizer, ppo_update


def reference_gae(rewards, values, masks, bad_masks, gamma, lam):
    """Direct transcription of the reference recurrence semantics
    (algorithms/storage.py:59-71) in numpy."""
    T, N = rewards.shape
    returns = np.zeros((T, N))
    gae = np.zeros(N)
    for t in reversed(range(T)):
        delta = rewards[t] + gamma * values[t + 1] * masks[t + 1] - values[t]
        gae = delta + gamma * lam * masks[t + 1] * gae
        gae = gae * bad_masks[t + 1]
        returns[t] = gae + values[t]
    return returns


def test_gae_matches_reference_recurrence():
    rng = np.random.RandomState(0)
    T, N = 20, 5
    rewards = rng.randn(T, N).astype(np.float32)
    values = rng.randn(T + 1, N).astype(np.float32)
    masks = (rng.rand(T + 1, N) > 0.2).astype(np.float32)
    bad = np.where((rng.rand(T + 1, N) > 0.9) & (masks == 0), 0.0, 1.0).astype(np.float32)
    want = reference_gae(rewards, values, masks, bad, 0.99, 0.95)
    got, adv = jax.jit(compute_gae, static_argnums=(4, 5))(
        rewards, values, masks, bad, 0.99, 0.95
    )
    assert np.allclose(got, want, atol=1e-4)
    assert np.allclose(adv, want - values[:-1], atol=1e-4)


def test_gae_timeout_bootstraps_to_value():
    """bad_mask=0 at t+1 must collapse return[t] to value[t]."""
    T, N = 4, 1
    rewards = np.ones((T, N), np.float32)
    values = np.full((T + 1, N), 7.0, np.float32)
    masks = np.ones((T + 1, N), np.float32)
    bad = np.ones((T + 1, N), np.float32)
    masks[2] = 0.0  # episode ended entering t=2
    bad[2] = 0.0    # ... due to a time limit
    ret, _ = compute_gae(rewards, values, masks, bad, 0.99, 0.95)
    assert np.allclose(ret[1], values[1])  # pure bootstrap


@pytest.fixture(scope="module")
def net_and_params():
    net = ActorCritic(action_dim=21, num_ensembles=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 60)))
    return net, params


def test_network_shapes_match_checkpoint_oracle(net_and_params):
    net, params = net_and_params
    p = params["params"]
    # actor: 60 -> 256 x5 -> 21 (SURVEY §2.8)
    actor_layers = p["actor"]
    dims = [(60, 256), (256, 256), (256, 256), (256, 256), (256, 256), (256, 21)]
    keys = sorted(actor_layers.keys(), key=lambda s: int(s.split("_")[-1]))
    for k, d in zip(keys, dims):
        assert actor_layers[k]["kernel"].shape == d
    # critics c0, c1: 60 -> 256 x4 -> 1
    for c in ("c0", "c1"):
        ck = sorted(p[c].keys(), key=lambda s: int(s.split("_")[-1]))
        cd = [(60, 256), (256, 256), (256, 256), (256, 256), (256, 1)]
        for k, d in zip(ck, cd):
            assert p[c][k]["kernel"].shape == d
    assert p["logstd"].shape == (21,)
    assert np.allclose(p["logstd"], -1.5)


def test_forward_shapes_and_tanh_bound(net_and_params):
    net, params = net_and_params
    obs = jax.random.normal(jax.random.PRNGKey(1), (17, 60))
    mean = jax.jit(lambda p, o: net.apply(p, o, method="action_mean"))(params, obs)
    assert mean.shape == (17, 21)
    assert (np.abs(np.asarray(mean)) <= 1.0).all()
    ev = net.apply(params, obs, method="ensemble_values")
    assert ev.shape == (17, 2)
    v = net.apply(params, obs, method="value")
    assert v.shape == (17, 1)
    assert np.allclose(np.asarray(v), np.asarray(ev).mean(-1, keepdims=True), atol=1e-6)


def test_reset_logstd(net_and_params):
    net, params = net_and_params
    p2 = reset_logstd(params)
    assert np.allclose(p2["params"]["logstd"], -2.5)
    assert np.allclose(params["params"]["logstd"], -1.5)  # original untouched


def test_diag_gaussian_matches_scipy():
    from scipy import stats as sps

    mean = np.array([[0.3, -0.7]], np.float32)
    logstd = np.array([[-1.5, -0.5]], np.float32)
    a = np.array([[0.5, -0.2]], np.float32)
    lp = dist.log_prob(jnp.asarray(mean), jnp.asarray(logstd), jnp.asarray(a))
    want = sps.norm.logpdf(a, mean, np.exp(logstd)).sum(-1, keepdims=True)
    assert np.allclose(lp, want, atol=1e-5)
    ent = dist.entropy(jnp.asarray(logstd))
    want_ent = sps.norm.entropy(mean, np.exp(logstd)).sum(-1)
    assert np.allclose(ent, want_ent, atol=1e-5)


def test_ppo_update_improves_surrogate():
    """A few PPO steps on a fixed synthetic batch should reduce the loss
    and move action means toward positive-advantage actions."""
    net = ActorCritic(action_dim=4, num_ensembles=1)
    key = jax.random.PRNGKey(0)
    B, D = 256, 12
    obs = jax.random.normal(key, (B, D))
    params = net.init(key, obs[:1])

    mean0, logstd0 = net.apply(params, obs, method="action_mean"), params["params"]["logstd"]
    k_act = jax.random.PRNGKey(1)
    actions = dist.sample(k_act, mean0, jnp.broadcast_to(logstd0, mean0.shape))
    log_probs = dist.log_prob(mean0, jnp.broadcast_to(logstd0, mean0.shape), actions)
    # learnable signal: advantage is positive iff the sampled action moved
    # in the direction of obs[0] on action dim 0 (so the policy can encode
    # "mean[0] should follow sign(obs[0])")
    target_dir = jnp.sign(obs[:, :1])
    adv = jnp.sign((actions[:, :1] - mean0[:, :1]) * target_dir)
    returns = jax.random.normal(jax.random.PRNGKey(2), (B, 1))
    batch = dict(
        obs=obs, actions=actions, log_probs=log_probs,
        values=net.apply(params, obs, method="value"),
        returns=returns, adv=adv,
    )
    cfg = PPOConfig(ppo_epoch=10, num_mini_batch=4)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    upd = jax.jit(
        lambda p, o, b, k: ppo_update(
            net.apply, tx, cfg, p, o, b, k, jnp.asarray(1e-3)
        )
    )
    new_params, _, metrics = upd(params, opt_state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics.value_loss))
    assert np.isfinite(float(metrics.action_loss))
    # value heads should have moved toward the targets
    v_old = np.mean((np.asarray(batch["values"]) - np.asarray(returns)) ** 2)
    v_new = np.mean(
        (np.asarray(net.apply(new_params, obs, method="value")) - np.asarray(returns)) ** 2
    )
    assert v_new < v_old
    # policy mean[0] moves in the direction of sign(obs[0])
    mean1 = net.apply(new_params, obs, method="action_mean")
    shift = np.mean(np.asarray((mean1 - mean0)[:, 0]) * np.asarray(target_dir[:, 0]))
    assert shift > 0, shift


def test_ppo_value_only_update_freezes_actor():
    net = ActorCritic(action_dim=3, num_ensembles=1)
    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (64, 8))
    params = net.init(key, obs[:1])
    mean0 = net.apply(params, obs, method="action_mean")
    logstd = jnp.broadcast_to(params["params"]["logstd"], mean0.shape)
    actions = dist.sample(jax.random.PRNGKey(1), mean0, logstd)
    batch = dict(
        obs=obs, actions=actions,
        log_probs=dist.log_prob(mean0, logstd, actions),
        values=net.apply(params, obs, method="value"),
        returns=jnp.ones((64, 1)), adv=jnp.ones((64, 1)),
    )
    cfg = PPOConfig(ppo_epoch=2, num_mini_batch=2)
    tx = make_optimizer(cfg)
    new_params, _, m = jax.jit(
        lambda p, o, b, k: ppo_update(
            net.apply, tx, cfg, p, o, b, k, jnp.asarray(1e-3), value_only=True
        )
    )(params, tx.init(params), batch, jax.random.PRNGKey(2))
    # actor untouched, critic moved
    a0 = params["params"]["actor"]
    a1 = new_params["params"]["actor"]
    jax.tree_util.tree_map(lambda x, y: np.testing.assert_allclose(x, y), a0, a1)
    c0 = jax.tree_util.tree_leaves(params["params"]["c0"])
    c1 = jax.tree_util.tree_leaves(new_params["params"]["c0"])
    assert any(not np.allclose(x, y) for x, y in zip(c0, c1))
