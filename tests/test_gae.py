"""GAE scan vs an independent NumPy reference and closed forms."""

import jax.numpy as jnp
import numpy as np

from cleanba_tpu.ops import compute_gae


def numpy_gae(rewards, values, dones, next_value, next_done, gamma, lam):
    """Straightforward reverse loop, written independently of the scan impl."""
    T, B = rewards.shape
    values_ext = np.concatenate([values, next_value[None]], axis=0)
    dones_ext = np.concatenate([dones, next_done[None]], axis=0)
    adv = np.zeros((T, B))
    last = np.zeros(B)
    for t in reversed(range(T)):
        nonterm = 1.0 - dones_ext[t + 1]
        delta = rewards[t] + gamma * values_ext[t + 1] * nonterm - values_ext[t]
        last = delta + gamma * lam * nonterm * last
        adv[t] = last
    return adv, adv + values


def test_gae_matches_numpy_reference():
    rng = np.random.default_rng(0)
    T, B = 17, 5
    rewards = rng.normal(size=(T, B))
    values = rng.normal(size=(T, B))
    dones = (rng.random((T, B)) < 0.15).astype(np.float64)
    next_value = rng.normal(size=B)
    next_done = (rng.random(B) < 0.15).astype(np.float64)

    adv_np, tgt_np = numpy_gae(rewards, values, dones, next_value, next_done, 0.99, 0.95)
    adv, tgt = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(next_value), jnp.asarray(next_done), 0.99, 0.95,
    )
    np.testing.assert_allclose(np.asarray(adv), adv_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tgt), tgt_np, rtol=1e-5, atol=1e-6)


def test_gae_constant_reward_no_termination_closed_form():
    # r=1, V=0, no dones, gamma=lam=1 -> A_t = T - t (remaining steps).
    T, B = 8, 3
    adv, tgt = compute_gae(
        jnp.ones((T, B)), jnp.zeros((T, B)), jnp.zeros((T, B)),
        jnp.zeros(B), jnp.zeros(B), 1.0, 1.0,
    )
    expected = np.arange(T, 0, -1)[:, None] * np.ones((1, B))
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tgt), expected, rtol=1e-6)


def test_gae_resets_at_episode_boundary():
    # A done at t+1 must cut the credit flowing back past t.
    T, B = 6, 1
    rewards = np.zeros((T, B)); rewards[-1] = 100.0
    dones = np.zeros((T, B)); dones[3] = 1.0  # episode boundary observed at t=3
    adv, _ = compute_gae(
        jnp.asarray(rewards), jnp.zeros((T, B)), jnp.asarray(dones),
        jnp.zeros(1), jnp.zeros(1), 0.99, 0.95,
    )
    # Steps 0..2 precede the boundary: no credit from the final reward.
    assert np.all(np.asarray(adv)[:3] == 0.0)
    assert np.asarray(adv)[-1, 0] == 100.0
