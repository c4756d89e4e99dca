"""Gumbel-max sampler distribution check."""

import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.ops import sample_gumbel


def test_gumbel_max_matches_softmax_distribution():
    logits = jnp.asarray([2.0, 0.0, -1.0, 0.5])
    n = 20000
    key = jax.random.PRNGKey(0)
    actions, _ = sample_gumbel(key, jnp.broadcast_to(logits, (n, 4)))
    counts = np.bincount(np.asarray(actions), minlength=4) / n
    expected = np.asarray(jax.nn.softmax(logits))
    np.testing.assert_allclose(counts, expected, atol=0.02)


def test_sampler_is_deterministic_given_key():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(8, 5)))
    a1, k1 = sample_gumbel(jax.random.PRNGKey(123), logits)
    a2, k2 = sample_gumbel(jax.random.PRNGKey(123), logits)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert np.array_equal(np.asarray(k1), np.asarray(k2))
