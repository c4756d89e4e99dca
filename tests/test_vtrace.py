"""V-trace vs an independent NumPy loop and on-policy reductions."""

import jax.numpy as jnp
import numpy as np

from cleanba_tpu.ops import compute_gae, vtrace_td_error_and_advantage
from cleanba_tpu.ops.vtrace import categorical_importance_ratios


def numpy_vtrace(v_tm1, v_t, r_t, discount_t, rho_tm1, lambda_, clip_rho, clip_pg_rho):
    """Per-trajectory loop implementation of Espeholt et al. 2018 eq. (1)."""
    T = len(r_t)
    c = np.minimum(1.0, rho_tm1) * lambda_
    clipped_rho = np.minimum(clip_rho, rho_tm1)
    deltas = clipped_rho * (r_t + discount_t * v_t - v_tm1)
    errors = np.zeros(T)
    acc = 0.0
    for t in reversed(range(T)):
        acc = deltas[t] + discount_t[t] * c[t] * acc
        errors[t] = acc
    vs = errors + v_tm1
    q_boot = np.concatenate([lambda_ * vs[1:] + (1 - lambda_) * v_tm1[1:], v_t[-1:]])
    q_est = r_t + discount_t * q_boot
    pg_adv = np.minimum(clip_pg_rho, rho_tm1) * (q_est - v_tm1)
    return errors, pg_adv, q_est


def test_vtrace_matches_numpy_reference():
    rng = np.random.default_rng(42)
    T, B = 19, 4
    v_tm1 = rng.normal(size=(T, B))
    v_t = rng.normal(size=(T, B))
    r_t = rng.normal(size=(T, B))
    discount_t = 0.99 * (rng.random((T, B)) > 0.1)
    rho_tm1 = np.exp(rng.normal(size=(T, B)) * 0.5)

    out = vtrace_td_error_and_advantage(
        jnp.asarray(v_tm1), jnp.asarray(v_t), jnp.asarray(r_t),
        jnp.asarray(discount_t), jnp.asarray(rho_tm1),
        lambda_=0.95, clip_rho_threshold=1.0, clip_pg_rho_threshold=1.0,
    )
    for b in range(B):
        err, pg, q = numpy_vtrace(
            v_tm1[:, b], v_t[:, b], r_t[:, b], discount_t[:, b], rho_tm1[:, b],
            0.95, 1.0, 1.0,
        )
        np.testing.assert_allclose(np.asarray(out.errors)[:, b], err, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.pg_advantage)[:, b], pg, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.q_estimate)[:, b], q, rtol=1e-5, atol=1e-6)


def test_vtrace_on_policy_equals_gae_lambda1():
    """With rho = c = 1 and lambda=1, vtrace errors are the GAE(lambda=1) advantages."""
    rng = np.random.default_rng(7)
    T, B = 12, 3
    values = rng.normal(size=(T, B))
    next_value = rng.normal(size=B)
    rewards = rng.normal(size=(T, B))
    dones = (rng.random((T, B)) < 0.2).astype(np.float64)
    next_done = np.zeros(B)

    dones_ext = np.concatenate([dones, next_done[None]], axis=0)
    values_ext = np.concatenate([values, next_value[None]], axis=0)
    discount_t = 0.99 * (1.0 - dones_ext[1:])

    out = vtrace_td_error_and_advantage(
        jnp.asarray(values), jnp.asarray(values_ext[1:]), jnp.asarray(rewards),
        jnp.asarray(discount_t), jnp.ones((T, B)), lambda_=1.0,
    )
    adv, _ = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(next_value), jnp.asarray(next_done), 0.99, 1.0,
    )
    np.testing.assert_allclose(np.asarray(out.errors), np.asarray(adv), rtol=1e-5, atol=1e-6)


def test_importance_ratios():
    rng = np.random.default_rng(3)
    pi = rng.normal(size=(5, 7))
    mu = rng.normal(size=(5, 7))
    a = rng.integers(0, 7, size=5)

    rho = np.asarray(categorical_importance_ratios(jnp.asarray(pi), jnp.asarray(mu), jnp.asarray(a)))
    softmax = lambda x: np.exp(x) / np.exp(x).sum(-1, keepdims=True)
    expected = softmax(pi)[np.arange(5), a] / softmax(mu)[np.arange(5), a]
    np.testing.assert_allclose(rho, expected, rtol=1e-5)
    # On-policy: all ratios are exactly 1.
    rho_same = np.asarray(categorical_importance_ratios(jnp.asarray(pi), jnp.asarray(pi), jnp.asarray(a)))
    np.testing.assert_allclose(rho_same, np.ones(5), rtol=1e-6)
