"""Loss-function unit tests against closed forms and gradient-direction checks."""

import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.ops import (
    impala_loss_from_outputs,
    log_softmax_gather,
    ppo_loss_from_outputs,
    softmax_entropy,
)


def test_entropy_uniform_is_log_a():
    logits = jnp.zeros((4, 6))
    np.testing.assert_allclose(np.asarray(softmax_entropy(logits)), np.log(6), rtol=1e-4)


def test_log_softmax_gather():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(5, 3))
    a = rng.integers(0, 3, size=5)
    got = np.asarray(log_softmax_gather(jnp.asarray(logits), jnp.asarray(a)))
    lse = np.log(np.exp(logits).sum(-1))
    np.testing.assert_allclose(got, logits[np.arange(5), a] - lse, rtol=1e-4, atol=1e-4)


def test_ppo_loss_zero_advantage_on_policy():
    """On-policy with zero advantages: pg term is 0, kl is 0."""
    rng = np.random.default_rng(1)
    N, A = 16, 4
    logits = jnp.asarray(rng.normal(size=(N, A)))
    actions = jnp.asarray(rng.integers(0, A, size=N))
    behavior_logprobs = log_softmax_gather(logits, actions)
    values = jnp.asarray(rng.normal(size=N))

    loss, aux = ppo_loss_from_outputs(
        logits, values, actions, behavior_logprobs,
        advantages=jnp.zeros(N), target_values=values,
        clip_coef=0.1, ent_coef=0.0, vf_coef=0.5,
    )
    assert abs(float(aux.pg_loss)) < 1e-6
    assert abs(float(aux.v_loss)) < 1e-6
    assert abs(float(aux.approx_kl)) < 1e-6


def test_ppo_clip_is_active():
    """A large ratio must be clipped: loss equals the clipped branch."""
    N, A = 1, 2
    logits = jnp.asarray([[5.0, -5.0]])
    actions = jnp.asarray([0])
    # pretend behaviour logprob was much lower -> big ratio
    behavior_logprobs = jnp.asarray([-3.0])
    adv = jnp.asarray([1.0])
    loss, aux = ppo_loss_from_outputs(
        logits, jnp.zeros(N), actions, behavior_logprobs, adv, jnp.zeros(N),
        clip_coef=0.1, ent_coef=0.0, vf_coef=0.0,
    )
    # clipped: -adv * (1 + clip) = -1.1
    np.testing.assert_allclose(float(aux.pg_loss), -1.1, rtol=1e-5)


def test_ppo_entropy_gradient_increases_entropy():
    """Entropy bonus should push logits toward uniform."""
    logits0 = jnp.asarray([[2.0, -2.0, 0.0]])

    def loss_fn(logits):
        loss, _ = ppo_loss_from_outputs(
            logits, jnp.zeros(1), jnp.asarray([0]), jnp.asarray([0.0]),
            jnp.zeros(1), jnp.zeros(1), clip_coef=0.1, ent_coef=1.0, vf_coef=0.0,
        )
        return loss

    g = jax.grad(loss_fn)(logits0)
    stepped = logits0 - 0.1 * g
    assert float(softmax_entropy(stepped)[0]) > float(softmax_entropy(logits0)[0])


def test_impala_loss_masks_firststeps_and_bootstrap():
    """firststep-masked transitions contribute nothing to the loss."""
    rng = np.random.default_rng(2)
    T, B, A = 6, 3, 4
    pi = jnp.asarray(rng.normal(size=(T + 1, B, A)))
    mu = jnp.asarray(rng.normal(size=(T + 1, B, A)))
    vals = jnp.asarray(rng.normal(size=(T + 1, B)))
    acts = jnp.asarray(rng.integers(0, A, size=(T + 1, B)))
    rew = jnp.asarray(rng.normal(size=(T + 1, B)))
    dones = jnp.zeros((T + 1, B))

    loss_all, _ = impala_loss_from_outputs(
        pi, vals, mu, acts, rew, dones, jnp.zeros((T + 1, B)),
        gamma=0.99, ent_coef=0.01, vf_coef=0.5,
    )
    loss_masked, aux = impala_loss_from_outputs(
        pi, vals, mu, acts, rew, dones, jnp.ones((T + 1, B)),
        gamma=0.99, ent_coef=0.01, vf_coef=0.5,
    )
    assert abs(float(loss_masked)) < 1e-5
    assert abs(float(loss_all)) > 1e-3


def test_impala_value_gradient_only_through_baseline():
    """stop_gradient on vtrace targets: d(loss)/d(values) must match the
    analytic baseline-only gradient -(vs - v) * mask summed form."""
    rng = np.random.default_rng(3)
    T, B, A = 5, 2, 3
    pi = jnp.asarray(rng.normal(size=(T + 1, B, A)))
    acts = jnp.asarray(rng.integers(0, A, size=(T + 1, B)))
    rew = jnp.asarray(rng.normal(size=(T + 1, B)))
    dones = jnp.zeros((T + 1, B))
    vals = jnp.asarray(rng.normal(size=(T + 1, B)))

    def vloss_only(v):
        loss, aux = impala_loss_from_outputs(
            pi, v, pi, acts, rew, dones, jnp.zeros((T + 1, B)),
            gamma=0.99, ent_coef=0.0, vf_coef=1.0,
        )
        return aux.v_loss

    g = jax.grad(vloss_only)(vals)
    # gradient at the bootstrap row only arrives via v_t of the last step,
    # which is stop-gradient'd inside the target -> must be zero
    assert np.allclose(np.asarray(g)[-1], 0.0, atol=1e-6)
    assert np.abs(np.asarray(g)[:-1]).max() > 1e-4
