"""Pure loss functions for PPO-clip and IMPALA.

Decoupled from model application (the reference inlines the flax `apply` calls
into its losses, cleanba_ppo.py:562-577, cleanba_impala.py:557-597); here each
loss takes logits/values so it can be unit-tested against closed forms and
reused by any trunk. Model application + minibatching live in
runtime/learner.py.

Reduction conventions preserved exactly:
- PPO: mean over all minibatch elements (cleanba_ppo.py:569-575).
- IMPALA: sum over (T, B) with a (1 - firststeps) mask, i.e. the rlax per-batch
  mean rescaled by T and summed over the batch (cleanba_impala.py:557-567).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cleanba_tpu.ops.sampling import log_softmax_gather, softmax_entropy
from cleanba_tpu.ops.vtrace import categorical_importance_ratios, vtrace_td_error_and_advantage

__all__ = ["PPOLossAux", "ppo_loss_from_outputs", "ImpalaLossAux", "impala_loss_from_outputs"]


class PPOLossAux(NamedTuple):
    pg_loss: jnp.ndarray
    v_loss: jnp.ndarray
    entropy_loss: jnp.ndarray
    approx_kl: jnp.ndarray


def ppo_loss_from_outputs(
    logits: jnp.ndarray,            # [N, A] current policy logits
    new_values: jnp.ndarray,        # [N]    current value predictions
    actions: jnp.ndarray,           # [N]
    behavior_logprobs: jnp.ndarray, # [N]    log mu(a|s) recorded at rollout time
    advantages: jnp.ndarray,        # [N]    (already normalized if norm_adv)
    target_values: jnp.ndarray,     # [N]
    clip_coef: float,
    ent_coef: float,
    vf_coef: float,
):
    """Clipped-surrogate PPO loss (cleanba_ppo.py:562-577)."""
    newlogprob = log_softmax_gather(logits, actions)
    entropy = softmax_entropy(logits)

    logratio = newlogprob - behavior_logprobs
    ratio = jnp.exp(logratio)
    approx_kl = ((ratio - 1.0) - logratio).mean()

    pg_loss1 = -advantages * ratio
    pg_loss2 = -advantages * jnp.clip(ratio, 1.0 - clip_coef, 1.0 + clip_coef)
    pg_loss = jnp.maximum(pg_loss1, pg_loss2).mean()

    v_loss = 0.5 * ((new_values - target_values) ** 2).mean()
    entropy_loss = entropy.mean()

    loss = pg_loss - ent_coef * entropy_loss + vf_coef * v_loss
    return loss, PPOLossAux(pg_loss, v_loss, entropy_loss, jax.lax.stop_gradient(approx_kl))


class ImpalaLossAux(NamedTuple):
    pg_loss: jnp.ndarray
    v_loss: jnp.ndarray
    entropy_loss: jnp.ndarray


def impala_loss_from_outputs(
    pi_logits: jnp.ndarray,   # [T+1, B, A] current policy logits (incl. bootstrap row)
    values: jnp.ndarray,      # [T+1, B]    current value predictions
    mu_logits: jnp.ndarray,   # [T+1, B, A] behaviour logits recorded at rollout time
    actions: jnp.ndarray,     # [T+1, B]
    rewards: jnp.ndarray,     # [T+1, B]
    dones: jnp.ndarray,       # [T+1, B]
    firststeps: jnp.ndarray,  # [T+1, B]  episode-first-step flags (masked out of losses)
    gamma: float,
    ent_coef: float,
    vf_coef: float,
    lambda_: float = 1.0,
    clip_rho_threshold: float = 1.0,
    clip_pg_rho_threshold: float = 1.0,
):
    """IMPALA loss with V-trace corrections (cleanba_impala.py:557-597).

    The final row of every [T+1, ...] input is the bootstrap timestep; only its
    value prediction participates (as v_t of the last transition).
    """
    discounts = (1.0 - dones) * gamma
    mask = (1.0 - firststeps)[:-1]

    v_t = values[1:]
    v_tm1 = values[:-1]
    pi_logits_t = pi_logits[:-1]
    mu_logits_t = mu_logits[:-1]
    a_t = actions[:-1]
    r_t = rewards[:-1]
    discounts_t = discounts[:-1]

    rhos = categorical_importance_ratios(pi_logits_t, mu_logits_t, a_t)
    vt = vtrace_td_error_and_advantage(
        v_tm1, v_t, r_t, discounts_t, rhos,
        lambda_=lambda_,
        clip_rho_threshold=clip_rho_threshold,
        clip_pg_rho_threshold=clip_pg_rho_threshold,
    )

    # Policy gradient: -sum_{t,b} logpi(a) * stop_grad(adv) * mask
    # (rlax.policy_gradient_loss per-batch mean, rescaled x T and summed:
    # cleanba_impala.py:557-561).
    logpi_a = log_softmax_gather(pi_logits_t, a_t)
    pg_loss = -jnp.sum(logpi_a * jax.lax.stop_gradient(vt.pg_advantage) * mask)

    # Baseline: 0.5 * sum of masked squared vtrace errors (cleanba_impala.py:592).
    v_loss = 0.5 * jnp.sum(jnp.square(vt.errors) * mask)

    # Entropy loss: -sum_{t,b} H(pi_t) * mask (cleanba_impala.py:563-567).
    entropy_loss = -jnp.sum(softmax_entropy(pi_logits_t) * mask)

    loss = pg_loss + vf_coef * v_loss + ent_coef * entropy_loss
    return loss, ImpalaLossAux(pg_loss, v_loss, entropy_loss)
