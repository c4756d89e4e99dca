"""V-trace off-policy corrections (Espeholt et al. 2018, IMPALA).

From-scratch reimplementation of the semantics the reference gets from
`rlax.vtrace_td_error_and_advantage` (used at cleanba_impala.py:584-588):
clipped importance weights, a reverse scan for the v_s targets, and the
policy-gradient advantage built from the one-step-ahead target.

Unlike the reference (which `jax.vmap`s a per-trajectory rlax function over the
batch axis, cleanba_impala.py:585), this implementation is natively batched
[T, B]: each scan step is a B-wide VPU op and the only sequential dimension is
time (T=20 by default), which is what XLA wants on TPU.

Verified against an independent NumPy loop implementation in
tests/test_vtrace.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["VTraceOutput", "vtrace_td_error_and_advantage", "categorical_importance_ratios"]


class VTraceOutput(NamedTuple):
    errors: jnp.ndarray        # vs_t - V(x_t); targets are stop-gradient'd
    pg_advantage: jnp.ndarray  # clipped-rho * (q_t - V(x_t))
    q_estimate: jnp.ndarray    # r_t + gamma_t * bootstrap


def categorical_importance_ratios(
    pi_logits: jnp.ndarray,  # [..., A] current policy logits
    mu_logits: jnp.ndarray,  # [..., A] behaviour policy logits
    actions: jnp.ndarray,    # [...]    taken actions
) -> jnp.ndarray:
    """rho = pi(a|x) / mu(a|x) for categorical policies."""
    log_pi = jnp.take_along_axis(jax.nn.log_softmax(pi_logits, -1), actions[..., None], -1).squeeze(-1)
    log_mu = jnp.take_along_axis(jax.nn.log_softmax(mu_logits, -1), actions[..., None], -1).squeeze(-1)
    return jnp.exp(log_pi - log_mu)


def vtrace_td_error_and_advantage(
    v_tm1: jnp.ndarray,       # [T, B]  V(x_t) for t = 0..T-1
    v_t: jnp.ndarray,         # [T, B]  V(x_{t+1}) for t = 0..T-1 (shifted values)
    r_t: jnp.ndarray,         # [T, B]  rewards
    discount_t: jnp.ndarray,  # [T, B]  gamma * (1 - done_{t+1})
    rho_tm1: jnp.ndarray,     # [T, B]  importance ratios pi/mu at t
    lambda_: float = 1.0,
    clip_rho_threshold: float = 1.0,
    clip_pg_rho_threshold: float = 1.0,
    stop_target_gradients: bool = True,
) -> VTraceOutput:
    """Batched [T, B] V-trace targets and policy-gradient advantages.

    vs_t - V_t = sum_{k>=t} gamma^{k-t} (prod c) * clipped_rho_k * delta_k, computed
    by the reverse recursion err_t = delta_t + discount_t * c_t * err_{t+1}.
    """
    c_tm1 = jnp.minimum(1.0, rho_tm1) * lambda_
    clipped_rho_tm1 = jnp.minimum(clip_rho_threshold, rho_tm1)
    td_errors = clipped_rho_tm1 * (r_t + discount_t * v_t - v_tm1)

    def step(err_tp1, inp):
        td, disc, c = inp
        err = td + disc * c * err_tp1
        return err, err

    _, errors = jax.lax.scan(
        step, jnp.zeros_like(td_errors[-1]), (td_errors, discount_t, c_tm1), reverse=True
    )
    if stop_target_gradients:
        # Treat the vs targets as constants: gradient flows only through v_tm1.
        errors = jax.lax.stop_gradient(errors + v_tm1) - v_tm1

    targets_tm1 = errors + v_tm1
    # Policy-gradient advantage uses the lambda-mixed one-step-ahead target.
    q_bootstrap = jnp.concatenate(
        [lambda_ * targets_tm1[1:] + (1.0 - lambda_) * v_tm1[1:], v_t[-1:]], axis=0
    )
    q_estimate = r_t + discount_t * q_bootstrap
    clipped_pg_rho_tm1 = jnp.minimum(clip_pg_rho_threshold, rho_tm1)
    pg_advantages = clipped_pg_rho_tm1 * (q_estimate - v_tm1)
    return VTraceOutput(errors=errors, pg_advantage=pg_advantages, q_estimate=q_estimate)
