"""Generalized Advantage Estimation as a reverse `lax.scan` over the time axis.

Semantics match the reference exactly (cleanba_ppo.py:532-560): a reverse scan
over per-step deltas with termination masking, bootstrapped by the value of the
post-rollout observation. Inputs are time-major [T, B]; each scan step is a
B-wide VPU op, so T stays the only sequential dimension (T=128 by default).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["compute_gae"]


def compute_gae(
    rewards: jnp.ndarray,      # [T, B]
    values: jnp.ndarray,       # [T, B]  V(s_t) under the behaviour-time params
    dones: jnp.ndarray,        # [T, B]  done flag observed *at* step t (pre-action)
    next_value: jnp.ndarray,   # [B]     V(s_{T}) bootstrap
    next_done: jnp.ndarray,    # [B]     done flag at the bootstrap step
    gamma: float,
    gae_lambda: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (advantages, target_values), both [T, B].

    delta_t  = r_t + gamma * (1-done_{t+1}) * V_{t+1} - V_t
    A_t      = delta_t + gamma * lambda * (1-done_{t+1}) * A_{t+1}
    target_t = A_t + V_t
    """
    dones_tp1 = jnp.concatenate([dones[1:], next_done[None, :]], axis=0)
    values_tp1 = jnp.concatenate([values[1:], next_value[None, :]], axis=0)
    nonterminal = 1.0 - dones_tp1

    def step(adv, inp):
        nonterm_t, v_tp1, v_t, r_t = inp
        delta = r_t + gamma * v_tp1 * nonterm_t - v_t
        adv = delta + gamma * gae_lambda * nonterm_t * adv
        return adv, adv

    _, advantages = jax.lax.scan(
        step,
        jnp.zeros_like(next_value),
        (nonterminal, values_tp1, values, rewards),
        reverse=True,
    )
    return advantages, advantages + values
