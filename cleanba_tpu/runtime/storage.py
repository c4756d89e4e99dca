"""Time-major trajectory containers (the reference's `Transition` NamedTuples,
cleanba_ppo.py:213-223 / cleanba_impala.py:256-265).

Stored as flax struct pytrees of stacked [T, B, ...] arrays. PPO records
behaviour log-probs and values (needed by the clipped surrogate + GAE); IMPALA
records raw behaviour logits instead (V-trace recomputes values under current
params and needs full behaviour distributions for the IS ratios).
"""

from __future__ import annotations

import flax
import jax.numpy as jnp

__all__ = ["PPOStorage", "ImpalaStorage"]


@flax.struct.dataclass
class PPOStorage:
    obs: jnp.ndarray          # [T, B, ...] uint8/float32
    dones: jnp.ndarray        # [T, B] obs-at-t is a fresh episode start
    actions: jnp.ndarray      # [T, B]
    logprobs: jnp.ndarray     # [T, B] behaviour log pi(a|s)
    values: jnp.ndarray       # [T, B] behaviour V(s)
    env_ids: jnp.ndarray      # [T, B]
    rewards: jnp.ndarray      # [T, B]
    truncations: jnp.ndarray  # [T, B]
    terminations: jnp.ndarray # [T, B]
    firststeps: jnp.ndarray   # [T, B] elapsed_step == 0
    prev_actions: jnp.ndarray # [T, B] action taken at t-1 (0 at episode start)
    prev_rewards: jnp.ndarray # [T, B] reward received at t-1 (0 at episode start)


@flax.struct.dataclass
class ImpalaStorage:
    obs: jnp.ndarray          # [T(+1), B, ...] includes the bootstrap row
    dones: jnp.ndarray
    actions: jnp.ndarray
    logitss: jnp.ndarray      # [T(+1), B, A] behaviour logits
    env_ids: jnp.ndarray
    rewards: jnp.ndarray
    truncations: jnp.ndarray
    terminations: jnp.ndarray
    firststeps: jnp.ndarray
    prev_actions: jnp.ndarray # [T(+1), B] action taken at t-1 (0 at episode start)
    prev_rewards: jnp.ndarray # [T(+1), B] reward received at t-1 (0 at episode start)
