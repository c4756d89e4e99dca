"""On-device categorical action sampling.

The reference samples with the Gumbel-max trick inside the jitted inference
function (cleanba_ppo.py:256-258): argmax(logits - log(-log(U))). We keep the
same estimator (bit-for-bit parity matters for exact-seed tests) as a pure op.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["sample_gumbel", "log_softmax_gather", "softmax_entropy"]


def sample_gumbel(key: jax.Array, logits: jnp.ndarray) -> Tuple[jnp.ndarray, jax.Array]:
    """Gumbel-max categorical sample over the last axis; returns (action, next_key)."""
    key, subkey = jax.random.split(key)
    u = jax.random.uniform(subkey, shape=logits.shape)
    action = jnp.argmax(logits - jnp.log(-jnp.log(u)), axis=-1)
    return action, key


def log_softmax_gather(logits: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
    """log pi(a|s): gather per-sample action log-probabilities.

    Uses take_along_axis (vectorized gather) instead of the reference's
    arange-indexing (cleanba_ppo.py:259) so it works for any leading shape.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, actions[..., None], axis=-1).squeeze(-1)


def softmax_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    """Entropy of the softmax distribution over the last axis, numerically safe."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return -jnp.sum(jnp.where(p > 0, p * logp, 0.0), axis=-1)
