"""Actor/Critic heads, parameter grouping, and the trunk factory.

Mirrors the reference's split-module design (cleanba_ppo.py:192-210): the trunk
(`Network`), policy head (`Actor`) and value head (`Critic`) are separate flax
modules with independent parameter trees grouped in `AgentParams`, because
actor-side IMPALA inference only needs network+actor params
(cleanba_impala.py:287-301) while the learner needs all three.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen.initializers import constant, orthogonal

from cleanba_tpu.models.trunks import ImpalaCNN, MLPTrunk, NatureCNN

__all__ = ["Actor", "Critic", "AgentParams", "PrevActionRewardWrapper", "make_trunk", "init_agent_params"]


class Actor(nn.Module):
    """Policy logits head, orthogonal(0.01) init (reference cleanba_ppo.py:200-203)."""

    action_dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.action_dim, kernel_init=orthogonal(0.01), bias_init=constant(0.0))(x)


class Critic(nn.Module):
    """State-value head, orthogonal(1.0) init (reference cleanba_ppo.py:194-197)."""

    @nn.compact
    def __call__(self, x):
        return nn.Dense(1, kernel_init=orthogonal(1), bias_init=constant(0.0))(x)


class PrevActionRewardWrapper(nn.Module):
    """Concatenate one-hot(prev action) and prev reward onto trunk features.

    R2D2-style input conditioning without an LSTM (reference
    legacy_scripts/..._last_action_reward.py:168-183).
    """

    trunk: nn.Module
    action_dim: int

    @nn.compact
    def __call__(self, x, prev_action=None, prev_reward=None):
        feats = self.trunk(x)
        if prev_action is None:
            prev_action = jnp.zeros((x.shape[0],), jnp.int32)
        if prev_reward is None:
            prev_reward = jnp.zeros((x.shape[0],), jnp.float32)
        onehot = jax.nn.one_hot(prev_action, self.action_dim, dtype=feats.dtype)
        return jnp.concatenate([feats, onehot, prev_reward[:, None].astype(feats.dtype)], axis=-1)


@flax.struct.dataclass
class AgentParams:
    """Grouped parameter trees (reference cleanba_ppo.py:206-210)."""

    network_params: Any
    actor_params: Any
    critic_params: Any


def make_trunk(
    network: str,
    channels: Sequence[int],
    hiddens: Sequence[int],
    dtype=jnp.float32,
    obs_format: str = "NHWC",
) -> nn.Module:
    """Build a trunk by name (config.network: impala_cnn | nature_cnn | mlp)."""
    if network == "impala_cnn":
        return ImpalaCNN(channels=tuple(channels), hiddens=tuple(hiddens), dtype=dtype, obs_format=obs_format)
    if network == "nature_cnn":
        return NatureCNN(hiddens=tuple(hiddens) if hiddens else (512,), dtype=dtype, obs_format=obs_format)
    if network == "mlp":
        return MLPTrunk(hiddens=tuple(hiddens) if hiddens else (64, 64), dtype=dtype)
    raise ValueError(f"unknown network {network!r}")


def init_agent_params(
    key: jax.Array,
    trunk: nn.Module,
    action_dim: int,
    sample_obs: jnp.ndarray,
) -> Tuple[AgentParams, Actor, Critic]:
    """Initialize the three parameter trees from a sample observation batch."""
    actor = Actor(action_dim=action_dim)
    critic = Critic()
    net_key, actor_key, critic_key = jax.random.split(key, 3)
    network_params = trunk.init(net_key, sample_obs)
    feats = trunk.apply(network_params, sample_obs)
    actor_params = actor.init(actor_key, feats)
    critic_params = critic.init(critic_key, feats)
    return AgentParams(network_params, actor_params, critic_params), actor, critic
