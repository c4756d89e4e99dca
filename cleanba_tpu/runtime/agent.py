"""Agent bundle: trunk + heads, jitted inference, and learner-side apply fns.

Inference parity with the reference:
- PPO actors run trunk→actor→sample→logprob→critic and return the on-device
  obs so the H2D upload is reused for storage (cleanba_ppo.py:245-261).
- IMPALA actors skip the critic and return raw behaviour logits
  (cleanba_impala.py:287-301).
Sampling is Gumbel-max with a carried PRNG key.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cleanba_tpu.models import Actor, AgentParams, Critic, init_agent_params, make_trunk
from cleanba_tpu.ops import sample_gumbel

__all__ = ["AgentBundle", "build_agent"]


@dataclass(frozen=True)
class AgentBundle:
    trunk: nn.Module
    actor: Actor
    critic: Critic
    init_params: AgentParams
    # jitted: (params, obs, key) -> (obs_dev, action, logprob, value, key)
    ppo_inference: Callable
    # jitted: (params, obs, key) -> (obs_dev, action, logits, key)
    impala_inference: Callable
    # (params, obs_flat) -> (logits, value); used inside learner jits
    logits_and_value: Callable


def build_agent(cfg, action_dim: int, sample_obs, key: jax.Array, compute_dtype=jnp.float32) -> AgentBundle:
    trunk = make_trunk(cfg.network, cfg.channels, cfg.hiddens, dtype=compute_dtype)
    params, actor, critic = init_agent_params(key, trunk, action_dim, jnp.asarray(sample_obs))

    def ppo_inference(p: AgentParams, obs, key):
        obs = jnp.asarray(obs)
        hidden = trunk.apply(p.network_params, obs)
        logits = actor.apply(p.actor_params, hidden)
        action, key = sample_gumbel(key, logits)
        logprob = jax.nn.log_softmax(logits)[jnp.arange(action.shape[0]), action]
        value = critic.apply(p.critic_params, hidden).squeeze(-1)
        return obs, action, logprob, value, key

    def impala_inference(p: AgentParams, obs, key):
        obs = jnp.asarray(obs)
        hidden = trunk.apply(p.network_params, obs)
        logits = actor.apply(p.actor_params, hidden)
        action, key = sample_gumbel(key, logits)
        return obs, action, logits, key

    def logits_and_value(p: AgentParams, obs) -> Tuple[Any, Any]:
        hidden = trunk.apply(p.network_params, obs)
        logits = actor.apply(p.actor_params, hidden)
        value = critic.apply(p.critic_params, hidden).squeeze(-1)
        return logits, value

    return AgentBundle(
        trunk=trunk,
        actor=actor,
        critic=critic,
        init_params=params,
        ppo_inference=jax.jit(ppo_inference),
        impala_inference=jax.jit(impala_inference),
        logits_and_value=logits_and_value,
    )
