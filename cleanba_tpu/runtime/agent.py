"""Agent bundle: trunk + heads, jitted inference, and learner-side apply fns.

Inference parity with the reference:
- PPO actors run trunk→actor→sample→logprob→critic and return the on-device
  obs so the H2D upload is reused for storage (cleanba_ppo.py:245-261).
- IMPALA actors skip the critic and return raw behaviour logits
  (cleanba_impala.py:287-301).
Sampling is Gumbel-max with a carried PRNG key.

All apply fns take (params, obs, prev_action, prev_reward); the prev inputs
are consumed only when `cfg.use_prev_action_reward` selects the R2D2-style
input conditioning (reference legacy_scripts/..._last_action_reward.py:168-183)
and are ignored by the plain trunks otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cleanba_tpu.models import (
    Actor,
    AgentParams,
    Critic,
    PrevActionRewardWrapper,
    make_trunk,
)
from cleanba_tpu.ops import sample_gumbel

__all__ = ["AgentBundle", "build_agent"]


@dataclass(frozen=True)
class AgentBundle:
    trunk: nn.Module
    actor: Actor
    critic: Critic
    init_params: AgentParams
    # jitted: (params, obs, prev_a, prev_r, key) -> (obs_dev, action, logprob, value, key)
    ppo_inference: Callable
    # jitted: (params, obs, prev_a, prev_r, key) -> (obs_dev, action, logits, key)
    impala_inference: Callable
    # (params, obs_flat, prev_a, prev_r) -> (logits, value); used inside learner jits
    logits_and_value: Callable
    # jitted: (params, frame, prev_stack, first, prev_a, prev_r, key)
    #   -> (stack, action, logprob, value, key); on-device frame stacking
    ppo_inference_stacked: Callable
    # jitted: (prev_stack, frame, first) -> stack (bootstrap-row builder)
    stack_frames: Callable
    # jitted: (params, frame, stack_all, first, prev_a, prev_r, env_ids, key)
    #   -> (stack_all, obs, action, logprob, value, key); sub-batch stacking
    #   for the pipelined PPO rollout
    ppo_inference_stacked_sub: Callable
    uses_prev: bool


def build_agent(cfg, action_dim: int, sample_obs, key: jax.Array, compute_dtype=jnp.float32) -> AgentBundle:
    base_trunk = make_trunk(cfg.network, cfg.channels, cfg.hiddens, dtype=compute_dtype)
    uses_prev = bool(getattr(cfg, "use_prev_action_reward", False))
    if uses_prev:
        trunk = PrevActionRewardWrapper(trunk=base_trunk, action_dim=action_dim)
    else:
        trunk = base_trunk

    def apply_trunk(network_params, obs, prev_a, prev_r):
        if uses_prev:
            return trunk.apply(network_params, obs, prev_a, prev_r)
        return trunk.apply(network_params, obs)

    actor = Actor(action_dim=action_dim)
    critic = Critic()
    sample_obs = jnp.asarray(sample_obs)
    net_key, actor_key, critic_key = jax.random.split(key, 3)
    b = sample_obs.shape[0]
    zeros_a = jnp.zeros((b,), jnp.int32)
    zeros_r = jnp.zeros((b,), jnp.float32)

    # One jitted program for the whole init instead of eager flax init calls:
    # eager init issues dozens of tiny device ops, each paying a host<->device
    # round trip (25ms+ on a tunneled chip -> tens of seconds of setup); a
    # single compiled call pays one, and the compilation cache makes repeat
    # processes (orchestrated sweeps) near-free.
    def _init(net_key, actor_key, critic_key):
        if uses_prev:
            network_params = trunk.init(net_key, sample_obs, zeros_a, zeros_r)
        else:
            network_params = trunk.init(net_key, sample_obs)
        feats = apply_trunk(network_params, sample_obs, zeros_a, zeros_r)
        return AgentParams(
            network_params, actor.init(actor_key, feats), critic.init(critic_key, feats)
        )

    params = jax.jit(_init)(net_key, actor_key, critic_key)

    def ppo_inference(p: AgentParams, obs, prev_a, prev_r, key):
        obs = jnp.asarray(obs)
        hidden = apply_trunk(p.network_params, obs, prev_a, prev_r)
        logits = actor.apply(p.actor_params, hidden)
        action, key = sample_gumbel(key, logits)
        logprob = jax.nn.log_softmax(logits)[jnp.arange(action.shape[0]), action]
        value = critic.apply(p.critic_params, hidden).squeeze(-1)
        return obs, action, logprob, value, key

    def impala_inference(p: AgentParams, obs, prev_a, prev_r, key):
        obs = jnp.asarray(obs)
        hidden = apply_trunk(p.network_params, obs, prev_a, prev_r)
        logits = actor.apply(p.actor_params, hidden)
        action, key = sample_gumbel(key, logits)
        return obs, action, logits, key

    def _stack_update(prev_stack, new_frame, first):
        """On-device frame stack: shift in the newest frame; on a fresh
        episode start (first=1) the stack is the new frame repeated.

        Cuts actor H2D traffic 4x vs engine-side stacking (the engine emits
        [B, 84, 84, 1] with frame_stack=1; this rebuilds [B, 84, 84, S]).
        """
        s_dim = prev_stack.shape[-1]
        tiled = jnp.repeat(new_frame, s_dim, axis=-1)
        shifted = jnp.concatenate([prev_stack[..., 1:], new_frame], axis=-1)
        mask = first.astype(bool)[:, None, None, None]
        return jnp.where(mask, tiled, shifted)

    def ppo_inference_stacked(p: AgentParams, new_frame, prev_stack, first, prev_a, prev_r, key):
        obs = _stack_update(prev_stack, jnp.asarray(new_frame), jnp.asarray(first))
        hidden = apply_trunk(p.network_params, obs, prev_a, prev_r)
        logits = actor.apply(p.actor_params, hidden)
        action, key = sample_gumbel(key, logits)
        logprob = jax.nn.log_softmax(logits)[jnp.arange(action.shape[0]), action]
        value = critic.apply(p.critic_params, hidden).squeeze(-1)
        return obs, action, logprob, value, key

    def stack_frames(prev_stack, new_frame, first):
        return _stack_update(prev_stack, jnp.asarray(new_frame), jnp.asarray(first))

    def ppo_inference_stacked_sub(p: AgentParams, new_frame, stack_all, first,
                                  prev_a, prev_r, env_ids, key):
        """Sub-batch variant of ppo_inference_stacked for the pipelined PPO
        rollout: the full-pool frame stack lives on device as `stack_all`
        [n_envs, H, W, S]; each call gathers the sub-batch's rows by env id,
        shifts in the new frames, scatters the stacks back and runs inference
        on the sub-batch only."""
        env_ids = jnp.asarray(env_ids)
        obs = _stack_update(stack_all[env_ids], jnp.asarray(new_frame),
                            jnp.asarray(first))
        stack_all = stack_all.at[env_ids].set(obs)
        hidden = apply_trunk(p.network_params, obs, prev_a, prev_r)
        logits = actor.apply(p.actor_params, hidden)
        action, key = sample_gumbel(key, logits)
        logprob = jax.nn.log_softmax(logits)[jnp.arange(action.shape[0]), action]
        value = critic.apply(p.critic_params, hidden).squeeze(-1)
        return stack_all, obs, action, logprob, value, key

    def logits_and_value(p: AgentParams, obs, prev_a=None, prev_r=None) -> Tuple[Any, Any]:
        if prev_a is None:
            prev_a = jnp.zeros(obs.shape[:1], jnp.int32)
        if prev_r is None:
            prev_r = jnp.zeros(obs.shape[:1], jnp.float32)
        hidden = apply_trunk(p.network_params, obs, prev_a, prev_r)
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
        ppo_inference_stacked=jax.jit(ppo_inference_stacked),
        stack_frames=jax.jit(stack_frames),
        ppo_inference_stacked_sub=jax.jit(ppo_inference_stacked_sub),
        uses_prev=uses_prev,
    )
