"""Sync single-chip PPO with in-graph env stepping.

Parity with the reference's `legacy_scripts/ppo_atari_envpool_xla_jax_scan.py`
(539 LoC): the whole rollout is a `lax.scan` over the engine's XLA
host-callback step, and rollout + GAE + minibatch epochs run as jitted steps —
no actor threads, no queues. This is the simplest-possible baseline trainer
(useful for debugging the Sebulba pipeline against a known-good sync loop) and
the reference for the `--concurrency` ablation.

    python -m cleanba_tpu.train_ppo_xla --env-id Breakout-v5 --local-num-envs 32
"""

from __future__ import annotations

import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.config import PPOConfig
from cleanba_tpu.envs import make_env
from cleanba_tpu.envs.xla_interface import xla_interface
from cleanba_tpu.ops import compute_gae, make_ppo_optimizer, ppo_loss_from_outputs, sample_gumbel
from cleanba_tpu.runtime.agent import build_agent
from cleanba_tpu.runtime.learner import current_learning_rate
from cleanba_tpu.runtime.rollout import EpisodeStats
from cleanba_tpu.runtime.train_state import TrainState
from cleanba_tpu.utils.cli import parse_cli
from cleanba_tpu.utils.metrics import make_writer

__all__ = ["main"]


def main(argv=None):
    cfg = parse_cli(PPOConfig, argv, description="Sync single-chip PPO, in-graph env scan")
    cfg.num_actor_threads = 1
    cfg.actor_device_ids = [0]
    cfg.learner_device_ids = [0]
    assert not cfg.use_prev_action_reward, "xla-scan trainer supports plain trunks only"
    cfg.resolve()
    writer = make_writer(cfg, is_primary=True)

    random.seed(cfg.seed)
    np.random.seed(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    key, agent_key = jax.random.split(key)

    envs = make_env(
        cfg.env_id, seed=cfg.seed, num_envs=cfg.local_num_envs,
        protocol=cfg.env_protocol, backend=cfg.env_backend,
    )()
    _, step_env = xla_interface(envs)
    agent = build_agent(cfg, envs.spec.num_actions, np.zeros((1, *envs.spec.obs_shape), envs.spec.obs_dtype), agent_key)
    state = TrainState.create(params=agent.init_params, tx=make_ppo_optimizer(cfg))

    num_mb = cfg.num_minibatches * cfg.gradient_accumulation_steps

    @jax.jit
    def rollout(params, obs, done, key):
        """lax.scan over in-graph env steps (reference :248-270)."""

        def body(carry, _):
            obs, done, key = carry
            hidden = agent.trunk.apply(params.network_params, obs)  # plain trunk (asserted)
            logits = agent.actor.apply(params.actor_params, hidden)
            action, key = sample_gumbel(key, logits)
            logprob = jax.nn.log_softmax(logits)[jnp.arange(action.shape[0]), action]
            value = agent.critic.apply(params.critic_params, hidden).squeeze(-1)
            next_obs, reward, term, trunc, first = step_env(action)
            next_done = (term | trunc).astype(jnp.float32)
            step_data = (obs, done, action, logprob, value, reward, first)
            return (next_obs, next_done, key), step_data

        (obs, done, key), traj = jax.lax.scan(body, (obs, done, key), (), length=cfg.num_steps)
        return obs, done, key, traj

    def ppo_loss(params, obs, actions, logprobs, adv, tgt):
        logits, values = agent.logits_and_value(params, obs)
        return ppo_loss_from_outputs(
            logits, values, actions, logprobs, adv, tgt,
            clip_coef=cfg.clip_coef, ent_coef=cfg.ent_coef, vf_coef=cfg.vf_coef,
        )

    loss_grad_fn = jax.value_and_grad(ppo_loss, has_aux=True)

    @jax.jit
    def update(state, traj, next_obs, next_done, key):
        obs_t, done_t, action_t, logprob_t, value_t, reward_t, _first = traj
        _, next_value = agent.logits_and_value(state.params, next_obs)
        adv, tgt = compute_gae(reward_t, value_t, done_t, next_value, next_done, cfg.gamma, cfg.gae_lambda)
        if cfg.norm_adv:
            t = adv.shape[0]
            a = adv.reshape(t, cfg.num_minibatches, -1)
            a = (a - a.mean((0, -1), keepdims=True)) / (a.std((0, -1), keepdims=True) + 1e-8)
            adv = a.reshape(t, -1)

        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        data = (flat(obs_t), flat(action_t), flat(logprob_t), flat(adv), flat(tgt))

        def epoch(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            shuffled = jax.tree.map(
                lambda x: jax.random.permutation(sub, x).reshape((num_mb, -1) + x.shape[1:]), data
            )

            def mb_step(state, mb):
                (loss, aux), grads = loss_grad_fn(state.params, *mb)
                return state.apply_gradients(grads=grads), (loss, aux.pg_loss, aux.v_loss, aux.entropy_loss, aux.approx_kl)

            state, metrics = jax.lax.scan(mb_step, state, shuffled)
            return (state, key), metrics

        (state, key), metrics = jax.lax.scan(epoch, (state, key), (), length=cfg.update_epochs)
        return state, jax.tree.map(lambda m: m.mean(), metrics), key

    stats = EpisodeStats(cfg.local_num_envs)
    obs_np, _ = envs.reset()
    obs = jnp.asarray(obs_np)
    done = jnp.zeros(cfg.local_num_envs, jnp.float32)
    global_step = 0
    start = time.time()
    for version in range(1, cfg.num_updates + 1):
        obs, done, key, traj = rollout(state.params, obs, done, key)
        global_step += cfg.local_num_envs * cfg.num_steps
        state, metrics, key = update(state, traj, obs, done, key)
        # episode stats from the trajectory's first-step/done flags + env info
        if version % cfg.log_frequency == 0:
            loss, pg, vl, ent, kl = (float(np.asarray(m)) for m in metrics)
            sps = int(global_step / (time.time() - start))
            print(f"global_step={global_step}, loss={loss:.4f}, SPS={sps}")
            writer.add_scalar("charts/SPS", sps, global_step)
            writer.add_scalar("charts/learning_rate", current_learning_rate(state), global_step)
            writer.add_scalar("losses/loss", loss, global_step)
            writer.add_scalar("losses/policy_loss", pg, global_step)
            writer.add_scalar("losses/value_loss", vl, global_step)
            writer.add_scalar("losses/entropy", ent, global_step)
            writer.add_scalar("losses/approx_kl", kl, global_step)
    envs.close()
    writer.flush()
    writer.close()


if __name__ == "__main__":
    main()
