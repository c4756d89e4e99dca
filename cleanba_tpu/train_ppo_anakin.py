"""Anakin-architecture PPO: envs, rollout, GAE, and update all on the TPU.

The deepest TPU-native redesign of the reference's pipeline: where Sebulba
(reference cleanba/cleanba_ppo.py) steps C++ envs on the host and pays one
host<->device round trip per environment step, this trainer uses the pure-JAX
env engine (`cleanba_tpu/envs/jax_engine.py`) so the ENTIRE update —
T-step rollout scan, GAE, and the minibatch-epoch optimization — compiles
into ONE XLA program per iteration. The host only dispatches the next update
and reads metrics every `log_frequency` iterations; no per-step transfers, no
actor threads, no queues.

Scaling: a 1-D device mesh; envs are sharded over it and params replicated,
with a `jax.lax.pmean` gradient all-reduce over ICI — per-device update
semantics are identical to the Sebulba learner (runtime/learner.py), so
learning curves are reproducible across chip counts.

Algorithm semantics match the reference exactly: same losses
(ops/losses.py), GAE (ops/gae.py), optimizer chain (ops/optim.py),
per-minibatch advantage normalization axes, and Machado env protocol (now
enforced inside the JAX games).

    python -m cleanba_tpu.train_ppo_anakin --env-id Breakout-v5
"""

from __future__ import annotations

import random
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.config import PPOConfig
from cleanba_tpu.envs import PROTOCOLS
from cleanba_tpu.envs.jax_engine import make_jax_env
from cleanba_tpu.ops import compute_gae, make_ppo_optimizer, ppo_loss_from_outputs, sample_gumbel
from cleanba_tpu.runtime.agent import build_agent
from cleanba_tpu.runtime.learner import PPOMetrics, current_learning_rate
from cleanba_tpu.runtime.train_state import TrainState
from cleanba_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    save_model,
)
from cleanba_tpu.utils.cli import parse_cli
from cleanba_tpu.utils.metrics import make_writer

try:  # jax >= 0.6
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

P = jax.sharding.PartitionSpec
AXIS = "d"

__all__ = ["main", "build_train_step", "make_anakin_state"]


class EpisodeStatsState(NamedTuple):
    """On-device episode accumulators (host-side twin: runtime/rollout.py
    EpisodeStats; reference cleanba_ppo.py:263-271)."""

    episode_returns: jax.Array           # [B] running raw-return accumulator
    returned_episode_returns: jax.Array  # [B] last completed episode's return
    episode_lengths: jax.Array
    returned_episode_lengths: jax.Array

    @classmethod
    def zeros(cls, n: int) -> "EpisodeStatsState":
        z = jnp.zeros((n,), jnp.float32)
        return cls(z, z, z, z)

    def update(self, raw_rewards, done) -> "EpisodeStatsState":
        done = done.astype(jnp.float32)
        ep_ret = self.episode_returns + raw_rewards
        ep_len = self.episode_lengths + 1.0
        return EpisodeStatsState(
            episode_returns=ep_ret * (1.0 - done),
            returned_episode_returns=jnp.where(
                done.astype(bool), ep_ret, self.returned_episode_returns
            ),
            episode_lengths=ep_len * (1.0 - done),
            returned_episode_lengths=jnp.where(
                done.astype(bool), ep_len, self.returned_episode_lengths
            ),
        )


class AnakinCarry(NamedTuple):
    """Per-device persistent state threaded through update iterations."""

    agent_state: TrainState
    env_state: object         # vmapped env pytree, leading dim [B_local]
    obs: jax.Array            # [B_local, ...]
    next_done: jax.Array      # [B_local]
    ep_stats: EpisodeStatsState
    key: jax.Array            # per-device PRNG


def build_train_step(cfg, env, mesh, agent, n_local_envs: int):
    """Returns the jitted one-update train step: AnakinCarry -> (AnakinCarry,
    PPOMetrics, charts) with everything inside a single shard_map program."""

    logits_and_value = agent.logits_and_value
    if getattr(cfg, "remat", False):
        logits_and_value = jax.checkpoint(logits_and_value)
    num_mb = cfg.num_minibatches * cfg.gradient_accumulation_steps
    n_dev = mesh.devices.size
    assert n_local_envs % n_dev == 0 and (n_local_envs // n_dev) % cfg.num_minibatches == 0, (
        f"envs per device ({n_local_envs}/{n_dev}) must be divisible by "
        f"num_minibatches ({cfg.num_minibatches}) — same constraint as the "
        "reference's per-learner-device minibatching (cleanba_ppo.py:413-418)"
    )
    v_step = jax.vmap(env.step)

    def ppo_loss(params, obs, actions, behavior_logprobs, advantages, target_values):
        logits, new_values = logits_and_value(params, obs)
        return ppo_loss_from_outputs(
            logits, new_values, actions, behavior_logprobs, advantages, target_values,
            clip_coef=cfg.clip_coef, ent_coef=cfg.ent_coef, vf_coef=cfg.vf_coef,
        )

    loss_grad_fn = jax.value_and_grad(ppo_loss, has_aux=True)

    def local_step(agent_state, env_state, obs, next_done, ep_stats, key):
        key = key[0]  # per-device slice of the [n_dev] key array
        params = agent_state.params

        # ---- rollout: T in-graph env steps (no host in the loop) ----------
        def rollout_body(rc, _):
            env_state, obs, done, ep_stats, key = rc
            key, sk = jax.random.split(key)
            logits, value = logits_and_value(params, obs)
            action, _ = sample_gumbel(sk, logits)
            logprob = jax.nn.log_softmax(logits)[jnp.arange(action.shape[0]), action]
            env_state, next_obs, reward, raw_reward, term, trunc, first = v_step(
                env_state, action
            )
            new_done = (term | trunc).astype(jnp.float32)
            ep_stats = ep_stats.update(raw_reward, new_done)
            transition = (obs, done, action, logprob, value, reward)
            return (env_state, next_obs, new_done, ep_stats, key), transition

        (env_state, obs, next_done, ep_stats, key), traj = jax.lax.scan(
            rollout_body, (env_state, obs, next_done, ep_stats, key), (),
            length=cfg.num_steps,
        )
        obs_t, dones_t, actions_t, logprobs_t, values_t, rewards_t = traj

        # ---- GAE (reference compute_gae, cleanba_ppo.py:532-560) ----------
        _, next_value = logits_and_value(params, obs)
        advantages, target_values = compute_gae(
            rewards_t, values_t, dones_t, next_value, next_done,
            cfg.gamma, cfg.gae_lambda,
        )
        if cfg.norm_adv:
            t = advantages.shape[0]
            a = advantages.reshape(t, cfg.num_minibatches, -1)
            a = (a - a.mean((0, -1), keepdims=True)) / (a.std((0, -1), keepdims=True) + 1e-8)
            advantages = a.reshape(t, -1)

        flatten = lambda x: x.reshape((-1,) + x.shape[2:])
        f_obs, f_act, f_logp = flatten(obs_t), flatten(actions_t), flatten(logprobs_t)
        f_adv, f_tgt = flatten(advantages), flatten(target_values)

        # ---- minibatch epochs (reference cleanba_ppo.py:597-648) ----------
        def update_epoch(ec, _):
            agent_state, key = ec
            key, sk = jax.random.split(key)
            mb_indices = jax.random.permutation(sk, f_adv.shape[0]).reshape(num_mb, -1)

            def update_minibatch(agent_state, idx):
                take = lambda x: jnp.take(x, idx, axis=0)
                (loss, aux), grads = loss_grad_fn(
                    agent_state.params, take(f_obs), take(f_act), take(f_logp),
                    take(f_adv), take(f_tgt),
                )
                grads = jax.lax.pmean(grads, AXIS)
                agent_state = agent_state.apply_gradients(grads=grads)
                return agent_state, PPOMetrics(
                    loss, aux.pg_loss, aux.v_loss, aux.entropy_loss, aux.approx_kl
                )

            agent_state, metrics = jax.lax.scan(update_minibatch, agent_state, mb_indices)
            return (agent_state, key), metrics

        (agent_state, key), metrics = jax.lax.scan(
            update_epoch, (agent_state, key), (), length=cfg.update_epochs
        )
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, AXIS).mean(), metrics)
        charts = (
            jax.lax.pmean(ep_stats.returned_episode_returns.mean(), AXIS),
            jax.lax.pmean(ep_stats.returned_episode_lengths.mean(), AXIS),
        )
        return (
            agent_state, env_state, obs, next_done, ep_stats, key[None],
            metrics, charts,
        )

    env_spec = P(AXIS)
    specs = (P(), env_spec, env_spec, env_spec, env_spec, P(AXIS))
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=specs,
        out_specs=(*specs, P(), P()),
        check_vma=False,
    )
    # No donation: donating shard_map-carried buffers trips an aliasing bug in
    # the axon TPU backend (INVALID_ARGUMENT at execution). The env state is
    # small relative to HBM (35KB/env), so double-buffering is cheap.
    inner = jax.jit(sharded)

    def step(carry: AnakinCarry):
        out = inner(*carry)
        return AnakinCarry(*out[:6]), out[6], out[7]

    return step


def make_anakin_state(cfg, env, mesh, agent, key: jax.Array) -> AnakinCarry:
    """Build the initial device-sharded carry (env resets + TrainState).

    Multi-host: every process builds the same global program; env keys are
    seeded identically everywhere, so device_put simply places each
    process's shard of the global env batch."""
    n_dev = mesh.devices.size
    n_envs = cfg.local_num_envs * cfg.num_actor_threads * max(cfg.world_size, 1)
    assert n_envs % n_dev == 0, (
        f"total envs {n_envs} must divide over {n_dev} mesh devices"
    )
    env_sharding = jax.sharding.NamedSharding(mesh, P(AXIS))
    rep = jax.sharding.NamedSharding(mesh, P())

    key, env_key, carry_key = jax.random.split(key, 3)
    env_keys = jax.random.split(env_key, n_envs)
    env_state, obs = jax.jit(
        jax.vmap(env.reset), out_shardings=(env_sharding, env_sharding)
    )(env_keys)

    agent_state = TrainState.create(params=agent.init_params, tx=make_ppo_optimizer(cfg))
    agent_state = jax.device_put(agent_state, rep)
    per_dev_keys = jax.device_put(jax.random.split(carry_key, n_dev), env_sharding)
    return AnakinCarry(
        agent_state=agent_state,
        env_state=env_state,
        obs=obs,
        next_done=jax.device_put(jnp.zeros((n_envs,), jnp.float32), env_sharding),
        ep_stats=jax.device_put(EpisodeStatsState.zeros(n_envs), env_sharding),
        key=per_dev_keys,
    )


def train(cfg: PPOConfig, devices=None, writer=None):
    """Run Anakin PPO; returns (final TrainState params, stats dict).

    Multi-host: with --distributed the mesh spans every chip of every
    process (jax.devices()); per-process env counts stay `local_num_envs *
    num_actor_threads` and the gradient pmean crosses hosts over ICI/DCN
    (validated by the 2-process fixture in tests/test_distributed.py)."""
    if devices is None:
        devices = jax.devices() if cfg.distributed else jax.local_devices()
    mesh = jax.sharding.Mesh(np.array(devices), (AXIS,))

    random.seed(cfg.seed)
    np.random.seed(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    key, agent_key = jax.random.split(key)

    proto = dict(PROTOCOLS.get(cfg.env_protocol, PROTOCOLS["machado"]))
    env = make_jax_env(cfg.env_id, proto)
    sample_obs = np.zeros((1, *env.obs_shape), np.uint8 if env.obs_dtype == jnp.uint8 else np.float32)
    agent = build_agent(
        cfg, env.num_actions, sample_obs, agent_key,
        compute_dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
    )

    n_envs = cfg.local_num_envs * cfg.num_actor_threads * max(cfg.world_size, 1)
    train_step = build_train_step(cfg, env, mesh, agent, n_envs)
    carry = make_anakin_state(cfg, env, mesh, agent, key)

    # Resume (exceeds the reference, which has no resume at all): restore
    # params + optimizer + counters; env states restart fresh, which only
    # perturbs the first rollout's episode boundaries.
    start_update, global_step = 1, 0
    if cfg.resume:
        ckpt = latest_checkpoint(cfg.run_path)
        if ckpt:
            agent_state, start_update, global_step = restore_checkpoint(
                ckpt, carry.agent_state
            )
            rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            carry = carry._replace(agent_state=jax.device_put(agent_state, rep))
            start_update += 1
            print(f"resumed from {ckpt} (update {start_update - 1}, step {global_step})")

    own_writer = writer is None
    if own_writer:
        writer = make_writer(cfg, is_primary=True)

    from cleanba_tpu.utils.watchdog import progress_guard_from_env

    guard = progress_guard_from_env()
    guard.beat()  # covers first-update compile + first sync
    steps_per_update = n_envs * cfg.num_steps
    start = time.time()
    run_steps = 0
    last_metrics = None
    for update in range(start_update, cfg.num_updates + 1):
        carry, metrics, charts = train_step(carry)
        global_step += steps_per_update
        run_steps += steps_per_update
        if cfg.checkpoint_frequency > 0 and update % cfg.checkpoint_frequency == 0:
            host_state = jax.device_get(carry.agent_state)
            save_checkpoint(cfg.run_path, host_state, update, global_step)
            guard.beat()
        if update % cfg.log_frequency == 0:
            loss, pg, v, ent, kl = jax.device_get(
                (metrics.loss, metrics.pg_loss, metrics.v_loss,
                 metrics.entropy_loss, metrics.approx_kl)
            )
            avg_ret, avg_len = jax.device_get(charts)
            sps = int(run_steps / max(time.time() - start, 1e-9))
            print(
                f"global_step={global_step}, avg_episodic_return={avg_ret:.2f}, SPS={sps}"
            )
            writer.add_scalar("charts/avg_episodic_return", float(avg_ret), global_step)
            writer.add_scalar("charts/avg_episodic_length", float(avg_len), global_step)
            writer.add_scalar("charts/SPS", sps, global_step)
            writer.add_scalar(
                "charts/learning_rate",
                current_learning_rate(carry.agent_state), global_step,
            )
            writer.add_scalar("losses/loss", float(loss), global_step)
            writer.add_scalar("losses/policy_loss", float(pg), global_step)
            writer.add_scalar("losses/value_loss", float(v), global_step)
            writer.add_scalar("losses/entropy", float(ent), global_step)
            writer.add_scalar("losses/approx_kl", float(kl), global_step)
            # Flush at every log boundary so a killed/hung run still leaves
            # its scalars on disk (tensorboardX buffers otherwise).
            if hasattr(writer, "flush"):
                writer.flush()
            last_metrics = dict(loss=float(loss), avg_episodic_return=float(avg_ret))
            guard.beat()

    guard.close()
    params = jax.device_get(carry.agent_state.params)
    stats = dict(
        global_step=global_step,
        sps=int(run_steps / max(time.time() - start, 1e-9)),
        **(last_metrics or {}),
    )
    if cfg.save_model:
        _save_eval_publish(cfg, params, writer, algo="PPO")
    if own_writer:
        writer.close()
    return params, stats


def _save_eval_publish(cfg, params, writer, algo: str):
    """Reference post-training flow (cleanba_ppo.py:753-798): save the
    final model, run the 10-episode eval (on the C++ engine — the JAX games
    are rules-identical, so this doubles as a cross-engine check), and
    optionally publish to the HF zoo."""
    import os

    os.makedirs(cfg.run_path, exist_ok=True)
    model_path = os.path.join(cfg.run_path, f"{cfg.exp_name}.cleanba_model")
    save_model(model_path, cfg.asdict(), params)
    print(f"model saved to {model_path}")
    from cleanba_tpu.evaluate import evaluate

    episodic_returns = evaluate(
        model_path, cfg.env_id, eval_episodes=10,
        run_name=f"{cfg.run_name}-eval", cfg=cfg,
        capture_video=cfg.capture_video,
    )
    for idx, ret in enumerate(episodic_returns):
        writer.add_scalar("eval/episodic_return", ret, idx)
    if cfg.upload_model:
        from cleanba_tpu.zoo import push_to_hub

        repo_name = f"{cfg.env_id}-{cfg.exp_name}-seed{cfg.seed}"
        repo_id = f"{cfg.hf_entity}/{repo_name}" if cfg.hf_entity else repo_name
        push_to_hub(cfg, episodic_returns, repo_id, algo, cfg.run_path)


def main(argv=None):
    from cleanba_tpu.parallel.topology import maybe_init_distributed

    cfg = parse_cli(PPOConfig, argv, description="Anakin PPO: on-device envs, one XLA program per update")
    maybe_init_distributed(cfg)
    cfg.resolve(world_size=jax.process_count(), local_rank=jax.process_index())
    return train(cfg)


if __name__ == "__main__":
    main()
