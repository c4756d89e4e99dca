"""Anakin-architecture IMPALA: on-device envs + V-trace, one XLA program/update.

The V-trace twin of `cleanba_tpu/train_ppo_anakin.py`: the T-step rollout
(storing behaviour logits), the T+1 bootstrap-row bookkeeping, and the
env-axis minibatched V-trace update (time axis kept whole) all compile into a
single shard_map program over the device mesh.

Algorithm semantics match the Sebulba IMPALA trainer exactly
(runtime/learner.py make_impala_update; reference cleanba/cleanba_impala.py):
- the bootstrap row is the last transition of the previous update, carried
  across iterations (reference cleanba_impala.py:327-329, 415-416);
- minibatches split along the env axis only (cleanba_impala.py:627-632);
- sum-reduced, firststep-masked losses and PyTorch-style RMSProp
  (ops/losses.py, ops/optim.py).

In Anakin the behaviour policy is the current policy (no actor lag), so the
V-trace importance ratios are 1 in exact arithmetic; the correction machinery
is retained for parity and for configs that introduce staleness.

    python -m cleanba_tpu.train_impala_anakin --env-id Breakout-v5
"""

from __future__ import annotations

import random
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.config import ImpalaConfig
from cleanba_tpu.envs import PROTOCOLS
from cleanba_tpu.envs.jax_engine import make_jax_env
from cleanba_tpu.ops import impala_loss_from_outputs, make_impala_optimizer, sample_gumbel
from cleanba_tpu.runtime.agent import build_agent
from cleanba_tpu.runtime.learner import ImpalaMetrics, current_learning_rate
from cleanba_tpu.runtime.train_state import TrainState
from cleanba_tpu.train_ppo_anakin import AXIS, EpisodeStatsState
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

__all__ = ["main", "build_train_step", "make_impala_anakin_state"]


class ImpalaRow(NamedTuple):
    """One time-row of the trajectory (the reference's Transition,
    cleanba_impala.py:256-265, minus host-only fields)."""

    obs: jax.Array
    action: jax.Array
    logits: jax.Array
    reward: jax.Array
    done: jax.Array       # done observed WITH this obs (pre-action)
    firststep: jax.Array


class ImpalaCarry(NamedTuple):
    agent_state: TrainState
    env_state: object
    obs: jax.Array
    next_done: jax.Array
    next_first: jax.Array
    next_reward: jax.Array  # reward that ARRIVED with `obs` (reference recv tuple)
    boot_row: ImpalaRow     # last row of the previous update (bootstrap carry)
    ep_stats: EpisodeStatsState
    key: jax.Array


def build_train_step(cfg, env, mesh, agent, n_local_envs: int):
    logits_and_value = agent.logits_and_value
    if getattr(cfg, "remat", False):
        logits_and_value = jax.checkpoint(logits_and_value)
    num_mb = cfg.num_minibatches * cfg.gradient_accumulation_steps
    n_dev = mesh.devices.size
    assert n_local_envs % n_dev == 0 and (n_local_envs // n_dev) % num_mb == 0, (
        f"envs per device ({n_local_envs}/{n_dev}) must divide num_minibatches ({num_mb})"
    )
    v_step = jax.vmap(env.step)

    def flat_apply(params, obs_tb):
        t, b = obs_tb.shape[:2]
        logits, value = logits_and_value(
            params, obs_tb.reshape((t * b,) + obs_tb.shape[2:])
        )
        return logits.reshape(t, b, -1), value.reshape(t, b)

    def impala_loss(params, obs, actions, mu_logits, rewards, dones, firststeps):
        pi_logits, values = flat_apply(params, obs)
        return impala_loss_from_outputs(
            pi_logits, values, mu_logits, actions, rewards, dones, firststeps,
            gamma=cfg.gamma, ent_coef=cfg.ent_coef, vf_coef=cfg.vf_coef,
            lambda_=cfg.vtrace_lambda,
            clip_rho_threshold=cfg.vtrace_rho_clip,
            clip_pg_rho_threshold=cfg.vtrace_c_clip,
        )

    loss_grad_fn = jax.value_and_grad(impala_loss, has_aux=True)

    def sample_step(params, env_state, obs, done, first, arrived_reward, key):
        """One env step. The stored row pairs obs_t with the reward/done that
        ARRIVED with it (the reference's recv-tuple convention,
        cleanba_impala.py:352-380; the loss slices [:-1] accordingly)."""
        key, sk = jax.random.split(key)
        logits, _ = logits_and_value(params, obs)
        action, _ = sample_gumbel(sk, logits)
        row = ImpalaRow(obs=obs, action=action, logits=logits,
                        reward=arrived_reward, done=done, firststep=first)
        env_state, next_obs, reward, raw_reward, term, trunc, nxt_first = v_step(
            env_state, action
        )
        new_done = (term | trunc).astype(jnp.float32)
        return (env_state, next_obs, new_done, nxt_first.astype(jnp.float32),
                reward, row, raw_reward, key)

    def local_step(agent_state, env_state, obs, next_done, next_first,
                   next_reward, boot_row, ep_stats, key):
        key = key[0]
        params = agent_state.params

        def rollout_body(rc, _):
            env_state, obs, done, first, arrived_r, ep_stats, key = rc
            env_state, obs, done2, first2, arrived_r2, row, raw_r, key = sample_step(
                params, env_state, obs, done, first, arrived_r, key
            )
            ep_stats = ep_stats.update(raw_r, done2)
            return (env_state, obs, done2, first2, arrived_r2, ep_stats, key), row

        (env_state, obs, next_done, next_first, next_reward, ep_stats, key), rows = jax.lax.scan(
            rollout_body,
            (env_state, obs, next_done, next_first, next_reward, ep_stats, key),
            (), length=cfg.num_steps,
        )
        # Prepend the carried bootstrap row -> [T+1, B, ...]
        # (reference storage carry, cleanba_impala.py:415-416).
        full = jax.tree.map(
            lambda c, r: jnp.concatenate([c[None], r], axis=0), boot_row, rows
        )
        new_boot = jax.tree.map(lambda r: r[-1], rows)

        # Env-axis minibatches, contiguous blocks, T kept whole.
        b_local = full.reward.shape[1]
        mb_envs = b_local // num_mb

        def update_minibatch(agent_state, mb_start):
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, mb_start, mb_envs, axis=1)
            (loss, aux), grads = loss_grad_fn(
                agent_state.params,
                sl(full.obs), sl(full.action), sl(full.logits),
                sl(full.reward), sl(full.done), sl(full.firststep),
            )
            grads = jax.lax.pmean(grads, AXIS)
            agent_state = agent_state.apply_gradients(grads=grads)
            return agent_state, ImpalaMetrics(loss, aux.pg_loss, aux.v_loss, aux.entropy_loss)

        agent_state, metrics = jax.lax.scan(
            update_minibatch, agent_state, jnp.arange(num_mb) * mb_envs
        )
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, AXIS).mean(), metrics)
        charts = (
            jax.lax.pmean(ep_stats.returned_episode_returns.mean(), AXIS),
            jax.lax.pmean(ep_stats.returned_episode_lengths.mean(), AXIS),
        )
        return (agent_state, env_state, obs, next_done, next_first, next_reward,
                new_boot, ep_stats, key[None], metrics, charts)

    env_spec = P(AXIS)
    row_spec = ImpalaRow(obs=env_spec, action=env_spec, logits=env_spec,
                         reward=env_spec, done=env_spec, firststep=env_spec)
    specs = (P(), env_spec, env_spec, env_spec, env_spec, env_spec, row_spec,
             env_spec, P(AXIS))
    sharded = shard_map(
        local_step, mesh=mesh, in_specs=specs,
        out_specs=(*specs, P(), P()), check_vma=False,
    )
    inner = jax.jit(sharded)  # no donation: axon shard_map aliasing bug (see PPO)

    def step(carry: ImpalaCarry):
        out = inner(*carry)
        return ImpalaCarry(*out[:9]), out[9], out[10]

    return step, sample_step


def make_impala_anakin_state(cfg, env, mesh, agent, key: jax.Array,
                             sample_step) -> ImpalaCarry:
    n_dev = mesh.devices.size
    n_envs = cfg.local_num_envs * cfg.num_actor_threads * max(cfg.world_size, 1)
    assert n_envs % n_dev == 0
    env_sharding = jax.sharding.NamedSharding(mesh, P(AXIS))
    rep = jax.sharding.NamedSharding(mesh, P())

    key, env_key, carry_key, boot_key = jax.random.split(key, 4)
    env_keys = jax.random.split(env_key, n_envs)
    env_state, obs = jax.jit(
        jax.vmap(env.reset), out_shardings=(env_sharding, env_sharding)
    )(env_keys)

    agent_state = TrainState.create(params=agent.init_params, tx=make_impala_optimizer(cfg))
    agent_state = jax.device_put(agent_state, rep)

    # One priming env step builds the initial bootstrap row (the reference's
    # extra row on the very first update, cleanba_impala.py:327-329).
    zeros = jnp.zeros((n_envs,), jnp.float32)
    env_state, obs, next_done, next_first, next_reward, boot_row, _, _ = jax.jit(
        sample_step
    )(agent_state.params, env_state, obs, zeros,
      jnp.ones((n_envs,), jnp.float32), zeros, boot_key)

    per_dev_keys = jax.device_put(jax.random.split(carry_key, n_dev), env_sharding)
    put = lambda x: jax.device_put(x, env_sharding)
    return ImpalaCarry(
        agent_state=agent_state,
        env_state=jax.device_put(env_state, env_sharding),
        obs=put(obs),
        next_done=put(next_done),
        next_first=put(next_first),
        next_reward=put(next_reward),
        boot_row=jax.tree.map(put, boot_row),
        ep_stats=jax.device_put(EpisodeStatsState.zeros(n_envs), env_sharding),
        key=per_dev_keys,
    )


def train(cfg: ImpalaConfig, devices=None, writer=None):
    if devices is None:
        devices = jax.devices() if cfg.distributed else jax.local_devices()
    mesh = jax.sharding.Mesh(np.array(devices), (AXIS,))

    random.seed(cfg.seed)
    np.random.seed(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    key, agent_key = jax.random.split(key)

    proto = dict(PROTOCOLS.get(cfg.env_protocol, PROTOCOLS["machado"]))
    env = make_jax_env(cfg.env_id, proto)
    sample_obs = np.zeros(
        (1, *env.obs_shape), np.uint8 if env.obs_dtype == jnp.uint8 else np.float32
    )
    agent = build_agent(
        cfg, env.num_actions, sample_obs, agent_key,
        compute_dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
    )

    n_envs = cfg.local_num_envs * cfg.num_actor_threads * max(cfg.world_size, 1)
    train_step, sample_step = build_train_step(cfg, env, mesh, agent, n_envs)
    carry = make_impala_anakin_state(cfg, env, mesh, agent, key, sample_step)

    start_update, global_step = 1, 0
    if cfg.resume:
        ckpt = latest_checkpoint(cfg.run_path)
        if ckpt:
            agent_state, start_update, global_step = restore_checkpoint(
                ckpt, carry.agent_state
            )
            rep = jax.sharding.NamedSharding(mesh, P())
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
            loss, pg, v, ent = jax.device_get(
                (metrics.loss, metrics.pg_loss, metrics.v_loss, metrics.entropy_loss)
            )
            avg_ret, avg_len = jax.device_get(charts)
            sps = int(run_steps / max(time.time() - start, 1e-9))
            print(f"global_step={global_step}, avg_episodic_return={avg_ret:.2f}, SPS={sps}")
            writer.add_scalar("charts/avg_episodic_return", float(avg_ret), global_step)
            writer.add_scalar("charts/avg_episodic_length", float(avg_len), global_step)
            writer.add_scalar("charts/SPS", sps, global_step)
            writer.add_scalar("charts/learning_rate",
                              current_learning_rate(carry.agent_state), global_step)
            writer.add_scalar("losses/loss", float(loss), global_step)
            writer.add_scalar("losses/policy_loss", float(pg), global_step)
            writer.add_scalar("losses/value_loss", float(v), global_step)
            writer.add_scalar("losses/entropy", float(ent), global_step)
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
        from cleanba_tpu.train_ppo_anakin import _save_eval_publish

        _save_eval_publish(cfg, params, writer, algo="IMPALA")
    if own_writer:
        writer.close()
    return params, stats


def main(argv=None):
    from cleanba_tpu.parallel.topology import maybe_init_distributed

    cfg = parse_cli(ImpalaConfig, argv,
                    description="Anakin IMPALA: on-device envs + V-trace, one XLA program per update")
    maybe_init_distributed(cfg)
    cfg.resolve(world_size=jax.process_count(), local_rank=jax.process_index())
    return train(cfg)


if __name__ == "__main__":
    main()
