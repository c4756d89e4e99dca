"""Learner update engines: PPO and IMPALA under `shard_map` on the learner mesh.

TPU-native redesign of the reference's `multi_device_update = jax.pmap(...)`
(cleanba_ppo.py:656-660): one global `jax.jit` whose body is `shard_map`ped
over the 1-D "learner" mesh axis. Per-device semantics are kept *identical* to
the pmap version — local hstack of actor-thread shards, local GAE, local
per-minibatch advantage normalization and shuffling with a replicated key, and
an explicit `jax.lax.pmean` gradient all-reduce (cleanba_ppo.py:587-648) — so
learning curves are reproducible across chip counts, while XLA lowers the
pmean to ICI collectives and the whole update is one compiled program with
donated state (no per-call pmap dispatch overhead).

Model application flattens [T, B] to [(T*B)] before the conv trunk so the MXU
sees one large batch instead of a vmap over timesteps
(cf. cleanba_impala.py:585 which vmaps over T).
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple

import jax
import jax.numpy as jnp
from cleanba_tpu.runtime.train_state import TrainState

from cleanba_tpu.ops import compute_gae, impala_loss_from_outputs, ppo_loss_from_outputs
from cleanba_tpu.parallel.topology import LEARNER_AXIS, DeviceTopology
from cleanba_tpu.runtime.storage import ImpalaStorage, PPOStorage

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

P = jax.sharding.PartitionSpec

__all__ = ["PPOMetrics", "ImpalaMetrics", "make_ppo_update", "make_impala_update", "current_learning_rate"]


class PPOMetrics(NamedTuple):
    loss: jnp.ndarray
    pg_loss: jnp.ndarray
    v_loss: jnp.ndarray
    entropy_loss: jnp.ndarray
    approx_kl: jnp.ndarray


class ImpalaMetrics(NamedTuple):
    loss: jnp.ndarray
    pg_loss: jnp.ndarray
    v_loss: jnp.ndarray
    entropy_loss: jnp.ndarray


def _flat_apply(logits_and_value: Callable, params, obs_tb, prev_a_tb, prev_r_tb):
    """Apply the net to [T, B, ...] obs as one flattened [(T*B), ...] batch."""
    t, b = obs_tb.shape[:2]
    logits, value = logits_and_value(
        params,
        obs_tb.reshape((t * b,) + obs_tb.shape[2:]),
        prev_a_tb.reshape(t * b).astype(jnp.int32),
        prev_r_tb.reshape(t * b),
    )
    return logits.reshape(t, b, -1), value.reshape(t, b)


def make_ppo_update(cfg, topo: DeviceTopology, logits_and_value: Callable):
    """Build the jitted PPO update (reference single_device_update,
    cleanba_ppo.py:579-654, re-hosted under shard_map)."""

    num_mb = cfg.num_minibatches * cfg.gradient_accumulation_steps
    if getattr(cfg, "remat", False):
        # Trade FLOPs for HBM: recompute trunk activations in the backward
        # pass instead of storing them (large-minibatch conv backward would
        # otherwise exceed HBM; the MXU has FLOPs to spare here).
        logits_and_value = jax.checkpoint(logits_and_value)

    def ppo_loss(params, obs, prev_a, prev_r, actions, behavior_logprobs, advantages, target_values):
        logits, new_values = logits_and_value(params, obs, prev_a.astype(jnp.int32), prev_r)
        return ppo_loss_from_outputs(
            logits, new_values, actions, behavior_logprobs, advantages, target_values,
            clip_coef=cfg.clip_coef, ent_coef=cfg.ent_coef, vf_coef=cfg.vf_coef,
        )

    loss_grad_fn = jax.value_and_grad(ppo_loss, has_aux=True)

    def local_update(
        agent_state: TrainState,
        storages: List[PPOStorage],
        next_obss: List[jnp.ndarray],
        next_dones: List[jnp.ndarray],
        key: jax.Array,
    ):
        # Re-join this device's actor-thread shards along the env axis
        # (reference hstack, cleanba_ppo.py:587-589).
        storage = jax.tree.map(lambda *x: jnp.concatenate(x, axis=1), *storages)
        next_obs = jnp.concatenate(next_obss)
        next_done = jnp.concatenate(next_dones)

        # Bootstrap prev inputs: the last step's action/reward feed V(s_T)
        # unless the bootstrap obs starts a fresh episode.
        boot_prev_a = (storage.actions[-1] * (1.0 - next_done)).astype(jnp.int32)
        boot_prev_r = storage.rewards[-1] * (1.0 - next_done)
        _, next_value = logits_and_value(agent_state.params, next_obs, boot_prev_a, boot_prev_r)
        advantages, target_values = compute_gae(
            storage.rewards, storage.values, storage.dones,
            next_value, next_done, cfg.gamma, cfg.gae_lambda,
        )
        if cfg.norm_adv:
            # Per-minibatch-group normalization over (time, env-in-group) axes
            # (reference cleanba_ppo.py:592-595).
            t = advantages.shape[0]
            a = advantages.reshape(t, cfg.num_minibatches, -1)
            a = (a - a.mean((0, -1), keepdims=True)) / (a.std((0, -1), keepdims=True) + 1e-8)
            advantages = a.reshape(t, -1)

        def flatten(x):
            return x.reshape((-1,) + x.shape[2:])

        flat_storage = jax.tree.map(flatten, storage)
        flat_adv = flatten(advantages)
        flat_tgt = flatten(target_values)

        def update_epoch(carry, _):
            agent_state, key = carry
            key, subkey = jax.random.split(key)
            # Shuffle by *indices* and gather one minibatch at a time inside
            # the scan — same selection as the reference's materialized
            # shuffled copies (cleanba_ppo.py:597-615) without ever holding a
            # second copy of the obs tensor in HBM.
            n = flat_adv.shape[0]
            mb_indices = jax.random.permutation(subkey, n).reshape(num_mb, -1)

            def update_minibatch(agent_state, idx):
                take = lambda x: jnp.take(x, idx, axis=0)
                (loss, aux), grads = loss_grad_fn(
                    agent_state.params,
                    take(flat_storage.obs),
                    take(flat_storage.prev_actions),
                    take(flat_storage.prev_rewards),
                    take(flat_storage.actions),
                    take(flat_storage.logprobs),
                    take(flat_adv),
                    take(flat_tgt),
                )
                grads = jax.lax.pmean(grads, axis_name=LEARNER_AXIS)
                agent_state = agent_state.apply_gradients(grads=grads)
                return agent_state, PPOMetrics(loss, aux.pg_loss, aux.v_loss, aux.entropy_loss, aux.approx_kl)

            agent_state, metrics = jax.lax.scan(update_minibatch, agent_state, mb_indices)
            return (agent_state, key), metrics

        (agent_state, key), metrics = jax.lax.scan(
            update_epoch, (agent_state, key), (), length=cfg.update_epochs
        )
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, LEARNER_AXIS).mean(), metrics)
        return agent_state, metrics, key

    mesh = topo.learner_mesh
    batch = P(None, LEARNER_AXIS)
    env0 = P(LEARNER_AXIS)
    sharded_update = shard_map(
        local_update,
        mesh=mesh,
        in_specs=(P(), batch, env0, env0, P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    # Donate the trajectory buffers (consumed once, obs dominate HBM); the
    # small state is NOT donated — device_put can alias buffers, so donating
    # state would invalidate the actor threads' param copies in the
    # colocated-chip case.
    return jax.jit(sharded_update, donate_argnums=(1, 2, 3))


def make_impala_update(cfg, topo: DeviceTopology, logits_and_value: Callable):
    """Build the jitted IMPALA update (reference single_device_update,
    cleanba_impala.py:599-639, re-hosted under shard_map).

    Minibatches split along the env axis only — the time axis stays whole for
    V-trace (cleanba_impala.py:627-632).
    """

    num_mb = cfg.num_minibatches * cfg.gradient_accumulation_steps
    if getattr(cfg, "remat", False):
        logits_and_value = jax.checkpoint(logits_and_value)  # see PPO note

    def impala_loss(params, obs, prev_a, prev_r, actions, logitss, rewards, dones, firststeps):
        pi_logits, values = _flat_apply(logits_and_value, params, obs, prev_a, prev_r)
        return impala_loss_from_outputs(
            pi_logits, values, logitss, actions, rewards, dones, firststeps,
            gamma=cfg.gamma, ent_coef=cfg.ent_coef, vf_coef=cfg.vf_coef,
            lambda_=cfg.vtrace_lambda,
            clip_rho_threshold=cfg.vtrace_rho_clip,
            clip_pg_rho_threshold=cfg.vtrace_c_clip,
        )

    loss_grad_fn = jax.value_and_grad(impala_loss, has_aux=True)

    def local_update(agent_state: TrainState, storages: List[ImpalaStorage], key: jax.Array):
        storage = jax.tree.map(lambda *x: jnp.concatenate(x, axis=1), *storages)

        # Contiguous env-block minibatches (cleanba_impala.py:627-632), sliced
        # lazily inside the scan (no [num_mb, ...] copy of the obs in HBM).
        b_local = storage.rewards.shape[1]
        mb_envs = b_local // num_mb

        def update_minibatch(agent_state, mb_start):
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, mb_start, mb_envs, axis=1)
            (loss, aux), grads = loss_grad_fn(
                agent_state.params,
                sl(storage.obs),
                sl(storage.prev_actions),
                sl(storage.prev_rewards),
                sl(storage.actions),
                sl(storage.logitss),
                sl(storage.rewards),
                sl(storage.dones),
                sl(storage.firststeps),
            )
            grads = jax.lax.pmean(grads, axis_name=LEARNER_AXIS)
            agent_state = agent_state.apply_gradients(grads=grads)
            return agent_state, ImpalaMetrics(loss, aux.pg_loss, aux.v_loss, aux.entropy_loss)

        agent_state, metrics = jax.lax.scan(
            update_minibatch, agent_state, jnp.arange(num_mb) * mb_envs
        )
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, LEARNER_AXIS).mean(), metrics)
        return agent_state, metrics, key

    mesh = topo.learner_mesh
    sharded_update = shard_map(
        local_update,
        mesh=mesh,
        in_specs=(P(), P(None, LEARNER_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded_update, donate_argnums=(1,))  # see PPO note above


def current_learning_rate(agent_state: TrainState) -> float:
    """Read the injected LR out of the MultiSteps(chain(clip, inject(...)))
    optimizer state for `charts/learning_rate` (reference cleanba_ppo.py:737)."""
    state = agent_state.opt_state
    inner = getattr(state, "inner_opt_state", state)
    try:
        return float(inner[1].hyperparams["learning_rate"])
    except (TypeError, IndexError, KeyError, AttributeError):
        for leaf in _iter_states(inner):
            hp = getattr(leaf, "hyperparams", None)
            if hp and "learning_rate" in hp:
                return float(hp["learning_rate"])
    return float("nan")


def _iter_states(state):
    yield state
    if isinstance(state, (tuple, list)):
        for s in state:
            yield from _iter_states(s)
