"""Learner update tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleanba_tpu.config import ImpalaConfig, PPOConfig
from cleanba_tpu.ops import make_impala_optimizer, make_ppo_optimizer
from cleanba_tpu.parallel.sharding import ship_to_learners
from cleanba_tpu.parallel.topology import LEARNER_AXIS, DeviceTopology
from cleanba_tpu.runtime.agent import build_agent
from cleanba_tpu.runtime.learner import make_impala_update, make_ppo_update
from cleanba_tpu.runtime.storage import ImpalaStorage, PPOStorage
from cleanba_tpu.runtime.train_state import TrainState
from jax.sharding import Mesh


def make_topo(n):
    devices = jax.devices()[:n]
    return DeviceTopology(
        world_size=1, local_rank=0,
        actor_devices=[devices[0]], learner_devices=devices,
        global_learner_devices=devices,
        learner_mesh=Mesh(np.array(devices), (LEARNER_AXIS,)),
    )


def mlp_cfg(cls, n_learners, **kw):
    cfg = cls(
        network="mlp", hiddens=[32], local_num_envs=8, num_steps=8,
        num_actor_threads=1, num_minibatches=2, total_timesteps=8 * 8 * 4,
        learner_device_ids=list(range(n_learners)), **kw,
    )
    cfg.resolve()
    return cfg


def ppo_storage(rng, T, B):
    return PPOStorage(
        obs=rng.normal(size=(T, B, 4)).astype(np.float32),
        dones=np.zeros((T, B), np.float32),
        actions=rng.integers(0, 2, size=(T, B)).astype(np.int32),
        logprobs=np.full((T, B), -np.log(2), np.float32),
        values=rng.normal(size=(T, B)).astype(np.float32),
        env_ids=np.tile(np.arange(B, dtype=np.int32), (T, 1)),
        rewards=rng.normal(size=(T, B)).astype(np.float32),
        truncations=np.zeros((T, B), np.float32),
        terminations=np.zeros((T, B), np.float32),
        firststeps=np.zeros((T, B), np.float32),
        prev_actions=np.zeros((T, B), np.int32),
        prev_rewards=np.zeros((T, B), np.float32),
    )


@pytest.mark.parametrize("n_learners", [1, 4])
def test_ppo_update_runs_and_learns_shape(eight_cpu_devices, n_learners):
    topo = make_topo(n_learners)
    cfg = mlp_cfg(PPOConfig, n_learners, update_epochs=2)
    agent = build_agent(cfg, 2, np.zeros((1, 4), np.float32), jax.random.PRNGKey(0))
    state = TrainState.create(params=agent.init_params, tx=make_ppo_optimizer(cfg))
    state = jax.device_put(state, topo.replicated())
    update = make_ppo_update(cfg, topo, agent.logits_and_value)

    rng = np.random.default_rng(0)
    T, B = cfg.num_steps, cfg.local_num_envs
    storage = ship_to_learners(ppo_storage(rng, T, B), topo, env_axis=1)
    next_obs, next_done = ship_to_learners(
        (rng.normal(size=(B, 4)).astype(np.float32), np.zeros(B, np.float32)), topo, env_axis=0
    )
    key = jax.device_put(jax.random.PRNGKey(1), topo.replicated())

    p_before = jax.device_get(state.params)
    state, metrics, key = update(state, [storage], [next_obs], [next_done], key)
    assert np.isfinite(float(metrics.loss))
    assert np.isfinite(float(metrics.approx_kl))
    p_after = jax.device_get(state.params)
    diffs = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), p_before, p_after)
    assert max(jax.tree.leaves(diffs)) > 0  # params moved
    # step counter advanced by epochs * minibatches
    assert int(jax.device_get(state.step)) == cfg.update_epochs * cfg.num_minibatches


def test_ppo_update_deterministic(eight_cpu_devices):
    topo = make_topo(2)
    cfg = mlp_cfg(PPOConfig, 2, update_epochs=1)
    agent = build_agent(cfg, 2, np.zeros((1, 4), np.float32), jax.random.PRNGKey(0))

    results = []
    for _ in range(2):
        state = TrainState.create(params=agent.init_params, tx=make_ppo_optimizer(cfg))
        state = jax.device_put(state, topo.replicated())
        update = make_ppo_update(cfg, topo, agent.logits_and_value)
        rng = np.random.default_rng(7)
        T, B = cfg.num_steps, cfg.local_num_envs
        storage = ship_to_learners(ppo_storage(rng, T, B), topo, env_axis=1)
        next_obs, next_done = ship_to_learners(
            (rng.normal(size=(B, 4)).astype(np.float32), np.zeros(B, np.float32)), topo, env_axis=0
        )
        key = jax.device_put(jax.random.PRNGKey(3), topo.replicated())
        state, metrics, _ = update(state, [storage], [next_obs], [next_done], key)
        results.append(jax.device_get(state.params))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        results[0], results[1],
    )


@pytest.mark.parametrize("n_learners", [1, 2])
def test_impala_update_runs(eight_cpu_devices, n_learners):
    topo = make_topo(n_learners)
    cfg = mlp_cfg(ImpalaConfig, n_learners)
    A = 2
    agent = build_agent(cfg, A, np.zeros((1, 4), np.float32), jax.random.PRNGKey(0))
    state = TrainState.create(params=agent.init_params, tx=make_impala_optimizer(cfg))
    state = jax.device_put(state, topo.replicated())
    update = make_impala_update(cfg, topo, agent.logits_and_value)

    rng = np.random.default_rng(0)
    T, B = cfg.num_steps + 1, cfg.local_num_envs
    storage = ImpalaStorage(
        obs=rng.normal(size=(T, B, 4)).astype(np.float32),
        dones=np.zeros((T, B), np.float32),
        actions=rng.integers(0, A, size=(T, B)).astype(np.int32),
        logitss=rng.normal(size=(T, B, A)).astype(np.float32),
        env_ids=np.tile(np.arange(B, dtype=np.int32), (T, 1)),
        rewards=rng.normal(size=(T, B)).astype(np.float32),
        truncations=np.zeros((T, B), np.float32),
        terminations=np.zeros((T, B), np.float32),
        firststeps=np.zeros((T, B), np.float32),
        prev_actions=np.zeros((T, B), np.int32),
        prev_rewards=np.zeros((T, B), np.float32),
    )
    sharded = ship_to_learners(storage, topo, env_axis=1)
    key = jax.device_put(jax.random.PRNGKey(1), topo.replicated())
    state, metrics, key = update(state, [sharded], key)
    assert np.isfinite(float(metrics.loss))
    assert int(jax.device_get(state.step)) == cfg.num_minibatches


def test_ship_to_learners_shard_layout(eight_cpu_devices):
    """Payload sharding round trip: device shards must equal np.split along the
    env axis (the reference's prepare_data contract, cleanba_ppo.py:276-278)."""
    topo = make_topo(4)
    x = np.arange(2 * 8 * 3, dtype=np.float32).reshape(2, 8, 3)
    arr = ship_to_learners(x, topo, env_axis=1)
    expected_shards = np.split(x, 4, axis=1)
    for shard, expected in zip(arr.addressable_shards, expected_shards):
        np.testing.assert_array_equal(np.asarray(shard.data), expected)
    np.testing.assert_array_equal(np.asarray(arr), x)
