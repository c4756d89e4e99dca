"""Async sub-batch IMPALA rollout alignment (the tpu.sh latency-hiding mode).

With `async_batch_size < num_envs` every recv covers an arbitrary
earliest-finished env subset; the rollout must reassemble time-major
[T+1, B] trajectories where column b is env b's own consecutive steps. A
fake async env whose observation encodes (env_id, step) makes any
misalignment (the round-2 bug: rows = raw recv batches) immediately visible.
"""

import queue
import threading

import numpy as np
import pytest

from cleanba_tpu.config import ImpalaConfig
from cleanba_tpu.parallel.topology import build_topology
from cleanba_tpu.runtime.agent import build_agent
from cleanba_tpu.runtime.rollout import impala_rollout_thread


class _FakeAsyncEnv:
    """Round-robin-ish async env: recv returns rotating sub-batches in a
    scrambled order; obs[..., 0] = env_id, obs[..., 1] = per-env step."""

    def __init__(self, num_envs, batch_size, obs_dim=4):
        self.num_envs = num_envs
        self.batch_size = batch_size
        self.obs_dim = obs_dim
        self.step_count = np.zeros(num_envs, np.int64)
        self._cursor = 0

    def async_reset(self):
        self._cursor = 0

    def recv(self):
        ids = (np.arange(self.batch_size) + self._cursor) % self.num_envs
        self._cursor = (self._cursor + self.batch_size) % self.num_envs
        ids = ids[::-1].copy()  # completion order is not id order
        obs = np.zeros((self.batch_size, self.obs_dim), np.float32)
        obs[:, 0] = ids
        obs[:, 1] = self.step_count[ids]
        reward = ids.astype(np.float32) / 10.0
        term = np.zeros(self.batch_size, bool)
        trunc = np.zeros(self.batch_size, bool)
        info = {
            "env_ids": ids.astype(np.int32),
            "elapsed_step": self.step_count[ids].copy(),
            "reward": reward,
        }
        return obs, reward, term, trunc, info

    def send(self, actions, env_ids):
        self.step_count[env_ids] += 1

    def close(self):
        pass


class _CaptureQueue:
    def __init__(self):
        self.payloads = []

    def put(self, payload, **kw):
        self.payloads.append(payload)


class _StaticParams:
    def __init__(self, params):
        self.params = params

    def get(self, update):
        return self.params


@pytest.mark.parametrize("batch_size", [8, 4, 2])
def test_async_subbatch_columns_are_per_env_time_series(batch_size):
    n_envs, T = 8, 6
    cfg = ImpalaConfig(
        env_id="CartPole-v1", network="mlp", hiddens=[16],
        local_num_envs=n_envs, async_batch_size=batch_size, num_steps=T,
        num_actor_threads=1, num_minibatches=2, total_timesteps=n_envs * T * 3,
        concurrency=True, log_frequency=10 ** 9, env_backend="python",
    )
    cfg.resolve()
    import jax

    topo = build_topology(cfg.actor_device_ids, cfg.learner_device_ids)
    agent = build_agent(cfg, 2, np.zeros((1, 4), np.float32), jax.random.PRNGKey(0))
    out_q = _CaptureQueue()
    impala_rollout_thread(
        jax.random.PRNGKey(1), cfg, lambda: _FakeAsyncEnv(n_envs, batch_size),
        agent, out_q, _StaticParams(agent.init_params),
        __import__("cleanba_tpu.utils.metrics", fromlist=["DummyWriter"]).DummyWriter(),
        topo, jax.devices()[0], 0,
    )
    assert len(out_q.payloads) == cfg.num_updates + 1
    prev_last_step = None
    for payload in out_q.payloads:
        storage = payload[3]
        obs = np.asarray(storage.obs)          # [T1, B, 4]
        T1, B = obs.shape[:2]
        assert B == n_envs
        env_col = obs[:, :, 0]
        step_col = obs[:, :, 1]
        # Column b holds env b only.
        assert (env_col == np.arange(n_envs)[None, :]).all(), "env columns mixed"
        # And its steps are consecutive down the time axis.
        assert (np.diff(step_col, axis=0) == 1).all(), "time axis not consecutive"
        # Rewards stay paired with their env (reward = env_id / 10).
        rew = np.asarray(storage.rewards)
        assert np.allclose(rew, np.arange(n_envs)[None, :] / 10.0)
        # Bootstrap carry: this update's first row is last update's last row.
        if prev_last_step is not None:
            assert (step_col[0] == prev_last_step).all(), "bootstrap row not carried"
        prev_last_step = step_col[-1]


class _StrictAsyncEnv(_FakeAsyncEnv):
    """Fake async env with REAL async-API semantics: an env appears in a recv
    batch only after its previous action was sent (it is 'stepping' until
    then). recv raises instead of blocking if fewer than batch_size envs are
    ready — in a single-threaded rollout that is a deadlock, which is exactly
    what a depth-clamping bug in the dispatch pipeline would cause."""

    def __init__(self, num_envs, batch_size, obs_dim=4):
        super().__init__(num_envs, batch_size, obs_dim)
        self.ready = list(range(num_envs))

    def async_reset(self):
        self._cursor = 0
        self.ready = list(range(self.num_envs))

    def recv(self):
        if len(self.ready) < self.batch_size:
            raise RuntimeError(
                f"recv deadlock: only {len(self.ready)} envs ready, "
                f"batch_size={self.batch_size} (pipeline over-parked envs)"
            )
        ids = np.asarray(self.ready[: self.batch_size][::-1], np.int64)
        self.ready = self.ready[self.batch_size:]
        obs = np.zeros((len(ids), self.obs_dim), np.float32)
        obs[:, 0] = ids
        obs[:, 1] = self.step_count[ids]
        reward = ids.astype(np.float32) / 10.0
        term = np.zeros(len(ids), bool)
        trunc = np.zeros(len(ids), bool)
        info = {
            "env_ids": ids.astype(np.int32),
            "elapsed_step": self.step_count[ids].copy(),
            "reward": reward,
        }
        return obs, reward, term, trunc, info

    def send(self, actions, env_ids):
        self.step_count[env_ids] += 1
        self.ready.extend(int(e) for e in env_ids)


@pytest.mark.parametrize("batch_size,depth", [(2, 2), (2, 4), (4, 2), (2, 16), (8, 4)])
def test_pipelined_dispatch_keeps_columns_aligned(batch_size, depth):
    """With inference_pipeline_depth > 1 (dispatch batch B before fetching
    batch A's actions) trajectories must still be per-env time series, and the
    depth must self-clamp so recv never starves (depth=16 > num_sub_batches
    and batch_size=8 == num_envs both exercise the clamp)."""
    n_envs, T = 8, 6
    cfg = ImpalaConfig(
        env_id="CartPole-v1", network="mlp", hiddens=[16],
        local_num_envs=n_envs, async_batch_size=batch_size, num_steps=T,
        inference_pipeline_depth=depth,
        num_actor_threads=1, num_minibatches=2, total_timesteps=n_envs * T * 3,
        concurrency=True, log_frequency=10 ** 9, env_backend="python",
    )
    cfg.resolve()
    import jax

    topo = build_topology(cfg.actor_device_ids, cfg.learner_device_ids)
    agent = build_agent(cfg, 2, np.zeros((1, 4), np.float32), jax.random.PRNGKey(0))
    out_q = _CaptureQueue()
    impala_rollout_thread(
        jax.random.PRNGKey(1), cfg, lambda: _StrictAsyncEnv(n_envs, batch_size),
        agent, out_q, _StaticParams(agent.init_params),
        __import__("cleanba_tpu.utils.metrics", fromlist=["DummyWriter"]).DummyWriter(),
        topo, jax.devices()[0], 0,
    )
    assert len(out_q.payloads) == cfg.num_updates + 1
    prev_last_step = None
    for payload in out_q.payloads:
        storage = payload[3]
        obs = np.asarray(storage.obs)
        env_col, step_col = obs[:, :, 0], obs[:, :, 1]
        assert (env_col == np.arange(n_envs)[None, :]).all(), "env columns mixed"
        assert (np.diff(step_col, axis=0) == 1).all(), "time axis not consecutive"
        assert np.allclose(np.asarray(storage.rewards), np.arange(n_envs)[None, :] / 10.0)
        if prev_last_step is not None:
            assert (step_col[0] == prev_last_step).all(), "bootstrap row not carried"
        prev_last_step = step_col[-1]


# ---------------------------------------------------------------------------
# Pipelined PPO rollout (VERDICT r4 #9: the IMPALA dispatch pipeline's PPO
# analogue) — same strict async-API fakes, plus the PPO-specific row shift:
# storage.rewards[t] must be the consequence of action_t (the reward that
# arrived with obs_{t+1}), and the payload must carry the bootstrap obs/done.
# ---------------------------------------------------------------------------


class _StrictAsyncEnvStepReward(_StrictAsyncEnv):
    """Reward arriving with an obs at per-env step s equals s — makes the
    PPO reward shift (rewards[t] = row[t+1].reward) checkable."""

    def recv(self):
        obs, _, term, trunc, info = super().recv()
        reward = info["elapsed_step"].astype(np.float32)
        info["reward"] = reward
        return obs, reward, term, trunc, info


@pytest.mark.parametrize("batch_size,depth", [(2, 2), (4, 2), (2, 16), (8, 4)])
def test_ppo_pipelined_rollout_alignment_and_reward_shift(batch_size, depth):
    from cleanba_tpu.config import PPOConfig
    from cleanba_tpu.runtime.rollout import ppo_rollout_thread_pipelined

    n_envs, T = 8, 6
    cfg = PPOConfig(
        env_id="CartPole-v1", network="mlp", hiddens=[16],
        local_num_envs=n_envs, async_batch_size=batch_size, num_steps=T,
        inference_pipeline_depth=depth,
        num_actor_threads=1, num_minibatches=2, update_epochs=1,
        total_timesteps=n_envs * T * 3,
        concurrency=True, log_frequency=10 ** 9, env_backend="python",
    )
    cfg.resolve()
    import jax

    topo = build_topology(cfg.actor_device_ids, cfg.learner_device_ids)
    agent = build_agent(cfg, 2, np.zeros((1, 4), np.float32), jax.random.PRNGKey(0))
    out_q = _CaptureQueue()
    ppo_rollout_thread_pipelined(
        jax.random.PRNGKey(1), cfg,
        lambda: _StrictAsyncEnvStepReward(n_envs, batch_size),
        agent, out_q, _StaticParams(agent.init_params),
        __import__("cleanba_tpu.utils.metrics", fromlist=["DummyWriter"]).DummyWriter(),
        topo, jax.devices()[0], 0,
    )
    assert len(out_q.payloads) == cfg.num_updates + 1
    prev_boot_step = None
    for payload in out_q.payloads:
        storage, boot_obs, boot_done = payload[3], payload[4], payload[5]
        obs = np.asarray(storage.obs)          # [T, B, 4]
        assert obs.shape[:2] == (T, n_envs)
        env_col, step_col = obs[:, :, 0], obs[:, :, 1]
        assert (env_col == np.arange(n_envs)[None, :]).all(), "env columns mixed"
        assert (np.diff(step_col, axis=0) == 1).all(), "time axis not consecutive"
        # PPO reward shift: rewards[t] arrived with obs_{t+1}.
        rew = np.asarray(storage.rewards)
        assert np.allclose(rew, step_col + 1.0), "rewards not shifted to row t+1"
        # Bootstrap obs is each env's T+1-th row, in env order.
        bobs = np.asarray(boot_obs)
        assert (bobs[:, 0] == np.arange(n_envs)).all()
        assert (bobs[:, 1] == step_col[-1] + 1.0).all(), "bootstrap row wrong step"
        assert np.asarray(boot_done).shape == (n_envs,)
        # Carry: this update's first row is last update's bootstrap row.
        if prev_boot_step is not None:
            assert (step_col[0] == prev_boot_step).all(), "bootstrap row not carried"
        prev_boot_step = bobs[:, 1]


def test_ppo_stacked_sub_inference_matches_full_pool():
    """ppo_inference_stacked_sub over two halves must evolve the same frame
    stacks as ppo_inference_stacked over the full pool."""
    import jax
    import jax.numpy as jnp

    from cleanba_tpu.config import PPOConfig

    cfg = PPOConfig(network="nature_cnn", local_num_envs=4)
    rng = np.random.default_rng(0)
    agent = build_agent(cfg, 4, np.zeros((1, 84, 84, 4), np.uint8), jax.random.PRNGKey(0))

    n = 4
    stack_full = jnp.asarray(rng.integers(0, 255, (n, 84, 84, 4)), jnp.uint8)
    stack_all = stack_full
    frames = rng.integers(0, 255, (n, 84, 84, 1)).astype(np.uint8)
    first = np.array([1.0, 0.0, 0.0, 1.0], np.float32)
    pa = np.zeros(n, np.int32)
    pr = np.zeros(n, np.float32)
    key = jax.random.PRNGKey(1)

    # Full pool reference.
    obs_ref, *_ = agent.ppo_inference_stacked(
        agent.init_params, frames, stack_full, first, pa, pr, key)

    # Two sub-batches through the sub variant (ids scrambled).
    for ids in (np.array([2, 0], np.int32), np.array([3, 1], np.int32)):
        stack_all, obs_sub, *_ = agent.ppo_inference_stacked_sub(
            agent.init_params, frames[ids], stack_all, first[ids],
            pa[ids], pr[ids], ids, key)
        assert np.array_equal(np.asarray(obs_sub), np.asarray(obs_ref)[ids])
    assert np.array_equal(np.asarray(stack_all), np.asarray(obs_ref))
