"""Offline contract tests for the EnvPool adapter (VERDICT r2 weak #3).

The envpool wheel is absent in CI, so these tests inject a minimal fake
`envpool` module — NCHW uint8 Atari observations, gym-style sync step, async
recv/send sub-batches, `info` with `env_id`/`elapsed_step`/`terminated`, and
the envpool#239 bug (a `TimeLimit.truncated` field that stays False past the
step cap) — and run `EnvPoolBatchedEnv` through the BatchedEnv surface. This
executes the NHWC conversion, the info plumbing, and the truncation
workaround (envs/envpool_backend.py) without the wheel; the live-conformance
tests still run (elsewhere) only when the real wheel exists.
"""

import sys
import types

import numpy as np
import pytest


class _FakeSpace:
    def __init__(self, shape=None, dtype=None, n=None):
        self.shape = shape
        self.dtype = dtype
        self.n = n


class _FakeEnvPool:
    """Gym-style EnvPool double: NCHW obs, async sub-batches, envpool#239."""

    def __init__(self, env_id, num_envs, batch_size, seed, max_episode_steps, **kwargs):
        self.env_id = env_id
        self.num_envs = num_envs
        self.batch_size = batch_size
        self.max_episode_steps = max_episode_steps
        self.kwargs = kwargs
        self.observation_space = _FakeSpace(shape=(4, 84, 84), dtype=np.uint8)
        self.action_space = _FakeSpace(n=18)
        self._elapsed = np.zeros(num_envs, np.int64)
        self._rng = np.random.default_rng(seed)
        self._pending = None  # env ids awaiting recv (async mode)

    def _obs(self, env_ids):
        # Channel c holds constant value env_id*4+c so NCHW->NHWC conversion
        # is detectable per-pixel.
        obs = np.zeros((len(env_ids), 4, 84, 84), np.uint8)
        for row, e in enumerate(env_ids):
            for c in range(4):
                obs[row, c] = e * 4 + c
        return obs

    def _step_ids(self, env_ids):
        self._elapsed[env_ids] += 1
        reward = np.ones(len(env_ids), np.float32)
        terminated = self._elapsed[env_ids] % 7 == 0  # deterministic episode ends
        self._elapsed[env_ids][terminated] = 0
        # envpool#239: truncated stays False even past max_episode_steps.
        info = {
            "env_id": np.asarray(env_ids, np.int32),
            "elapsed_step": self._elapsed[env_ids].copy(),
            "reward": reward * 2.0,  # raw (pre-clip) reward
            "terminated": terminated,
            "TimeLimit.truncated": np.zeros(len(env_ids), bool),
        }
        return self._obs(env_ids), reward, terminated.astype(bool), info

    # -- sync --
    def reset(self):
        self._elapsed[:] = 0
        return self._obs(np.arange(self.num_envs))

    def step(self, actions):
        assert len(actions) == self.num_envs
        return self._step_ids(np.arange(self.num_envs))

    # -- async --
    def async_reset(self):
        self._elapsed[:] = 0
        self._pending = np.arange(self.batch_size)

    def recv(self):
        ids = self._pending
        assert ids is not None, "recv before async_reset/send"
        self._pending = None
        return self._step_ids(ids)

    def send(self, actions, env_ids):
        assert len(actions) == len(env_ids)
        # Next recv returns a rotated sub-batch (earliest-finished envs).
        self._pending = (np.asarray(env_ids) + self.batch_size) % self.num_envs

    def close(self):
        pass


@pytest.fixture
def fake_envpool(monkeypatch):
    mod = types.ModuleType("envpool")
    made = []

    def make(env_id, env_type, num_envs, batch_size, seed, **kwargs):
        assert env_type == "gym"
        env = _FakeEnvPool(env_id, num_envs, batch_size, seed,
                           kwargs.pop("max_episode_steps", 27000), **kwargs)
        made.append(env)
        return env

    mod.make = make
    mod._made = made
    monkeypatch.setitem(sys.modules, "envpool", mod)
    return mod


def test_adapter_converts_nchw_to_nhwc(fake_envpool):
    from cleanba_tpu.envs.envpool_backend import EnvPoolBatchedEnv

    env = EnvPoolBatchedEnv("Alien-v5", num_envs=3, seed=0)
    assert env.spec.obs_shape == (84, 84, 4)
    obs, info = env.reset()
    assert obs.shape == (3, 84, 84, 4) and obs.dtype == np.uint8
    # env e, channel c must hold e*4+c after the NCHW->NHWC transpose.
    for e in range(3):
        for c in range(4):
            assert (obs[e, :, :, c] == e * 4 + c).all()
    assert (info["env_ids"] == np.arange(3)).all()
    env.close()


def test_adapter_passes_machado_flags_to_make(fake_envpool):
    from cleanba_tpu.envs.envpool_backend import EnvPoolBatchedEnv

    EnvPoolBatchedEnv(
        "Breakout-v5", num_envs=2, seed=3, repeat_action_probability=0.25,
        episodic_life=False, noop_max=1, full_action_space=True,
        reward_clip=True, max_episode_steps=27000, frame_stack=4,
    )
    made = fake_envpool._made[-1]
    assert made.kwargs["repeat_action_probability"] == 0.25
    assert made.kwargs["episodic_life"] is False
    assert made.kwargs["noop_max"] == 1
    assert made.kwargs["full_action_space"] is True
    assert made.kwargs["stack_num"] == 4
    assert made.max_episode_steps == 27000


def test_adapter_derives_truncation_from_elapsed_step(fake_envpool):
    """envpool#239: TimeLimit.truncated is unreliable, so truncation must be
    derived as elapsed_step >= max_episode_steps (reference workaround,
    cleanba_ppo.py:326-328)."""
    from cleanba_tpu.envs.envpool_backend import EnvPoolBatchedEnv

    env = EnvPoolBatchedEnv("Breakout-v5", num_envs=2, seed=0, max_episode_steps=3)
    env.reset()
    truncs = []
    for _ in range(4):
        obs, reward, term, trunc, info = env.step(np.zeros(2, np.int32))
        truncs.append(trunc.copy())
        assert info["reward"].dtype == np.float32 and (info["reward"] == 2.0).all()
    # elapsed hits the cap of 3 on step 3 even though the fake's
    # TimeLimit.truncated stayed False throughout.
    assert truncs[2].all(), "cap reached but truncation not derived"
    assert not truncs[0].any() and not truncs[1].any()
    env.close()


def test_adapter_async_subbatch_roundtrip(fake_envpool):
    """IMPALA's async surface: recv returns sub-batches with env_ids; send
    routes actions back by id (reference cleanba_impala.py:352,365)."""
    from cleanba_tpu.envs.envpool_backend import EnvPoolBatchedEnv

    env = EnvPoolBatchedEnv("Pong-v5", num_envs=8, batch_size=4, seed=0)
    assert env.spec.batch_size == 4
    env.async_reset()
    seen = set()
    for _ in range(4):
        obs, reward, term, trunc, info = env.recv()
        ids = info["env_ids"]
        assert obs.shape == (4, 84, 84, 4)
        # Per-env payloads must carry their own env's observation.
        for row, e in enumerate(ids):
            assert (obs[row, :, :, 0] == e * 4).all()
        seen.update(ids.tolist())
        env.send(np.zeros(4, np.int32), ids)
    assert seen == set(range(8)), f"async rotation never covered the pool: {seen}"
    env.close()


def test_factory_auto_routes_nonnative_id_through_adapter(fake_envpool):
    """backend='auto' + a non-native id (Alien-v5) must build the EnvPool
    adapter when the wheel importable — end-to-end through make_env."""
    from cleanba_tpu.envs import make_env

    env = make_env("Alien-v5", seed=1, num_envs=2)()
    obs, info = env.reset()
    assert obs.shape == (2, 84, 84, 4)
    obs, reward, term, trunc, info = env.step(np.zeros(2, np.int32))
    assert reward.shape == (2,)
    env.close()
