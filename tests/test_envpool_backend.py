"""EnvPool backend adapter: factory routing (always testable) and live
protocol conformance (skipped unless the envpool wheel is installed).

Restores the reference's "any EnvPool id" breadth (reference make_env,
cleanba/cleanba_ppo.py:126-146) behind the framework's BatchedEnv protocol.
"""

import numpy as np
import pytest

from cleanba_tpu.envs import make_env
from cleanba_tpu.envs.envpool_backend import envpool_available

HAVE_ENVPOOL = envpool_available()


def _non_native_atari_id():
    """Pick an EnvPool Atari id that is guaranteed NOT in the native catalog,
    however large it grows: these ALE titles sit outside the Atari-57 suite
    the engine targets, so they stay EnvPool-only by design."""
    from cleanba_tpu.envs import NATIVE_ATARI_TASKS

    for candidate in ("AirRaid-v5", "Carnival-v5", "Adventure-v5", "Pooyan-v5"):
        if candidate not in NATIVE_ATARI_TASKS:
            return candidate
    raise AssertionError("all candidate ids are native now; extend the list")


def test_factory_routes_unknown_id_to_envpool_with_clear_error():
    """backend='auto' + a non-native Atari id must route to EnvPool, and the
    error without the wheel must say so (not a cryptic native-engine miss)."""
    thunk = make_env(_non_native_atari_id(), seed=1, num_envs=2)
    if HAVE_ENVPOOL:
        envs = thunk()
        assert envs.spec.num_actions >= 6
        envs.close()
    else:
        with pytest.raises(ValueError, match="envpool is not installed"):
            thunk()


def test_factory_explicit_envpool_backend_error_without_wheel():
    thunk = make_env("Breakout-v5", seed=1, num_envs=2, backend="envpool")
    if not HAVE_ENVPOOL:
        with pytest.raises(ValueError, match="envpool is not installed"):
            thunk()


def test_factory_native_ids_stay_native():
    """Native-engine ids must NOT silently fall through to EnvPool."""
    envs = make_env("Breakout-v5", seed=1, num_envs=2)()
    from cleanba_tpu.envs.native import NativeBatchedEnv

    assert isinstance(envs, NativeBatchedEnv)
    envs.close()


@pytest.mark.skipif(not HAVE_ENVPOOL, reason="envpool wheel not installed")
class TestLiveEnvPool:
    def test_sync_protocol_conformance(self):
        envs = make_env("Pong-v5", seed=3, num_envs=4)()
        obs, info = envs.reset()
        # NHWC layout with the frame stack in the last axis.
        assert obs.shape == (4, 84, 84, 4) and obs.dtype == np.uint8
        assert list(info["env_ids"]) == [0, 1, 2, 3]
        obs, rew, term, trunc, info = envs.step(np.zeros(4, np.int32))
        assert obs.shape == (4, 84, 84, 4)
        assert rew.shape == term.shape == trunc.shape == (4,)
        assert set(info) >= {"env_ids", "elapsed_step", "reward"}
        envs.close()

    def test_async_protocol_conformance(self):
        envs = make_env("Pong-v5", seed=3, num_envs=8, async_batch_size=4)()
        envs.async_reset()
        obs, rew, term, trunc, info = envs.recv()
        assert obs.shape[0] == 4
        envs.send(np.zeros(4, np.int32), info["env_ids"])
        obs2, *_ = envs.recv()
        assert obs2.shape[0] == 4
        envs.close()
