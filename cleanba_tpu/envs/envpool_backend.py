"""Optional EnvPool backend: drive real EnvPool (Atari-57 / Procgen-16)
through the framework's `BatchedEnv` protocol.

The reference's headline capability is "any EnvPool game id" (reference
make_env, cleanba/cleanba_ppo.py:126-146 — Machado-protocol flags straight
into `envpool.make`). This adapter restores that breadth when the `envpool`
wheel is installed: every Atari-57 / Procgen id trains through the same
rollout threads as the native C++ engine, because both speak `BatchedEnv`
(envs/api.py).

Deltas from raw EnvPool, matching this framework's conventions:
- Observations are converted to **NHWC** uint8 (EnvPool Atari emits NCHW and
  the reference transposes inside the network, cleanba_ppo.py:178; here the
  models are NHWC-native so the transpose happens once on the host).
- `step`/`recv` return the 5-tuple `(obs, reward, terminated, truncated,
  info)` with `info['env_ids'|'elapsed_step'|'reward']` — the same surface
  the native engine provides. Truncation is derived as
  `elapsed_step >= max_episode_steps` because EnvPool's
  `TimeLimit.truncated` is unreliable (envpool#239, the bug the reference
  works around at cleanba_ppo.py:326-328).

Not installed in this image — `envpool_available()` gates every use and the
factory raises a clear error if requested without the wheel.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from cleanba_tpu.envs.api import EnvSpec

__all__ = ["envpool_available", "EnvPoolBatchedEnv"]


def envpool_available() -> bool:
    try:
        import envpool  # noqa: F401

        return True
    except ImportError:
        return False


def _is_procgen_id(env_id: str) -> bool:
    # EnvPool procgen ids end in -v0 (e.g. CoinrunEasy-v0); Atari are -v5.
    return env_id.endswith("-v0")


class EnvPoolBatchedEnv:
    """`BatchedEnv` over `envpool.make(..., env_type="gym")` (sync + async)."""

    def __init__(
        self,
        env_id: str,
        num_envs: int,
        batch_size: int = 0,
        num_threads: int = 0,
        seed: int = 0,
        repeat_action_probability: float = 0.25,
        episodic_life: bool = False,
        noop_max: int = 1,
        full_action_space: bool = True,
        reward_clip: bool = True,
        max_episode_steps: int = 27000,
        frame_stack: int = 4,
    ):
        import envpool

        self._batch = batch_size if batch_size > 0 else num_envs
        kwargs: Dict = dict(
            env_type="gym",
            num_envs=num_envs,
            batch_size=self._batch,
            seed=seed,
        )
        if num_threads > 0:
            kwargs["num_threads"] = num_threads
        if not _is_procgen_id(env_id):
            # Machado/Espeholt Atari flags (reference cleanba_ppo.py:126-146).
            kwargs.update(
                episodic_life=episodic_life,
                repeat_action_probability=repeat_action_probability,
                noop_max=noop_max,
                full_action_space=full_action_space,
                max_episode_steps=max_episode_steps,
                reward_clip=reward_clip,
                stack_num=frame_stack,
            )
        self._envs = envpool.make(env_id, **kwargs)
        self._max_episode_steps = max_episode_steps

        obs_space = self._envs.observation_space
        shape = tuple(obs_space.shape)
        self._chw = len(shape) == 3 and shape[0] in (1, 3, 4) and shape[1] == shape[2]
        obs_shape = (shape[1], shape[2], shape[0]) if self._chw else shape
        self.spec = EnvSpec(
            env_id=env_id,
            num_envs=num_envs,
            batch_size=self._batch,
            obs_shape=obs_shape,
            obs_dtype=np.dtype(obs_space.dtype),
            num_actions=int(self._envs.action_space.n),
        )

    # -- layout -------------------------------------------------------------

    def _to_nhwc(self, obs: np.ndarray) -> np.ndarray:
        if self._chw:
            return np.ascontiguousarray(np.transpose(obs, (0, 2, 3, 1)))
        return obs

    def _info(self, info: Dict) -> Dict[str, np.ndarray]:
        elapsed = np.asarray(info["elapsed_step"])
        return {
            "env_ids": np.asarray(info["env_id"], np.int32),
            "elapsed_step": elapsed,
            "reward": np.asarray(info["reward"], np.float32),
        }

    # -- sync API -----------------------------------------------------------

    def reset(self) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        obs = self._envs.reset()
        if isinstance(obs, tuple):  # gym>=0.26 styles return (obs, info)
            obs = obs[0]
        info = {
            "env_ids": np.arange(self.spec.num_envs, dtype=np.int32),
            "elapsed_step": np.zeros(self.spec.num_envs, np.int32),
            "reward": np.zeros(self.spec.num_envs, np.float32),
        }
        return self._to_nhwc(obs), info

    def step(self, actions: np.ndarray):
        obs, reward, done, info = self._envs.step(np.asarray(actions))
        out = self._info(info)
        terminated = np.asarray(info["terminated"], bool)
        # envpool#239: TimeLimit.truncated is buggy; derive from elapsed_step
        # like the reference (cleanba_ppo.py:326-328).
        truncated = out["elapsed_step"] >= self._max_episode_steps
        del done
        return self._to_nhwc(obs), np.asarray(reward, np.float32), terminated, truncated, out

    # -- async API ----------------------------------------------------------

    def async_reset(self) -> None:
        self._envs.async_reset()

    def recv(self):
        obs, reward, done, info = self._envs.recv()
        out = self._info(info)
        terminated = np.asarray(info["terminated"], bool)
        truncated = out["elapsed_step"] >= self._max_episode_steps
        del done
        return self._to_nhwc(obs), np.asarray(reward, np.float32), terminated, truncated, out

    def send(self, actions: np.ndarray, env_ids: np.ndarray) -> None:
        self._envs.send(np.asarray(actions), np.asarray(env_ids))

    def close(self) -> None:
        try:
            self._envs.close()
        except Exception:
            pass
