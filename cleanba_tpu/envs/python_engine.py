"""Pure-NumPy batched CartPole engine — fallback + parity oracle.

Two roles:
1. Fallback when the native C++ engine is not built (image tasks require the
   native engine; CartPole does not).
2. Independent oracle for bit-exactness tests of the C++ CartPole: both sides
   use the same PCG32 stream and float32 op order, so trajectories must match
   exactly (tests/test_envs_native.py).

Dynamics follow gymnasium's CartPole-v1 (euler integration, the standard
Barto-Sutton-Anderson constants), vectorized over the env axis.
"""

from __future__ import annotations

import queue
from typing import Dict, Tuple

import numpy as np

from cleanba_tpu.envs.api import BatchedEnv, EnvSpec, StepOutput

__all__ = ["PyCartPoleEnv", "PCG32"]


class PCG32:
    """PCG-XSH-RR 32-bit generator; mirrored bit-for-bit in csrc/common/rng.h."""

    MULT = 6364136223846793005
    INC = 1442695040888963407
    MASK = (1 << 64) - 1

    def __init__(self, seed: int):
        self.state = 0
        self._next()
        self.state = (self.state + (seed & self.MASK)) & self.MASK
        self._next()

    def _next(self) -> int:
        old = self.state
        self.state = (old * self.MULT + self.INC) & self.MASK
        xorshifted = ((old >> 18) ^ old) >> 27 & 0xFFFFFFFF
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF

    def next_uint32(self) -> int:
        return self._next()

    def uniform(self) -> np.float32:
        """float32 in [0, 1): top 24 bits / 2^24 (matches the C++ side)."""
        return np.float32(self._next() >> 8) * np.float32(1.0 / 16777216.0)


_GRAVITY = np.float32(9.8)
_MASSCART = np.float32(1.0)
_MASSPOLE = np.float32(0.1)
_TOTAL_MASS = _MASSPOLE + _MASSCART
_LENGTH = np.float32(0.5)
_POLEMASS_LENGTH = _MASSPOLE * _LENGTH
_FORCE_MAG = np.float32(10.0)
_TAU = np.float32(0.02)
_THETA_THRESHOLD = np.float32(12 * 2 * np.pi / 360)
_X_THRESHOLD = np.float32(2.4)


class PyCartPoleEnv(BatchedEnv):
    """Batched CartPole-v1 with EnvPool-style auto-reset, sync + async APIs."""

    def __init__(
        self,
        num_envs: int,
        batch_size: int = 0,
        seed: int = 0,
        max_episode_steps: int = 500,
        **_unused,
    ):
        batch_size = batch_size if batch_size > 0 else num_envs
        self.spec = EnvSpec(
            env_id="CartPole-v1",
            num_envs=num_envs,
            batch_size=batch_size,
            obs_shape=(4,),
            obs_dtype=np.dtype(np.float32),
            num_actions=2,
        )
        self.max_episode_steps = max_episode_steps
        self._rngs = [PCG32(seed + i) for i in range(num_envs)]
        self._state = np.zeros((num_envs, 4), np.float32)
        self._elapsed = np.zeros(num_envs, np.int32)
        self._pending: "queue.Queue" = queue.Queue()

    # -- helpers --
    def _reset_env(self, i: int) -> None:
        rng = self._rngs[i]
        for j in range(4):
            self._state[i, j] = rng.uniform() * np.float32(0.1) - np.float32(0.05)
        self._elapsed[i] = 0

    def _step_env(self, i: int, action: int) -> Tuple[np.float32, bool, bool]:
        x, x_dot, theta, theta_dot = self._state[i]
        force = _FORCE_MAG if action == 1 else -_FORCE_MAG
        costheta = np.float32(np.cos(theta))
        sintheta = np.float32(np.sin(theta))
        temp = (force + _POLEMASS_LENGTH * theta_dot * theta_dot * sintheta) / _TOTAL_MASS
        thetaacc = (_GRAVITY * sintheta - costheta * temp) / (
            _LENGTH * (np.float32(4.0 / 3.0) - _MASSPOLE * costheta * costheta / _TOTAL_MASS)
        )
        xacc = temp - _POLEMASS_LENGTH * thetaacc * costheta / _TOTAL_MASS
        x = x + _TAU * x_dot
        x_dot = x_dot + _TAU * xacc
        theta = theta + _TAU * theta_dot
        theta_dot = theta_dot + _TAU * thetaacc
        self._state[i] = (x, x_dot, theta, theta_dot)
        self._elapsed[i] += 1
        terminated = bool(
            x < -_X_THRESHOLD or x > _X_THRESHOLD
            or theta < -_THETA_THRESHOLD or theta > _THETA_THRESHOLD
        )
        truncated = bool(self._elapsed[i] >= self.max_episode_steps)
        return np.float32(1.0), terminated, truncated

    # -- sync API --
    def reset(self) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        for i in range(self.spec.num_envs):
            self._reset_env(i)
        info = {
            "env_ids": np.arange(self.spec.num_envs, dtype=np.int32),
            "elapsed_step": np.zeros(self.spec.num_envs, np.int32),
        }
        return self._state.copy(), info

    def step(self, actions: np.ndarray) -> StepOutput:
        n = self.spec.num_envs
        rewards = np.zeros(n, np.float32)
        terminated = np.zeros(n, np.uint8)
        truncated = np.zeros(n, np.uint8)
        elapsed = np.zeros(n, np.int32)
        for i in range(n):
            r, term, trunc = self._step_env(i, int(actions[i]))
            rewards[i] = r
            terminated[i] = term
            truncated[i] = trunc
            if term or trunc:
                self._reset_env(i)  # auto-reset: returned obs is the fresh one
            elapsed[i] = self._elapsed[i]
        info = {
            "env_ids": np.arange(n, dtype=np.int32),
            "elapsed_step": elapsed,
            "reward": rewards.copy(),
        }
        return self._state.copy(), rewards, terminated.astype(bool), truncated.astype(bool), info

    # -- async API (thread-free emulation: results queue up immediately) --
    def async_reset(self) -> None:
        for i in range(self.spec.num_envs):
            self._reset_env(i)
            self._pending.put(
                (i, self._state[i].copy(), np.float32(0.0), False, False, 0)
            )

    def send(self, actions: np.ndarray, env_ids: np.ndarray) -> None:
        for a, i in zip(actions, env_ids):
            i = int(i)
            r, term, trunc = self._step_env(i, int(a))
            if term or trunc:
                self._reset_env(i)
            self._pending.put(
                (i, self._state[i].copy(), r, term, trunc, int(self._elapsed[i]))
            )

    def recv(self) -> StepOutput:
        b = self.spec.batch_size
        ids = np.zeros(b, np.int32)
        obs = np.zeros((b, 4), np.float32)
        rewards = np.zeros(b, np.float32)
        terminated = np.zeros(b, bool)
        truncated = np.zeros(b, bool)
        elapsed = np.zeros(b, np.int32)
        for k in range(b):
            i, o, r, term, trunc, el = self._pending.get()
            ids[k], obs[k], rewards[k] = i, o, r
            terminated[k], truncated[k], elapsed[k] = term, trunc, el
        info = {"env_ids": ids, "elapsed_step": elapsed, "reward": rewards.copy()}
        return obs, rewards, terminated, truncated, info

    def close(self) -> None:
        pass
