"""Batched environment API — the framework's EnvPool-equivalent surface.

The reference drives EnvPool through three surfaces (SURVEY.md L0):
sync gym-style `reset/step` (cleanba_ppo.py:273,321), async
`async_reset/recv/send` (cleanba_impala.py:308,352,365), and an XLA
host-callback interface (legacy_scripts/ppo_atari_envpool_xla_jax_scan.py:248).
This module defines the same three surfaces over our own engines.

Semantics (EnvPool-compatible):
- **Auto-reset**: when an episode ends at a step, the returned observation is
  already the *next* episode's first observation; `terminated|truncated` flag
  that step, the final reward is still reported, and `elapsed_step` is 0 for
  the fresh observation ("firststep").
- Observations for image tasks are **NHWC uint8** `[84, 84, frame_stack]`
  (TPU-native layout; the reference's EnvPool emits NCHW and transposes inside
  the net, cleanba_ppo.py:178).
- `step`/`reset` return env-ordered arrays; async `recv` returns the earliest
  `batch_size` finished envs with their `env_ids`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Protocol, Tuple, runtime_checkable

import numpy as np

__all__ = ["EnvSpec", "BatchedEnv", "StepOutput"]

StepOutput = Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, Dict[str, np.ndarray]]


@dataclass(frozen=True)
class EnvSpec:
    """Static properties of a batched environment."""

    env_id: str
    num_envs: int
    batch_size: int
    obs_shape: Tuple[int, ...]   # per-env observation shape
    obs_dtype: np.dtype
    num_actions: int


@runtime_checkable
class BatchedEnv(Protocol):
    """Protocol implemented by both the native (C++) and Python engines."""

    spec: EnvSpec

    # --- sync API (PPO rollout path) ---
    def reset(self) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        """Reset all envs; returns (obs[N, ...], info) with info['env_ids']."""
        ...

    def step(self, actions: np.ndarray) -> StepOutput:
        """Step all envs with env-ordered actions.

        Returns (obs, reward, terminated, truncated, info); info carries
        'env_ids' and 'elapsed_step' (0 marks a fresh post-reset observation).
        """
        ...

    # --- async API (IMPALA rollout path) ---
    def async_reset(self) -> None:
        """Queue resets for all envs; results arrive via recv()."""
        ...

    def recv(self) -> StepOutput:
        """Block until `batch_size` envs finished; returns their results."""
        ...

    def send(self, actions: np.ndarray, env_ids: np.ndarray) -> None:
        """Dispatch actions for the given env_ids (non-blocking)."""
        ...

    def close(self) -> None:
        ...
