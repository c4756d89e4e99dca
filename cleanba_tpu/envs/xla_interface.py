"""In-graph environment stepping — the EnvPool `envs.xla()` equivalent.

The reference's sync single-chip baseline runs the entire rollout inside one
jit by scanning over EnvPool's XLA host-callback step
(legacy_scripts/ppo_atari_envpool_xla_jax_scan.py:248-270). Here the same
surface is built on `jax.experimental.io_callback` (ordered, so consecutive
in-graph steps are sequenced against the stateful C++ engine).

Usage:
    handle, step_env = xla_interface(envs)
    def scan_body(carry, _):
        obs, key = carry
        action, key = policy(obs, key)
        obs, reward, term, trunc, first = step_env(action)
        ...
    jax.lax.scan(scan_body, init, length=num_steps)
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback

from cleanba_tpu.envs.api import BatchedEnv

__all__ = ["xla_interface"]


def xla_interface(env: BatchedEnv) -> Tuple[None, Callable]:
    """Returns (handle, step_env). `step_env(actions)` is jit-safe and returns
    (obs, reward, terminated, truncated, firststep) as device arrays."""
    n = env.spec.num_envs
    obs_sds = jax.ShapeDtypeStruct((n, *env.spec.obs_shape), env.spec.obs_dtype)
    f32 = jax.ShapeDtypeStruct((n,), jnp.float32)
    b8 = jax.ShapeDtypeStruct((n,), jnp.bool_)

    def host_step(actions):
        obs, rew, term, trunc, info = env.step(np.asarray(actions))
        first = info["elapsed_step"] == 0
        return obs, rew, np.asarray(term, np.bool_), np.asarray(trunc, np.bool_), first

    def step_env(actions):
        return io_callback(
            host_step, (obs_sds, f32, b8, b8, b8), actions, ordered=True
        )

    return None, step_env
