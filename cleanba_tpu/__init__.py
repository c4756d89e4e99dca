"""cleanba_tpu — a TPU-native Sebulba-style actor-learner RL framework.

A from-scratch rebuild of the capabilities of vwxyzjn/cleanba (reference layout
documented in SURVEY.md), designed for JAX/XLA on TPU:

- Actors: jitted policy inference over batched C++ envs, on dedicated actor chips.
- Learners: PPO (GAE) and IMPALA (V-trace) updates under a single `jax.jit` over an
  explicit `jax.sharding.Mesh`, gradients reduced by XLA collectives over ICI
  (replacing the reference's per-process `jax.pmap` + NCCL, cleanba_ppo.py:656-660).
- Data plane: time-major [T, B, ...] trajectory batches sharded along the env axis.

Subpackages:
  envs      batched environment engine (C++ core + Python fallback, EnvPool-like API)
  models    flax policy/value networks (IMPALA-CNN, NatureCNN, MLP)
  ops       pure algorithm kernels (GAE, V-trace, losses, optimizers, sampling)
  parallel  mesh/topology, sharding layouts, multi-host bring-up
  runtime   Sebulba runtime: rollout threads, queue protocol, learner driver
  utils     config/CLI, metrics, checkpointing, timers, profiling
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even where a sitecustomize hook pinned jax_platforms to
# a hardware plugin at interpreter start (the env var alone is read before the
# hook runs and loses): CLI runs with JAX_PLATFORMS=cpu must actually get CPU,
# e.g. to drive trainers while the chip is held by another process.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        if _jax.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - tooling imports must never break
        pass
