"""Data-plane transfers between actor chips and the learner mesh.

Replaces the reference's host-bounced `jax.device_put_sharded`
(cleanba_ppo.py:357-363) and unreplicate-then-device_put param broadcast
(cleanba_ppo.py:721-725) with sharding-annotated `jax.device_put`, which XLA
lowers to direct device-to-device copies over ICI on a TPU host. Multi-host
assembly uses `jax.make_array_from_process_local_data`, so each host's rollout
shards feed only its own learner chips (SURVEY.md §5 "distributed backend").
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, SingleDeviceSharding

from cleanba_tpu.parallel.topology import DeviceTopology

__all__ = ["ship_to_learners", "pull_params_to_device"]


def ship_to_learners(payload: Any, topo: DeviceTopology, env_axis: int = 1) -> Any:
    """Move a trajectory pytree onto the learner mesh, sharded along the env
    axis (`env_axis=1` for time-major [T, B, ...] storages, `env_axis=0` for
    [B, ...] bootstrap rows). Non-blocking; transfers overlap with the next
    rollout iteration (double buffering, SURVEY.md §2.2 item 5)."""
    from cleanba_tpu.parallel.topology import LEARNER_AXIS

    spec = jax.sharding.PartitionSpec(*([None] * env_axis + [LEARNER_AXIS]))
    sharding = NamedSharding(topo.learner_mesh, spec)

    def put(x):
        if topo.world_size == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, payload)


def pull_params_to_device(params: Any, device: jax.Device) -> Any:
    """Copy (replicated) learner params onto an actor chip — the learner→actor
    param path (reference cleanba_ppo.py:721-725), D2D over ICI."""
    return jax.device_put(params, SingleDeviceSharding(device))
