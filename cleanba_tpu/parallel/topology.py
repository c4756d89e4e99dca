"""Device topology: actor/learner chip roles and the learner mesh.

The reference assigns roles with raw device-id lists and builds a pmap device
list by rank-major indexing (cleanba_ppo.py:425-443). Here the same role split
produces an explicit `jax.sharding.Mesh` over all global learner chips with a
single "learner" data-parallel axis; gradient reduction is a `psum` over that
axis (ICI within a host, DCN across), replacing pmap+NCCL (SURVEY.md §2.2).

Multi-host bring-up mirrors the reference: `jax.distributed.initialize`
(auto-discovering on TPU VMs, with the SLURM/TPU env-var override fixtures of
tpu.sh:63-77 still honored by JAX itself).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["DeviceTopology", "build_topology", "maybe_init_distributed", "LEARNER_AXIS"]


def maybe_init_distributed(cfg) -> None:
    """Join the multi-process runtime. MUST run before any other JAX call
    (the reference's `jax.distributed.initialize` gate, cleanba_ppo.py:419-423).

    On TPU VMs coordinator/rank/world-size auto-discover; the SLURM/TPU env-var
    fixtures the reference documents (README.md:68-72, tpu.sh:63-77) are
    honored by JAX's own cluster detection.

    Bring-up runs under a heartbeat guard: if the gRPC coordinator rendezvous
    wedges (a common multi-host failure mode the reference leaves to SLURM
    timeouts), the process dumps all stacks and exits instead of hanging.
    Tune with CLEANBA_BRINGUP_TIMEOUT (seconds, default 600).
    """
    if getattr(cfg, "distributed", False):
        import os

        from cleanba_tpu.utils.watchdog import heartbeat_guard

        timeout = float(os.environ.get("CLEANBA_BRINGUP_TIMEOUT", "600"))
        with heartbeat_guard(timeout):
            jax.distributed.initialize()

LEARNER_AXIS = "learner"


@dataclasses.dataclass
class DeviceTopology:
    world_size: int
    local_rank: int
    actor_devices: List[jax.Device]          # this process's actor chips
    learner_devices: List[jax.Device]        # this process's learner chips
    global_learner_devices: List[jax.Device] # rank-major across processes
    learner_mesh: Mesh                       # 1-D mesh over global learner chips

    @property
    def n_local_learners(self) -> int:
        return len(self.learner_devices)

    @property
    def n_global_learners(self) -> int:
        return len(self.global_learner_devices)

    def batch_sharding(self) -> NamedSharding:
        """Time-major [T, B, ...] trajectories sharded along the env axis."""
        return NamedSharding(self.learner_mesh, P(None, LEARNER_AXIS))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.learner_mesh, P())


def build_topology(
    actor_device_ids: Sequence[int],
    learner_device_ids: Sequence[int],
) -> DeviceTopology:
    world_size = jax.process_count()
    local_rank = jax.process_index()
    local_devices = jax.local_devices()

    actor_devices = [local_devices[i] for i in actor_device_ids]
    learner_devices = [local_devices[i] for i in learner_device_ids]
    # Rank-major global learner list (reference cleanba_ppo.py:436-443).
    global_learner_devices = [
        d
        for proc in range(world_size)
        for d in jax.devices()
        if d.process_index == proc and d in _as_global(learner_device_ids, proc)
    ]
    mesh = Mesh(np.array(global_learner_devices), (LEARNER_AXIS,))
    return DeviceTopology(
        world_size=world_size,
        local_rank=local_rank,
        actor_devices=actor_devices,
        learner_devices=learner_devices,
        global_learner_devices=global_learner_devices,
        learner_mesh=mesh,
    )


def _as_global(learner_device_ids: Sequence[int], proc: int) -> set:
    """Devices of process `proc` whose local index is in learner_device_ids."""
    proc_devices = [d for d in jax.devices() if d.process_index == proc]
    return {proc_devices[i] for i in learner_device_ids if i < len(proc_devices)}
