from cleanba_tpu.parallel.sharding import pull_params_to_device, ship_to_learners
from cleanba_tpu.parallel.topology import (
    LEARNER_AXIS,
    DeviceTopology,
    build_topology,
    maybe_init_distributed,
)

__all__ = [
    "pull_params_to_device",
    "ship_to_learners",
    "LEARNER_AXIS",
    "DeviceTopology",
    "build_topology",
    "maybe_init_distributed",
]
