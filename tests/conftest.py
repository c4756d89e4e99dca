"""Test harness: force an 8-virtual-device CPU platform before JAX loads.

This is the SURVEY.md §4 strategy: unit tests and sharding/distributed tests run
on a virtual CPU mesh (`--xla_force_host_platform_device_count=8`), mirroring
the reference's fake-multi-node env-var fixture (README.md:68-72, tpu.sh:61-77)
without needing hardware. Real-TPU benchmarking happens in bench.py, not here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize hook pins jax_platforms to the TPU plugin at
# interpreter start; the config update (not just the env var) forces CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_cpu_devices():
    import jax

    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual CPU devices, got {devices}"
    return devices
