"""Test harness: force an 8-device virtual CPU platform so multi-chip
sharding (Mesh/pjit/shard_map/psum) is exercised without TPU hardware.

Must set XLA flags before jax initializes a backend, hence the
os.environ writes at import time (conftest is imported first).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS programmatically; undo it so tests run on the virtual
# 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def eight_devices(devices):
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return devices[:8]
