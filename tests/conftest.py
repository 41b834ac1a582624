"""Test harness: force an 8-device virtual CPU platform so multi-chip
sharding (Mesh/pjit/shard_map/psum) is exercised without TPU hardware.

Must set XLA flags before jax initializes a backend, hence the
os.environ writes at import time (conftest is imported first).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The persistent-cache AOT loader logs a benign machine-feature E-line
# per cache hit (the "+prefer-no-scatter" XLA tuning pseudo-features);
# silence C++ logging below FATAL.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
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

# Persistent compilation cache: the fused frame program costs minutes of
# XLA compile on this host; cache it across pytest processes so repeat
# runs skip straight to execution.
#
# The cache directory is keyed by a fingerprint of this host's CPU
# features: XLA:CPU AOT entries embed machine code tuned to the
# compiling machine, and loading an entry produced on a host with
# different CPU features is at best noisy (cpu_aot_loader warnings) and
# at worst numerically wrong or SIGILL — a reproducibility hazard for
# the sharded-vs-single-device equivalence suite.  A per-machine
# subdirectory makes cross-machine entries unreachable.
def _host_fingerprint() -> str:
    import hashlib
    import platform

    tokens = [platform.machine(), platform.processor(), jax.__version__]
    try:
        # FULL cpuinfo (round-4 postmortem: hashing only the flags +
        # model-name lines collided across driver VMs)
        with open("/proc/cpuinfo") as f:
            tokens.append(f.read())
    except OSError:
        pass
    try:
        # ... and even full cpuinfo collides: the VMs expose an
        # identical cpuinfo TEMPLATE while their actual CPUID features
        # differ (XLA's cpu_aot_loader kept loading foreign-machine
        # entries).  boot_id keys the cache per VM boot — cold cache
        # per boot, but cross-machine AOT code can never mix into a
        # numeric test run.
        with open("/proc/sys/kernel/random/boot_id") as f:
            tokens.append(f.read())
    except OSError:
        pass
    return hashlib.sha256("|".join(tokens).encode()).hexdigest()[:16]


_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
if _cache_dir is None:
    _cache_dir = os.path.join(
        os.path.expanduser("~/.cache/jax_xla_cache"), _host_fingerprint())
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_active_mesh():
    """The product pipeline registers its mesh in a trace-time global
    (parallel/mesh.py::set_active_mesh) so library code can pin the
    solver chain replicated.  Clear it between tests so a mesh test
    cannot leak replication constraints into an unrelated test's fresh
    traces."""
    from loam_livox_tpu.parallel.mesh import set_active_mesh

    set_active_mesh(None)
    yield
    set_active_mesh(None)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def eight_devices(devices):
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return devices[:8]
