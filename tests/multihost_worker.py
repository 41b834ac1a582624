"""Worker for the two-process `jax.distributed` test (SURVEY.md §4's
prescribed multi-host test pattern: real `jax.distributed.initialize`
across OS processes, CPU devices faked per process).

Run by tests/test_multihost.py as:
    python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process contributes 4 virtual CPU devices to an 8-device global
mesh, then:
1. checks the global device view,
2. runs a cross-process psum through `normal_system_psum` (the sharded
   GN reduction the odometry backend uses) on a globally-sharded
   residual id set,
3. prints the replicated (H trace, g norm, cost) — the parent asserts
   both processes print identical values and exit 0.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
# Two of these workers import concurrently; never trigger the in-place
# native build from here (the build lock makes it safe, but a worker
# blocking on a compile would stretch the test's timeout).
os.environ.setdefault("LOAM_NO_NATIVE_BUILD", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

repo = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, repo)

# `jax.distributed.initialize` must run before anything touches the XLA
# backend; the package __init__ chain creates jnp constants at import
# time, so load parallel/mesh.py standalone first and defer the rest.
import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "llt_mesh", os.path.join(repo, "loam_livox_tpu", "parallel", "mesh.py"))
llt_mesh = importlib.util.module_from_spec(spec)
spec.loader.exec_module(llt_mesh)

mesh = llt_mesh.initialize_multihost(f"localhost:{port}", nproc, pid)

from loam_livox_tpu.parallel.sharded import normal_system_psum  # noqa: E402
n_local = len(jax.local_devices())
n_global = len(jax.devices())
assert n_local == 4, f"local devices {n_local}"
assert n_global == 4 * nproc, f"global devices {n_global}"
assert jax.process_count() == nproc

# Globally-sharded residual ids: each process contributes its local
# quarter of the 64-residual set.
N = 64
per_proc = N // nproc
sharding = NamedSharding(mesh, P("shard"))
local_ids = np.arange(pid * per_proc, (pid + 1) * per_proc,
                      dtype=np.int32)
ids = jax.make_array_from_process_local_data(sharding, local_ids, (N,))

rng = np.random.default_rng(0)  # same synthetic problem on every host
pts = jnp.asarray(rng.uniform(-5, 5, (N, 3)), jnp.float32)
tgt = pts + jnp.asarray([0.05, -0.02, 0.01], jnp.float32)


def residual_jac(idx):
    p = pts[idx]
    r = p - tgt[idx]
    J = jnp.concatenate(
        [jnp.zeros((idx.shape[0], 3, 3), jnp.float32),
         jnp.broadcast_to(jnp.eye(3), (idx.shape[0], 3, 3))], axis=-1)
    w = jnp.ones((idx.shape[0],), jnp.float32)
    return r, J, w


H, g, cost = normal_system_psum(residual_jac, ids, mesh)
H, g, cost = jax.device_get((H, g, cost))
print(f"RESULT {np.trace(H):.6f} {np.linalg.norm(g):.6f} "
      f"{float(cost):.6f}", flush=True)
jax.distributed.shutdown()
