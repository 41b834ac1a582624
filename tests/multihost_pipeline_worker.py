"""Worker for the two-process FULL-PIPELINE `jax.distributed` test.

Run by tests/test_multihost.py as:
    python tests/multihost_pipeline_worker.py <pid> <nproc> <port>

Each process contributes 4 virtual CPU devices to the 8-device global
mesh and drives the PRODUCT `OdometryPipeline` (parallel/mesh_devices=8)
over the same simulated stream — the odometry state pytree is sharded
ACROSS THE PROCESS BOUNDARY, so every jitted step's collectives cross
what would be DCN on a real pod (SURVEY.md §5.8; the reference's only
process boundary is ROS pub/sub, ``package.xml:22-39``).

Prints:
    RESULT <n_accepted> <x> <y> <z> ... (last 3 trajectory positions)
    SHARDS <n_devices_of_map_shard> <n_processes_of_map_shard>
The parent asserts both processes print identical RESULT lines, that
the sharding genuinely spans both processes, and that the trajectory
matches a single-process run.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("LOAM_NO_NATIVE_BUILD", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

repo = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, repo)

# distributed init must precede any backend use (see multihost_worker.py)
import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "llt_mesh", os.path.join(repo, "loam_livox_tpu", "parallel", "mesh.py"))
llt_mesh = importlib.util.module_from_spec(spec)
spec.loader.exec_module(llt_mesh)

llt_mesh.initialize_multihost(f"localhost:{port}", nproc, pid)

import numpy as np  # noqa: E402

from loam_livox_tpu.core.config import SlamConfig  # noqa: E402
from loam_livox_tpu.eval.scenarios import SMALL_CAPS  # noqa: E402
from loam_livox_tpu.io.simulator import (  # noqa: E402
    LivoxSimulator,
    SimConfig,
    Trajectory,
)
from loam_livox_tpu.runtime.pipeline import OdometryPipeline  # noqa: E402

assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 4 * nproc

cfg = SlamConfig().replace(
    capacity=SMALL_CAPS,
    mapping={"init_accumulate_frames": 6},
    optimization={"icp_maximum_iteration": 5, "full_iterations": 3},
    parallel={"mesh_devices": 4 * nproc},
)

N_FRAMES = 14
ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
sim = LivoxSimulator(SimConfig(points_per_frame=3072, seed=3),
                     traj=Trajectory(ramp_t0=ramp))
pipe = OdometryPipeline(cfg)

surf = pipe.state.map_surface.xyz
procs = {d.process_index for d in surf.sharding.device_set}
print(f"SHARDS {len(surf.sharding.device_set)} {len(procs)}", flush=True)

for i in range(N_FRAMES):
    xyz, inten, t0 = sim.frame(i)
    pipe.process_raw(xyz, inten, t0)
pipe.flush()

pos = pipe.trajectory.positions_array()[-3:]
acc = int(sum(pipe.trajectory.accepted))
vals = " ".join(f"{v:.6f}" for v in pos.reshape(-1))
print(f"RESULT {acc} {vals}", flush=True)
