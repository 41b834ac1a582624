"""Two-process `jax.distributed` test — SURVEY.md §4's prescribed
multi-host pattern: `initialize_multihost` across real OS processes
with per-process virtual CPU devices, one cross-process psum through
the sharded GN reduction.  Validates that `parallel.mesh
.initialize_multihost` is working code, not a helper on faith
(VERDICT round-1 item 7)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# full-pipeline tier: excluded from the fast CI tier (-m 'not slow')
pytestmark = pytest.mark.slow

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_psum():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=210)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker hung")
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        results = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert len(results) == 1, out
        outs.append(results[0])
    # replicated psum outputs must be identical across processes
    assert outs[0] == outs[1], outs
    # and match the analytic values: H = diag(0,0,0,1,1,1)*N ⇒ tr = 3N;
    # r = const (0.05, -0.02, 0.01) ⇒ cost = N·|r|², g = N·r (norm)
    import numpy as np

    n = 64
    r = np.array([0.05, -0.02, 0.01])
    tr, gn, cost = map(float, outs[0].split()[1:])
    assert abs(tr - 3 * n) < 1e-3
    assert abs(gn - n * np.linalg.norm(r)) < 1e-3
    assert abs(cost - n * (r @ r)) < 1e-4


PIPELINE_WORKER = os.path.join(os.path.dirname(__file__),
                               "multihost_pipeline_worker.py")


def test_two_process_full_pipeline(eight_devices):
    """VERDICT r3 item 3: the PRODUCT `OdometryPipeline` across 2
    `jax.distributed` processes (4 virtual CPU devices each, one
    8-device global mesh).  The odometry state shards across the
    process boundary — every step's collectives cross it — and the
    trajectory must equal both across processes and vs the
    single-process mesh run of the same stream."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, PIPELINE_WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost pipeline worker hung")
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}\n{err[-3000:]}"
        outs.append(out)

    for out in outs:
        shard_lines = [l for l in out.splitlines() if l.startswith("SHARDS")]
        assert len(shard_lines) == 1, out
        n_dev, n_proc = map(int, shard_lines[0].split()[1:])
        assert n_dev == 8, "map shard must span all 8 global devices"
        assert n_proc == 2, "map shard must span BOTH processes"

    results = []
    for out in outs:
        rl = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert len(rl) == 1, out
        results.append(rl[0])
    # the replicated trajectory must be identical on both processes
    assert results[0] == results[1], results

    # and must match the same stream run on the single-process mesh
    from loam_livox_tpu.core.config import SlamConfig
    from loam_livox_tpu.eval.scenarios import SMALL_CAPS
    from loam_livox_tpu.io.simulator import (
        LivoxSimulator,
        SimConfig,
        Trajectory,
    )
    from loam_livox_tpu.runtime.pipeline import OdometryPipeline

    cfg = SlamConfig().replace(
        capacity=SMALL_CAPS,
        mapping={"init_accumulate_frames": 6},
        optimization={"icp_maximum_iteration": 5, "full_iterations": 3},
        parallel={"mesh_devices": 8},
    )
    ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
    sim = LivoxSimulator(SimConfig(points_per_frame=3072, seed=3),
                         traj=Trajectory(ramp_t0=ramp))
    pipe = OdometryPipeline(cfg)
    for i in range(14):
        xyz, inten, t0 = sim.frame(i)
        pipe.process_raw(xyz, inten, t0)
    pipe.flush()
    parts = results[0].split()
    acc_mp = int(parts[1])
    pos_mp = np.asarray(list(map(float, parts[2:]))).reshape(3, 3)
    assert acc_mp == int(sum(pipe.trajectory.accepted))
    np.testing.assert_allclose(
        pos_mp, pipe.trajectory.positions_array()[-3:], atol=5e-3)
