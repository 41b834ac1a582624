"""Sequential chunked dispatch (`parallel/dispatch_chunk`,
`runtime/pipeline.py process_raw_frames_chunked`): K raw frames per
device program with per-frame semantics — the replay/offline-throughput
mode.  Unlike racing (`frame_batch`), chunking has no coasted inits and
no buffer staleness: each frame registers against the state its
predecessor produced, exactly like one-dispatch-per-frame."""
import numpy as np
import pytest

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.eval.scenarios import SMALL_CAPS

pytestmark = pytest.mark.slow


def make_cfg(chunk=1):
    return SlamConfig().replace(
        capacity=SMALL_CAPS,
        mapping={"init_accumulate_frames": 6},
        optimization={"icp_maximum_iteration": 5, "full_iterations": 3},
        parallel={"dispatch_chunk": chunk},
    )


def run(cfg, n_frames=14):
    from loam_livox_tpu.io.simulator import (
        LivoxSimulator,
        SimConfig,
        Trajectory,
    )
    from loam_livox_tpu.runtime.pipeline import OdometryPipeline

    ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
    sim = LivoxSimulator(SimConfig(points_per_frame=3072, seed=3),
                         traj=Trajectory(ramp_t0=ramp))
    pipe = OdometryPipeline(cfg)
    for i in range(n_frames):
        xyz, inten, t0 = sim.frame(i)
        pipe.process_raw(xyz, inten, t0)
    pipe.flush()
    return pipe


class TestChunkedDispatch:
    def test_chunked_matches_sequential(self):
        """14 frames / K=4 exercises full chunks AND the partial tail.
        The chunked program is a different XLA compilation of the same
        math, so equivalence is tolerance-level, not bitwise (the
        iteration-capped solver amplifies ulp-level codegen differences
        — docs/multichip.md); the trajectories must agree far inside
        scenario accuracy."""
        ps = run(make_cfg(1))
        pc = run(make_cfg(4))
        ts = ps.trajectory.positions_array()
        tc = pc.trajectory.positions_array()
        assert ts.shape == tc.shape == (14, 3)
        times = np.asarray(pc.trajectory.times)
        assert np.all(np.diff(times) > 0)
        np.testing.assert_allclose(tc, ts, atol=5e-2)
        acc_s = int(np.asarray(ps.trajectory.accepted).sum())
        acc_c = int(np.asarray(pc.trajectory.accepted).sum())
        assert abs(acc_c - acc_s) <= 2
        assert acc_s >= 5

    def test_chunked_composes_with_mesh(self, eight_devices):
        """Chunked dispatch under the product mesh: the scan-over-
        frames program runs SPMD with the sharded state, stays finite,
        and the state remains genuinely distributed."""
        cfg = make_cfg(4).replace(parallel={"mesh_devices": 8})
        p = run(cfg, n_frames=8)
        t = p.trajectory.positions_array()
        assert t.shape == (8, 3) and np.all(np.isfinite(t))
        assert len(p.state.map_surface.xyz.sharding.device_set) == 8

    def test_chunk_and_racing_are_exclusive(self):
        from loam_livox_tpu.runtime.pipeline import OdometryPipeline

        cfg = make_cfg(4).replace(parallel={"frame_batch": 3})
        with pytest.raises(ValueError, match="mutually exclusive"):
            OdometryPipeline(cfg)
