"""Batched racing registration (`runtime/batched.py`,
`parallel/frame_batch`) — the TPU-native re-expression of the
reference's `maximum_parallel_thread` worker pool
(laser_mapping.hpp:1737-1742): G frames register in one vmapped solve
against the shared matching buffer from coasted start poses, then
commit in timestamp order."""
import numpy as np
import pytest

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.eval.scenarios import SMALL_CAPS

# full-pipeline tier: excluded from the fast CI tier (-m 'not slow')
pytestmark = pytest.mark.slow


def make_cfg(batch):
    return SlamConfig().replace(
        capacity=SMALL_CAPS,
        mapping={"init_accumulate_frames": 6},
        optimization={"icp_maximum_iteration": 5, "full_iterations": 3},
        # guard disabled: these tests exercise the RACING path; the
        # staleness guard has its own test below
        parallel={"frame_batch": batch, "batch_motion_guard_t": 0.0},
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


class TestBatchedMode:
    def test_batched_pipeline_tracks(self):
        # 14 frames / G=3 exercises full groups AND the partial tail
        # (14 = 4×3 + 2) through flush()
        p = run(make_cfg(3))
        t = p.trajectory.positions_array()
        assert len(t) == 14
        assert np.all(np.isfinite(t))
        # the batch consumes frames in order, one trajectory row each
        times = np.asarray(p.trajectory.times)
        assert np.all(np.diff(times) > 0)
        # staleness tolerance is behavioral, not a failure: require the
        # run to register and move, not to match the sequential path
        assert sum(p.trajectory.accepted) >= 5
        assert np.linalg.norm(t[-1] - t[0]) > 0.01

    def test_piecewise_racing_tracks(self):
        """The SHIPPED realtime shape: piecewise-3 frames racing in
        G=3 groups (the reference's threads=3 over piecewise-3,
        performance_realtime.yaml:3 + laser_feature_extractor.hpp:
        141-142) — every piecewise window is a racing lane, one
        trajectory row per piece."""
        cfg = make_cfg(3).replace(
            common={"if_motion_deblur": 0, "piecewise_number": 3})
        p = run(cfg)
        t = p.trajectory.positions_array()
        assert len(t) == 14 * 3
        assert np.all(np.isfinite(t))
        times = np.asarray(p.trajectory.times)
        assert np.all(np.diff(times) > 0)
        assert sum(p.trajectory.accepted) >= 5

    def test_piecewise_guard_odom_mode(self):
        # odometry mode publishes only piece 0, which the batched
        # lanes do not model — construction must refuse
        cfg = make_cfg(3).replace(
            common={"if_motion_deblur": 0, "piecewise_number": 3,
                    "odom_mode": 0})
        from loam_livox_tpu.runtime.pipeline import OdometryPipeline

        with pytest.raises(ValueError, match="odom_mode"):
            OdometryPipeline(cfg)

    def test_motion_guard_falls_back_to_sequential(self, monkeypatch):
        """With the staleness guard tripped (threshold below any real
        motion), every group after the first observed step dispatches
        sequentially — the batched program must not run again."""
        from loam_livox_tpu.runtime import pipeline as pl

        calls = {"batched": 0}
        orig = pl.process_raw_frames_batched

        def counting(*a, **k):
            calls["batched"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(pl, "process_raw_frames_batched", counting)
        cfg = make_cfg(3).replace(
            parallel={"frame_batch": 3, "batch_motion_guard_t": 1e-9})
        p = run(cfg)
        assert len(p.trajectory.positions) == 14
        # 14 frames / G=3 = 5 dispatches (4 full + flush tail).  The
        # guard can only trip on dispatches AFTER a drain has observed
        # nonzero motion — the standstill ramp drains zero steps — so
        # the early groups legitimately race; once the moving frames
        # drain, later dispatches must fall back to sequential.
        assert calls["batched"] < 5, (
            "guard never tripped: every dispatch raced")
        assert sum(p.trajectory.accepted) >= 5

    def test_batch_size_one_uses_sequential_path(self):
        p = run(make_cfg(1), n_frames=4)
        assert len(p.trajectory.positions) == 4
        assert len(p._batch_buf) == 0
