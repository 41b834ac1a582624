"""Frame-pipelining contract (`common/maximum_parallel_thread`,
reference ``laser_mapping.hpp:1737-1742`` / ``common_tools.h:52-80``):
depth only controls when the host OBSERVES results, never what is
computed — so a depth-3 run must produce exactly the depth-1 run's
trajectory and loop bookkeeping after `flush()`, `_pending` must never
exceed the depth, and `--follow` must emit every frame exactly once."""
import json

import numpy as np
import pytest

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.eval.scenarios import SMALL_CAPS

# full-pipeline tier: excluded from the fast CI tier (-m 'not slow')
pytestmark = pytest.mark.slow


def make_cfg(depth, loop=False):
    cfg = SlamConfig().replace(
        capacity=SMALL_CAPS,
        common={"maximum_parallel_thread": depth},
        mapping={"init_accumulate_frames": 6},
        optimization={"icp_maximum_iteration": 5, "full_iterations": 3},
    )
    if loop:
        cfg = cfg.replace(
            loop_closure={"if_enable_loop_closure": 1,
                          "scans_of_each_keyframe": 6,
                          "scans_between_two_keyframe": 3,
                          "minimum_keyframe_differen": 10**9})
    return cfg


def run(cfg, n_frames=14, track_pending=False):
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
    max_pending = 0
    for i in range(n_frames):
        xyz, inten, t0 = sim.frame(i)
        pipe.process_raw(xyz, inten, t0)
        if track_pending:
            max_pending = max(max_pending, len(pipe._pending))
    pipe.flush()
    return pipe, max_pending


class TestPipeliningContract:
    def test_depth3_trajectory_equals_depth1(self):
        p1, _ = run(make_cfg(1))
        p3, _ = run(make_cfg(3))
        t1 = p1.trajectory.positions_array()
        t3 = p3.trajectory.positions_array()
        assert t1.shape == t3.shape
        np.testing.assert_array_equal(
            np.asarray(p1.trajectory.accepted),
            np.asarray(p3.trajectory.accepted))
        # depth defers observation only — identical device programs on
        # identical inputs; any difference is a pipelining bug
        np.testing.assert_allclose(t3, t1, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(p3.trajectory.quaternions),
            np.asarray(p1.trajectory.quaternions), atol=1e-6)

    def test_pending_never_exceeds_depth_and_flush_drains(self):
        pipe, max_pending = run(make_cfg(3), track_pending=True)
        assert max_pending <= 3 + 1, (
            "at most depth results in flight (the +1 is the just-"
            "appended frame before the drain check)")
        assert len(pipe._pending) == 0, "flush() must drain everything"
        assert len(pipe.trajectory.positions) == 14

    def test_depth1_is_fully_synchronous(self):
        pipe, max_pending = run(make_cfg(1), track_pending=True)
        assert max_pending <= 1
        assert len(pipe.trajectory.positions) == 14

    def test_loop_bookkeeping_identical_across_depths(self):
        # keyframes complete at the same frames with the same member
        # sets regardless of observation depth (gates never fire: the
        # minimum separation is impossible, so only accumulation runs)
        p1, _ = run(make_cfg(1, loop=True))
        p3, _ = run(make_cfg(3, loop=True))
        k1 = [(k.ending_frame_idx, sorted(k.keys.tolist()))
              for k in p1.loop_closer.keyframes]
        k3 = [(k.ending_frame_idx, sorted(k.keys.tolist()))
              for k in p3.loop_closer.keyframes]
        assert len(k1) > 0, "run must complete at least one keyframe"
        assert k1 == k3

    def test_follow_emits_each_frame_exactly_once(self, capsys):
        from loam_livox_tpu.cli.run_odometry import main

        argv = ["--frames", "8", "--follow", "--quiet",
                "--set", "common/maximum_parallel_thread=3",
                "--set", "mapping/init_accumulate_frames=2",
                "--set", "optimization/icp_maximum_iteration=3"]
        for k, v in SMALL_CAPS.items():
            argv += ["--set", f"capacity/{k}={v}"]
        assert main(argv) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        parsed = [json.loads(ln) for ln in lines if ln.startswith("{")]
        frames = [d["frame"] for d in parsed if "frame" in d]
        # the default (precision) profile runs the SHIPPED piecewise-3
        # mode: one pose row per piecewise registration, like the
        # reference's per-piece odometry publishes
        # (laser_feature_extractor.hpp:305-389) — 8 raw frames emit
        # 24 rows, each exactly once, in order
        assert frames == list(range(8 * 3)), frames
