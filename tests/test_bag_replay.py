"""End-to-end bag-replay regression: real ROS1 bag container →
livox CustomMsg decode → frontend → odometry → ATE vs ground truth.

This is the CI analogue of the reference's rosbag-replay validation
(README.md:76-137, launch/rosbag.launch) — the fixture is a committed
v2.0 bag (bz2 chunk) produced by scripts/make_fixture_bag.py, so the
whole ingest path is exercised byte-for-byte, and an accuracy
regression anywhere in frontend/registration/runtime fails the suite.
"""
import os

import numpy as np
import pytest

# full-pipeline tier: excluded from the fast CI tier (-m 'not slow')
pytestmark = pytest.mark.slow

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
BAG = os.path.join(FIXTURE_DIR, "sim_livox.bag")
GT = os.path.join(FIXTURE_DIR, "sim_livox_gt.txt")

# Golden bound: measured aligned ATE on this fixture (CPU, small
# capacities) is recorded in the assert message history — the bound is
# ~2× the measured value so numeric jitter passes while real drift
# regressions (>2×) fail.
ATE_BOUND_M = 0.30
N_FRAMES = 24


@pytest.mark.skipif(not os.path.exists(BAG), reason="fixture bag missing")
def test_bag_replay_ate():
    from loam_livox_tpu.core.config import SlamConfig
    from loam_livox_tpu.eval.ate import ate_rmse
    from loam_livox_tpu.io.rosbag import bag_frame_stream
    from loam_livox_tpu.io.serialization import load_poses_txt
    from loam_livox_tpu.runtime.pipeline import OdometryPipeline

    cfg = SlamConfig().replace(
        capacity={
            "max_raw_points": 4096,
            "max_corner": 256,
            "max_surface": 1024,
            "max_corner_ds": 256,
            "max_surface_ds": 1024,
            "map_corner_capacity": 4096,
            "map_surf_capacity": 16384,
            "hist_corner_capacity": 128,
            "hist_surf_capacity": 512,
            "history_window": 16,
        },
        common={"piecewise_number": 1},
        mapping={"init_accumulate_frames": 8},
        optimization={"icp_maximum_iteration": 5, "full_iterations": 3},
    )
    pipe = OdometryPipeline(cfg)
    n = 0
    for xyz, inten, stamp in bag_frame_stream(BAG):
        assert xyz.shape[1] == 3 and len(inten) == len(xyz)
        pipe.process_raw(xyz, inten / 255.0, stamp)
        n += 1
    assert n == N_FRAMES

    gt_t, _gt_q = load_poses_txt(GT)
    est = pipe.trajectory.positions_array()
    assert len(est) == len(gt_t)
    ate = ate_rmse(est, gt_t)
    assert ate < ATE_BOUND_M, f"bag-replay ATE {ate:.4f} m regressed"
