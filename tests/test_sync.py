"""FrameAssembler (Data_pair) tests + velodyne-path pipeline smoke."""
import numpy as np
import jax.numpy as jnp
import pytest

from loam_livox_tpu.runtime.sync import FrameAssembler


class TestFrameAssembler:
    def test_joins_on_all_three(self):
        fa = FrameAssembler()
        xyz = np.zeros((4, 3), np.float32)
        fa.add(fa.CORNER, 1.0, xyz)
        fa.add(fa.SURFACE, 1.0, xyz)
        assert fa.pop() is None
        fa.add(fa.FULL, 1.0, xyz)
        stamp, parts = fa.pop()
        assert stamp == 1.0 and set(parts) == {"corner", "surface", "full"}

    def test_out_of_order_stamps(self):
        fa = FrameAssembler()
        xyz = np.zeros((2, 3), np.float32)
        for s in (2.0, 1.0):
            for k in (fa.CORNER, fa.SURFACE, fa.FULL):
                fa.add(k, s, xyz)
        assert fa.pop()[0] == 2.0  # completion order
        assert fa.pop()[0] == 1.0

    def test_drop_oldest(self):
        fa = FrameAssembler(max_buffer=2)
        xyz = np.zeros((1, 3), np.float32)
        for s in (1.0, 2.0, 3.0, 4.0):
            for k in (fa.CORNER, fa.SURFACE, fa.FULL):
                fa.add(k, s, xyz)
        assert fa.dropped == 2
        assert fa.pop()[0] == 3.0


class TestVelodynePipeline:
    def test_velodyne_lidar_type_runs_end_to_end(self):
        from loam_livox_tpu.core.config import SlamConfig
        from loam_livox_tpu.runtime.pipeline import OdometryPipeline
        from test_velodyne import synthetic_vlp16_scan

        cfg = SlamConfig().replace(
            common={"lidar_type": "velodyne", "if_motion_deblur": 0,
                    "piecewise_number": 1},
            feature_extraction={"scan_line": 16},
            mapping={"init_accumulate_frames": 1},
            capacity={"max_raw_points": 16384, "max_corner": 256,
                      "max_surface": 2048, "map_corner_capacity": 4096,
                      "map_surf_capacity": 16384,
                      "hist_corner_capacity": 128,
                      "hist_surf_capacity": 1024, "history_window": 8,
                      "max_corner_ds": 128, "max_surface_ds": 1024},
            optimization={"icp_maximum_iteration": 4, "full_iterations": 4},
        )
        pipe = OdometryPipeline(cfg)
        base = synthetic_vlp16_scan(n_az=720)
        for i in range(4):
            # sweep observed from slightly shifted origins
            shift = np.array([0.02 * i, 0.01 * i, 0.0], np.float32)
            pts = (base - shift).astype(np.float32)
            pipe.process_raw(pts, np.ones(len(pts), np.float32), 0.1 * i)
        pipe.flush()          # lazy drain materializes at flush
        assert len(pipe.trajectory.positions) == 4
        est = pipe.trajectory.positions[-1]
        assert np.all(np.isfinite(est))
        # tracked roughly toward the shift direction
        assert abs(est[0] - 0.06) < 0.05
