"""Wiring tests for the config knobs audited in round 3:
`if_update_mean_and_cov_incrementally`, `maximum_keyframe_in_waiting_list`,
`map_alignment_if_dump_matching_result`, `if_verbose_screen_printf`,
`knn_query_tile` — each must have an observable effect outside
config.py (reference: laser_mapping.hpp:669,705,710;
cell_map_keyframe.hpp:30; tools_logger.hpp:51-80)."""
import json
import os

import jax.numpy as jnp
import numpy as np

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.core.types import PointBatch
from loam_livox_tpu.map.cell_map import (
    append_cloud,
    cell_features,
    empty_cell_map,
)

BIG_REVISIT = 10**9


def batch_of(pts, cap=256):
    pts = np.asarray(pts, np.float32)
    out = np.zeros((cap, 3), np.float32)
    m = np.zeros((cap,), bool)
    out[: len(pts)] = pts
    m[: len(pts)] = True
    return PointBatch(xyz=jnp.asarray(out), time=jnp.zeros(cap),
                      mask=jnp.asarray(m))


class TestIncrementalCov:
    def test_modes_agree_when_pool_holds_everything(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 0.4, (8, 3)).astype(np.float32)
        m = empty_cell_map(1.0, capacity=16, pool_size=16)
        m, _ = append_cloud(m, batch_of(pts), BIG_REVISIT, max_new=8)
        fi = cell_features(m, incremental=True)
        fp = cell_features(m, incremental=False)
        v = np.asarray(m.valid())
        np.testing.assert_allclose(np.asarray(fi.mean)[v],
                                   np.asarray(fp.mean)[v], atol=1e-5)
        np.testing.assert_allclose(np.asarray(fi.cov)[v],
                                   np.asarray(fp.cov)[v], atol=1e-5)

    def test_pool_mode_reflects_only_retained_points(self):
        # Overfill one cell: lifetime stats see all 20 points, the pool
        # ring keeps the last 4 — non-incremental mean must track the
        # recent points only.
        pool = 4
        m = empty_cell_map(1.0, capacity=16, pool_size=pool)
        early = np.tile([[0.1, 0.1, 0.1]], (16, 1)).astype(np.float32)
        late = np.tile([[0.4, 0.4, 0.4]], (4, 1)).astype(np.float32)
        m, _ = append_cloud(m, batch_of(early), BIG_REVISIT, max_new=8)
        m, _ = append_cloud(m, batch_of(late), BIG_REVISIT, max_new=8)
        fi = cell_features(m, incremental=True)
        fp = cell_features(m, incremental=False)
        v = np.asarray(m.valid())
        mean_inc = np.asarray(fi.mean)[v][0]
        mean_pool = np.asarray(fp.mean)[v][0]
        # lifetime mean is pulled toward the 16 early points
        assert abs(mean_inc[0] - (16 * 0.1 + 4 * 0.4) / 20) < 1e-5
        # pool mean sees only the 4 late points
        assert abs(mean_pool[0] - 0.4) < 1e-5


class TestWaitingListBound:
    def _cfg(self, bound):
        return SlamConfig().replace(
            capacity={"cell_capacity": 64, "cell_point_capacity": 4,
                      "cell_max_new_per_frame": 16},
            loop_closure={"if_enable_loop_closure": 1,
                          "scans_of_each_keyframe": 2,
                          "scans_between_two_keyframe": 1,
                          "maximum_keyframe_in_waiting_list": bound},
        )

    def _feed(self, closer, cfg, n_frames):
        m = empty_cell_map(0.5, capacity=64, pool_size=4)
        rng = np.random.default_rng(1)
        for i in range(n_frames):
            pts = rng.uniform(-3, 3, (32, 3)).astype(np.float32)
            m, touched = append_cloud(m, batch_of(pts, cap=64),
                                      BIG_REVISIT, max_new=16)
            closer.on_frame(m, touched, np.array([1.0, 0, 0, 0]),
                            np.zeros(3), i)
        closer.drain()      # settle the background loop-service worker
        return closer

    def test_zero_bound_drops_every_completed_keyframe(self):
        from loam_livox_tpu.runtime.loop_service import LoopCloser

        cfg = self._cfg(0)
        closer = self._feed(LoopCloser(cfg), cfg, 8)
        assert closer.dropped_keyframes > 0
        assert len(closer.keyframes) == 0

    def test_default_bound_processes_keyframes(self):
        from loam_livox_tpu.runtime.loop_service import LoopCloser

        cfg = self._cfg(10)
        closer = self._feed(LoopCloser(cfg), cfg, 8)
        assert closer.dropped_keyframes == 0
        assert len(closer.keyframes) > 0


class TestAlignmentDump:
    def test_dump_matching_pair_writes_abc(self, tmp_path):
        from loam_livox_tpu.runtime.loop_service import (
            KeyframeRecord,
            LoopCloser,
        )

        cfg = SlamConfig().replace(
            loop_closure={"if_enable_loop_closure": 1,
                          "map_alignment_if_dump_matching_result": 1})
        closer = LoopCloser(cfg, dump_dir=str(tmp_path))
        rng = np.random.default_rng(0)

        def rec():
            return KeyframeRecord(
                keys=np.zeros(1, np.int32), q=np.array([1.0, 0, 0, 0]),
                t=np.zeros(3), ending_frame_idx=0,
                snap_line=rng.uniform(-1, 1, (10, 3)).astype(np.float32),
                snap_plane=rng.uniform(-1, 1, (20, 3)).astype(np.float32))

        class FakeRes:
            q = jnp.array([1.0, 0, 0, 0], jnp.float32)
            t = jnp.array([0.5, 0, 0], jnp.float32)
            inlier_threshold = jnp.float32(0.1)

        closer._dump_matching_pair(rec(), rec(), FakeRes())
        for suffix in ("0_a.pcd", "0_b.pcd", "0_c.pcd", "0_pair.json"):
            assert (tmp_path / suffix).exists(), suffix
        with open(tmp_path / "0_pair.json") as f:
            d = json.load(f)
        assert abs(d["t"][0] - 0.5) < 1e-6
        # _c is _b transformed by (q, t)
        from loam_livox_tpu.io.serialization import load_pcd

        b, _ = load_pcd(str(tmp_path / "0_b.pcd"))
        c, _ = load_pcd(str(tmp_path / "0_c.pcd"))
        np.testing.assert_allclose(c, b + [0.5, 0, 0], atol=1e-5)


class TestScreenPrintf:
    def test_logger_screen_echo(self, capsys):
        from loam_livox_tpu.utils.logging import FileLogger

        silent = FileLogger(None, screen=False)
        silent.printf("mapping", "hidden %d", 1)
        assert capsys.readouterr().out == ""
        loud = FileLogger(None, screen=True)
        assert loud.enabled()
        loud.printf("mapping", "shown %d", 2)
        assert "[mapping] shown 2" in capsys.readouterr().out

    def test_pipeline_honors_inverted_semantics(self):
        from loam_livox_tpu.runtime.pipeline import OdometryPipeline

        cfg = SlamConfig().replace(
            common={"if_verbose_screen_printf": 0},
            capacity={"max_raw_points": 512, "max_corner": 64,
                      "max_surface": 256, "map_corner_capacity": 512,
                      "map_surf_capacity": 2048,
                      "hist_corner_capacity": 64,
                      "hist_surf_capacity": 256, "history_window": 8},
        )
        pipe = OdometryPipeline(cfg)
        assert pipe.logger.screen is True
        cfg2 = cfg.replace(common={"if_verbose_screen_printf": 1})
        assert OdometryPipeline(cfg2).logger.screen is False


class TestKnnQueryTile:
    def test_query_tile_changes_chunking_not_results(self):
        from loam_livox_tpu.ops.knn import knn

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.uniform(-5, 5, (96, 3)).astype(np.float32))
        ref = jnp.asarray(rng.uniform(-5, 5, (256, 3)).astype(np.float32))
        mask = jnp.ones((256,), bool)
        d1, i1 = knn(q, ref, mask, k=5, query_tile=32, exact=True)
        d2, i2 = knn(q, ref, mask, k=5, query_tile=96, exact=True)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
