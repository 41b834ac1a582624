"""Loop-closure service tests: keyframe accumulation cadence, candidate
gating, ICP verification, pose-graph trigger, one-shot semantics
(reference: service_loop_detection, laser_mapping.hpp:874-1148)."""
import jax.numpy as jnp
import numpy as np
import pytest

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.core.types import PointBatch
from loam_livox_tpu.map.cell_map import append_cloud, empty_cell_map
from loam_livox_tpu.runtime.loop_service import LoopCloser
from test_loop import structured_world

BIG = 10**9


def service_cfg(**loop_over):
    lc = {
        "if_enable_loop_closure": 1,
        "scans_of_each_keyframe": 3,
        "scans_between_two_keyframe": 1,
        "minimum_keyframe_differen": 4,
        "avail_ratio_plane": 0.001,
        "avail_ratio_line": 0.0,
    }
    lc.update(loop_over)
    return SlamConfig().replace(loop_closure=lc)


def build_world_map():
    rng = np.random.default_rng(11)
    world = structured_world(rng)
    m = empty_cell_map(0.5, capacity=2048, pool_size=32)
    padded = np.zeros((4096, 3), np.float32)
    mask = np.zeros((4096,), bool)
    padded[: len(world)] = world[:4096]
    mask[: len(world)] = True
    b = PointBatch(xyz=jnp.asarray(padded), time=jnp.zeros(4096),
                   mask=jnp.asarray(mask))
    m, touched = append_cloud(m, b, BIG, max_new=2048)
    return m, touched


def drifted_circle_pose(i, n=10, drift=0.25):
    ang = 2 * np.pi * i / n
    q = np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)], np.float32)
    t = np.array([np.cos(ang) - 1, np.sin(ang), 0.0], np.float32) * 2
    t = t + drift * (i / n) * np.array([1.0, 0.3, 0.1], np.float32)
    return q, t


class TestKeyframeCadence:
    def test_accumulators_and_completion(self):
        cfg = service_cfg(if_enable_loop_closure=0)
        svc = LoopCloser(cfg)
        m, touched = build_world_map()
        done = []
        for i in range(8):
            q, t = drifted_circle_pose(i)
            kf = svc.on_frame(m, touched, q, t, i)
            if kf is not None:
                done.append(kf)
        svc.drain()     # async worker fills descriptors in background
        # scans_of_each=3, between=1 → first completes at frame 3,
        # then one per frame
        assert len(done) == 6
        assert all(k.descriptor is not None for k in done)
        assert len(done[0].keys) > 50


class TestLoopDetection:
    def test_detects_and_closes_loop(self):
        cfg = service_cfg()
        svc = LoopCloser(cfg)
        m, touched = build_world_map()
        for i in range(12):
            q, t = drifted_circle_pose(i, n=12)
            svc.on_frame(m, touched, q, t, i)
            if svc.closed:
                break
        svc.drain()     # async worker scans in background
        assert svc.closed, "loop never accepted"
        res = svc.result
        assert res.accepted
        assert res.icp_score < cfg.loop_closure.map_alignment_inlier_threshold
        assert res.q_opt.shape[1] == 4
        # one-shot: further frames do nothing
        q, t = drifted_circle_pose(12, n=12)
        assert svc.on_frame(m, touched, q, t, 12) is None

    def test_refine_keyframe_cloud_runs(self):
        cfg = service_cfg()
        svc = LoopCloser(cfg)
        m, touched = build_world_map()
        for i in range(12):
            q, t = drifted_circle_pose(i, n=12)
            svc.on_frame(m, touched, q, t, i)
            if svc.closed:
                break
        svc.drain()
        assert svc.closed
        pts = svc.refine_keyframe_cloud(m, 0)
        assert pts.ndim == 2 and pts.shape[1] == 3 and len(pts) > 50
        assert np.all(np.isfinite(pts))

    def test_similarity_gate_rejects_different_places(self):
        """Keyframes over two structurally different regions must not
        produce a loop (the similarity gate)."""
        cfg = service_cfg()
        svc = LoopCloser(cfg)
        # world A at origin, world B (different seed → different plane
        # orientations) 50 m away, one combined map
        wa = structured_world(np.random.default_rng(11))
        wb = structured_world(np.random.default_rng(55)) + [50.0, 0, 0]
        world = np.concatenate([wa, wb]).astype(np.float32)
        m = empty_cell_map(0.5, capacity=4096, pool_size=32)
        padded = np.zeros((8192, 3), np.float32)
        mask = np.zeros((8192,), bool)
        padded[: len(world)] = world
        mask[: len(world)] = True
        b = PointBatch(xyz=jnp.asarray(padded), time=jnp.zeros(8192),
                       mask=jnp.asarray(mask))
        m, _ = append_cloud(m, b, BIG, max_new=4096)
        centers = np.asarray(m.centers())
        valid = np.asarray(m.valid())
        in_a = jnp.asarray(valid & (centers[:, 0] < 25.0))
        in_b = jnp.asarray(valid & (centers[:, 0] >= 25.0))
        # Unit-level: a history keyframe of pure region A, current of
        # pure region B, separation already satisfied — the similarity
        # gate must reject (cross-similarity ≈ 0.5 < 0.94).
        cfg2 = service_cfg(minimum_keyframe_differen=1)
        svc = LoopCloser(cfg2)
        from loam_livox_tpu.runtime.loop_service import KeyframeRecord
        rec_a = KeyframeRecord(
            keys=np.asarray(m.keys)[np.asarray(in_a)],
            q=np.array([1.0, 0, 0, 0], np.float32),
            t=np.zeros(3, np.float32), ending_frame_idx=0)
        svc.process_keyframe(rec_a, m)
        for _ in range(3):   # padding keyframes of region A
            rec = KeyframeRecord(
                keys=np.asarray(m.keys)[np.asarray(in_a)],
                q=np.array([1.0, 0, 0, 0], np.float32),
                t=np.zeros(3, np.float32), ending_frame_idx=0)
            svc.keyframes.append(rec)
            rec.descriptor = rec_a.descriptor
        rec_b = KeyframeRecord(
            keys=np.asarray(m.keys)[np.asarray(in_b)],
            q=np.array([1.0, 0, 0, 0], np.float32),
            t=np.asarray([50.0, 0, 0], np.float32), ending_frame_idx=10)
        svc.process_keyframe(rec_b, m)
        assert not svc.closed


class TestAsyncWaitingList:
    def test_drop_oldest_engages_when_worker_lags(self, monkeypatch):
        """The waiting-list bound only binds when the consumer can lag
        the producer (reference pop_front drop,
        laser_mapping.hpp:1552-1555): stall the worker and feed
        completions faster than it drains — the oldest keyframes must
        be dropped unprocessed, the newest processed."""
        import time as _time

        from loam_livox_tpu.runtime.loop_service import LoopCloser

        cfg = service_cfg(if_enable_loop_closure=0)
        cfg = cfg.replace(loop_closure={
            "maximum_keyframe_in_waiting_list": 2,
            "scans_of_each_keyframe": 1,
            "scans_between_two_keyframe": 1})
        svc = LoopCloser(cfg)
        real = LoopCloser.process_keyframe

        def slow(self, rec, m):
            _time.sleep(0.15)
            real(self, rec, m)

        monkeypatch.setattr(LoopCloser, "process_keyframe", slow)
        m, touched = build_world_map()
        for i in range(8):      # 8 completions in ~no time
            q, t = drifted_circle_pose(i)
            svc.on_frame(m, touched, q, t, i)
        svc.drain()
        assert svc.dropped_keyframes > 0
        assert len(svc.keyframes) >= 1
        assert len(svc.keyframes) + svc.dropped_keyframes == 8
