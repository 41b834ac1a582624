"""Checkpoint/resume: a restored state must continue the trajectory
identically to the uninterrupted run."""
import numpy as np
import jax
import pytest

from loam_livox_tpu.runtime.checkpoint import load_state, save_state
from loam_livox_tpu.runtime.odometry import init_state, odometry_step
from test_runtime import make_world, small_cfg, world_frame


class TestCheckpoint:
    def test_round_trip_continues_identically(self, tmp_path):
        cfg = small_cfg()
        rng = np.random.default_rng(0)
        cw, sw = make_world(rng)
        st = init_state(cfg)
        frames = []
        for i in range(6):
            t = np.array([0.02 * i, 0.0, 0.0], np.float32)
            q = np.array([1.0, 0, 0, 0], np.float32)
            frames.append(world_frame(cw, sw, q, t, cfg.capacity, 0.002, rng))
        for f in frames[:3]:
            st, _ = odometry_step(st, f, cfg)

        p = str(tmp_path / "ckpt")
        save_state(st, p)
        st2 = load_state(p, cfg)

        # equality of restored state
        for a, b in zip(jax.tree_util.tree_leaves(st),
                        jax.tree_util.tree_leaves(st2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # identical continuation
        for f in frames[3:]:
            st, _ = odometry_step(st, f, cfg)
            st2, _ = odometry_step(st2, f, cfg)
        np.testing.assert_allclose(np.asarray(st.t_w), np.asarray(st2.t_w),
                                   atol=1e-6)

    def test_capacity_mismatch_raises(self, tmp_path):
        cfg = small_cfg()
        st = init_state(cfg)
        p = str(tmp_path / "ckpt2")
        save_state(st, p)
        bad = small_cfg().replace(capacity={"map_surf_capacity": 8192})
        with pytest.raises(ValueError):
            load_state(p, bad)


@pytest.mark.slow
class TestLoopServiceCheckpoint:
    """VERDICT r3 item 7: a run checkpointed mid-trajectory must resume
    with its loop-service state (keyframes, open accumulators, waiting
    list) and still close a loop whose first visit predates the
    checkpoint (reference analogue: keyframe JSON persistence,
    ``laser_mapping.hpp:972-977``)."""

    def test_resume_still_closes_loop(self, tmp_path):
        """Drive the LoopCloser over the known-closing drifted-circle
        harness (test_loop_service), checkpoint mid-trajectory — after
        the first keyframes complete, before closure — restore, and the
        resumed service must close the SAME loop as the uninterrupted
        run."""
        from loam_livox_tpu.runtime.checkpoint import (
            load_loop_state,
            save_loop_state,
        )
        from loam_livox_tpu.runtime.loop_service import LoopCloser
        from test_loop_service import (
            build_world_map,
            drifted_circle_pose,
            service_cfg,
        )

        cfg = service_cfg()
        m, touched = build_world_map()

        # uninterrupted run
        ref = LoopCloser(cfg)
        closed_at = None
        for i in range(12):
            q, t = drifted_circle_pose(i, n=12)
            ref.on_frame(m, touched, q, t, i)
            ref.drain()     # settle the async loop-service worker
            if ref.closed:
                closed_at = i
                break
        assert ref.closed and closed_at is not None

        # checkpoint midway: keyframes exist, loop not yet closed
        cut = closed_at - 2
        p1 = LoopCloser(cfg)
        for i in range(cut):
            q, t = drifted_circle_pose(i, n=12)
            p1.on_frame(m, touched, q, t, i)
        p1.drain()
        assert not p1.closed
        assert len(p1.keyframes) > 0, "checkpoint must carry keyframes"
        path = str(tmp_path / "loop_ckpt.npz")
        save_loop_state(p1, path)

        p2 = load_loop_state(path, cfg)
        assert len(p2.keyframes) == len(p1.keyframes)
        assert [a.frames for a in p2.updating] == \
               [a.frames for a in p1.updating]
        for i in range(cut, 12):
            q, t = drifted_circle_pose(i, n=12)
            p2.on_frame(m, touched, q, t, i)
            p2.drain()
            if p2.closed:
                break
        assert p2.closed, (
            "resumed service must still close the loop whose first "
            "visit predates the checkpoint")
        assert p2.result.his_idx == ref.result.his_idx
        assert p2.result.cur_idx == ref.result.cur_idx
        np.testing.assert_allclose(p2.result.t_opt, ref.result.t_opt,
                                   atol=1e-5)

    def test_loop_state_round_trip(self, tmp_path):
        """Field-level round trip of a populated LoopCloser."""
        from loam_livox_tpu.core.config import SlamConfig
        from loam_livox_tpu.loop.keyframe import KeyframeDescriptor
        from loam_livox_tpu.runtime.checkpoint import (
            load_loop_state,
            save_loop_state,
        )
        from loam_livox_tpu.runtime.loop_service import (
            KeyframeRecord,
            LoopCloser,
            _Accumulator,
        )

        cfg = SlamConfig().replace(
            loop_closure={"if_enable_loop_closure": 1})
        c = LoopCloser(cfg)
        rng = np.random.default_rng(1)
        desc = KeyframeDescriptor(
            img_line=rng.random((60, 60), np.float32),
            img_plane=rng.random((60, 60), np.float32),
            img_line_roi=rng.random((60, 60), np.float32),
            img_plane_roi=rng.random((60, 60), np.float32),
            ratio_nonzero_line=np.float32(0.1),
            ratio_nonzero_plane=np.float32(0.2),
            center=np.zeros(3, np.float32),
            roi_range=np.float32(12.5),
            n_cells=np.int32(40), n_line=np.int32(7),
            n_plane=np.int32(21))
        c.keyframes.append(KeyframeRecord(
            keys=np.arange(5, dtype=np.int32),
            q=np.array([1, 0, 0, 0], np.float32),
            t=np.zeros(3, np.float32), ending_frame_idx=12,
            descriptor=desc,
            snap_line=rng.random((9, 3), np.float32),
            snap_plane=rng.random((30, 3), np.float32),
            snap_full=rng.random((50, 3), np.float32)))
        acc = _Accumulator()
        acc.keys = {3, 5, 9}
        acc.frames = 4
        c.updating = [acc, _Accumulator()]
        c.dropped_keyframes = 2

        p = str(tmp_path / "loop.npz")
        save_loop_state(c, p)
        c2 = load_loop_state(p, cfg)
        assert len(c2.keyframes) == 1
        k1, k2 = c.keyframes[0], c2.keyframes[0]
        np.testing.assert_array_equal(k1.keys, k2.keys)
        np.testing.assert_array_equal(k1.snap_plane, k2.snap_plane)
        for f in KeyframeDescriptor._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(k1.descriptor, f)),
                np.asarray(getattr(k2.descriptor, f)), err_msg=f)
        assert c2.updating[0].keys == {3, 5, 9}
        assert c2.updating[0].frames == 4
        assert len(c2.updating) == 2
        assert c2.dropped_keyframes == 2
        assert not c2.closed
