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
