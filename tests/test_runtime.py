"""Runtime odometry-loop tests: state mechanics + closed-loop tracking
on a controlled synthetic world (no frontend, no simulator — this
isolates the odometry/mapping loop of `runtime.odometry` the way the
reference's per-frame path `laser_mapping.hpp:1316-1660` sits below its
ROS plumbing)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loam_livox_tpu.core import se3
from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.core.types import FeatureFrame, PointBatch
from loam_livox_tpu.runtime.odometry import init_state, odometry_step


def small_cfg(**over):
    mapping = {"init_accumulate_frames": 1, "maximum_histroy_buffer": 8}
    mapping.update(over.pop("mapping", {}))
    # the synthetic frames here are captured at a single pose (no
    # intra-frame motion), so the motion-deblur model must be off
    common = {"if_motion_deblur": 0, "piecewise_number": 1}
    common.update(over.pop("common", {}))
    over["common"] = common
    return SlamConfig().replace(
        capacity={
            "max_raw_points": 1024,
            "max_corner": 128,
            "max_surface": 512,
            "map_corner_capacity": 1024,
            "map_surf_capacity": 4096,
            "hist_corner_capacity": 128,
            "hist_surf_capacity": 512,
            "history_window": 8,
        },
        mapping=mapping,
        optimization={"icp_maximum_iteration": 5, "full_iterations": 5},
        **over,
    )


def make_world(rng):
    """Synthetic world: points on three orthogonal planes (surface) and
    along vertical edges (corners)."""
    n_per = 160
    # plane x=6 (y,z vary), plane y=4, plane z=-2
    p1 = np.stack([np.full(n_per, 6.0), rng.uniform(-6, 6, n_per),
                   rng.uniform(-3, 3, n_per)], axis=1)
    p2 = np.stack([rng.uniform(0, 8, n_per), np.full(n_per, 4.0),
                   rng.uniform(-3, 3, n_per)], axis=1)
    p3 = np.stack([rng.uniform(0, 8, n_per), rng.uniform(-6, 6, n_per),
                   np.full(n_per, -2.0)], axis=1)
    surface = np.concatenate([p1, p2, p3])
    # vertical edge lines at plane intersections
    z = rng.uniform(-3, 3, (3, 40))
    corners = np.concatenate([
        np.stack([np.full(40, 6.0), np.full(40, 4.0), z[0]], axis=1),
        np.stack([np.full(40, 6.0), np.full(40, -5.0), z[1]], axis=1),
        np.stack([np.full(40, 3.0), np.full(40, 4.0), z[2]], axis=1),
    ])
    return corners, surface


def world_frame(corners_w, surface_w, q, t, caps, noise, rng):
    """Observe the world from pose (q, t): sensor pts = R^T (w - t)."""
    R = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))

    def obs(pts_w, cap):
        pts = (pts_w - t) @ R
        pts = pts + rng.normal(scale=noise, size=pts.shape)
        out = np.zeros((cap, 3), np.float32)
        m = np.zeros((cap,), bool)
        k = min(len(pts), cap)
        out[:k] = pts[:k]
        m[:k] = True
        return PointBatch(xyz=jnp.asarray(out),
                          time=jnp.zeros((cap,), jnp.float32),
                          mask=jnp.asarray(m))

    return FeatureFrame(
        corners=obs(corners_w, caps.max_corner),
        surface=obs(surface_w, caps.max_surface),
        full=PointBatch.empty(caps.max_raw_points),
        time_min=jnp.float32(0.0),
        time_max=jnp.float32(0.1),
    )


class TestStateMechanics:
    def test_init_state_shapes(self):
        cfg = small_cfg()
        st = init_state(cfg)
        assert st.hist_corner_xyz.shape == (8, 128, 3)
        assert st.map_surface.capacity == 4096
        assert int(st.frame_count) == 0

    def test_init_frames_accumulate_into_map(self):
        cfg = small_cfg(mapping={"init_accumulate_frames": 3,
                                 "maximum_histroy_buffer": 8})
        rng = np.random.default_rng(0)
        cw, sw = make_world(rng)
        st = init_state(cfg)
        q = np.array([1.0, 0, 0, 0], np.float32)
        t = np.zeros(3, np.float32)
        for i in range(3):
            f = world_frame(cw, sw, q, t, cfg.capacity, 0.0, rng)
            st, reg = odometry_step(st, f, cfg)
            assert not bool(reg.enabled)       # still accumulating
            assert bool(reg.accepted)
        assert int(st.hist_len) == 3
        assert int(st.map_surface.count()) > 50

    def test_history_window_wraps(self):
        cfg = small_cfg()
        rng = np.random.default_rng(1)
        cw, sw = make_world(rng)
        st = init_state(cfg)
        q = np.array([1.0, 0, 0, 0], np.float32)
        for i in range(11):
            t = np.array([0.01 * i, 0, 0], np.float32)
            f = world_frame(cw, sw, q, t, cfg.capacity, 0.001, rng)
            st, _ = odometry_step(st, f, cfg)
        assert int(st.hist_len) <= 8
        assert int(st.frame_count) == 11


class TestClosedLoopTracking:
    def test_tracks_translation_and_yaw(self):
        """The loop must follow a slow screw motion within a few cm."""
        cfg = small_cfg()
        rng = np.random.default_rng(2)
        cw, sw = make_world(rng)
        st = init_state(cfg)

        n_frames = 10
        errs = []
        for i in range(n_frames):
            ang = 0.004 * i
            qz = np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)], np.float32)
            t = np.array([0.02 * i, 0.01 * i, 0.0], np.float32)
            f = world_frame(cw, sw, qz, t, cfg.capacity, 0.002, rng)
            st, reg = odometry_step(st, f, cfg)
            errs.append(np.linalg.norm(np.asarray(st.t_w) - t))
        # First frame initializes at identity; afterwards the estimate
        # must stay close to ground truth.
        assert errs[-1] < 0.05, f"drift too large: {errs}"
        assert np.mean(errs[2:]) < 0.05

    def test_tracks_in_cell_matching_mode(self):
        """matching_mode=1: the matching buffer comes from the cell-map
        radius/FoV gather instead of the history window
        (reference laser_mapping.hpp:471-515)."""
        cfg = small_cfg(mapping={"init_accumulate_frames": 1,
                                 "maximum_histroy_buffer": 8,
                                 "matching_mode": 1,
                                 "maximum_in_fov_angle": 180.0})
        rng = np.random.default_rng(6)
        cw, sw = make_world(rng)
        st = init_state(cfg)
        for i in range(8):
            t = np.array([0.02 * i, 0.01 * i, 0.0], np.float32)
            q = np.array([1.0, 0, 0, 0], np.float32)
            f = world_frame(cw, sw, q, t, cfg.capacity, 0.002, rng)
            st, reg = odometry_step(st, f, cfg)
        assert int(st.cell_planes.n_cells()) > 10
        err = np.linalg.norm(np.asarray(st.t_w) - np.array([0.14, 0.07, 0.0]))
        assert err < 0.05, f"cell-mode drift {err}"

    def test_static_scene_stays_put(self):
        cfg = small_cfg()
        rng = np.random.default_rng(3)
        cw, sw = make_world(rng)
        st = init_state(cfg)
        q = np.array([1.0, 0, 0, 0], np.float32)
        t0 = np.zeros(3, np.float32)
        for i in range(6):
            f = world_frame(cw, sw, q, t0, cfg.capacity, 0.002, rng)
            st, reg = odometry_step(st, f, cfg)
        assert np.linalg.norm(np.asarray(st.t_w)) < 0.02
