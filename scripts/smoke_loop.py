"""End-to-end loop-closure drive through the OdometryPipeline surface:
a synthetic structured world observed from a circular trajectory that
revisits its start with injected drift; expects the pipeline's loop
service to fire and produce optimized poses."""
import os, sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from loam_livox_tpu.core import se3
from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.core.types import FeatureFrame, PointBatch
from loam_livox_tpu.runtime.pipeline import OdometryPipeline

sys.path.insert(0, "/root/repo/tests")
from test_loop import structured_world  # noqa: E402

cfg = SlamConfig().replace(
    capacity={
        "max_raw_points": 4096, "max_corner": 256, "max_surface": 2048,
        "map_corner_capacity": 4096, "map_surf_capacity": 16384,
        "hist_corner_capacity": 128, "hist_surf_capacity": 1024,
        "history_window": 16, "cell_capacity": 4096,
        "cell_point_capacity": 16, "cell_max_new_per_frame": 1024,
    },
    mapping={"init_accumulate_frames": 1},
    optimization={"icp_maximum_iteration": 4, "full_iterations": 4},
    loop_closure={
        "if_enable_loop_closure": 1,
        "scans_of_each_keyframe": 4,
        "scans_between_two_keyframe": 2,
        "minimum_keyframe_differen": 4,
        "avail_ratio_plane": 0.001,
        "avail_ratio_line": 0.0,
    },
)

rng = np.random.default_rng(21)
world = structured_world(rng, n_planes=10, n_lines=6, pts_per=220)
cw = world[: 1000]   # treat a slice as corner-ish structure source
caps = cfg.capacity


def observe(q, t, noise=0.002):
    R = np.asarray(se3.quat_to_matrix(jnp.asarray(q, jnp.float32)))

    def batch(pts_w, cap):
        pts = (pts_w - t) @ R
        pts = pts + rng.normal(scale=noise, size=pts.shape)
        out = np.zeros((cap, 3), np.float32)
        m = np.zeros((cap,), bool)
        k = min(len(pts), cap)
        sel = rng.choice(len(pts), size=k, replace=False)
        out[:k] = pts[sel]
        m[:k] = True
        return PointBatch(xyz=jnp.asarray(out), time=jnp.zeros(cap),
                          mask=jnp.asarray(m))

    return FeatureFrame(
        corners=batch(cw, caps.max_corner),
        surface=batch(world, caps.max_surface),
        full=batch(world, caps.max_raw_points),
        time_min=jnp.float32(0.0), time_max=jnp.float32(0.1),
    )


pipe = OdometryPipeline(cfg)
N = 24
for i in range(N):
    ang = 2 * np.pi * i / N
    q = np.array([np.cos(ang / 8), 0, 0, np.sin(ang / 8)], np.float32)
    t = np.array([np.cos(ang) - 1, np.sin(ang), 0.0], np.float32) * 1.5
    f = observe(q, t)
    pipe.state, reg = __import__("loam_livox_tpu.runtime.odometry",
                                 fromlist=["odometry_step"]).odometry_step(
        pipe.state, f, cfg)
    if pipe.loop_closer is not None and not pipe.loop_closer.closed:
        pipe.loop_closer.on_frame(pipe.state.cell_full,
                                  pipe.state.last_touched,
                                  np.asarray(reg.q_w), np.asarray(reg.t_w), i)
    print(f"frame {i}: t_w={np.round(np.asarray(reg.t_w),3)} "
          f"acc={bool(reg.accepted)} kfs={len(pipe.loop_closer.keyframes)} "
          f"closed={pipe.loop_closer.closed}")
    if pipe.loop_closer.closed:
        r = pipe.loop_closer.result
        print("LOOP CLOSED:", r.cur_idx, "->", r.his_idx,
              "score", round(r.icp_score, 4))
        print("optimized t:", np.round(r.t_opt, 3))
        ref = pipe.loop_closer.refine_keyframe_cloud(pipe.state.cell_full, 0)
        print("refined cloud:", ref.shape, "finite:", bool(np.isfinite(ref).all()))
        break
else:
    print("NO LOOP CLOSED")
