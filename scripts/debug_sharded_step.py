"""Isolate WHERE sharded-vs-unsharded divergence enters a single
odometry step: build a warm state unsharded, then run components
(kNN, register_frame, odometry_step) with the map arrays sharded vs
replicated on identical inputs and compare outputs bitwise.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
if cache:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.eval.scenarios import SMALL_CAPS
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig, Trajectory
from loam_livox_tpu.parallel import make_mesh
from loam_livox_tpu.parallel.layout import replicate, shard_state
from loam_livox_tpu.runtime.odometry import init_state
from loam_livox_tpu.runtime.pipeline import process_raw_frame


def cmp(name, a, b):
    a, b = np.asarray(a), np.asarray(b)
    if a.dtype == bool or np.issubdtype(a.dtype, np.integer):
        neq = int((a != b).sum())
        print(f"  {name:<24} mismatches={neq}/{a.size}")
        return neq
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    print(f"  {name:<24} max|Δ|={d.max():.3e}  n>1e-6: "
          f"{int((d > 1e-6).sum())}/{a.size}")
    return d.max()


def main():
    cfg = SlamConfig().replace(
        capacity=SMALL_CAPS,
        mapping={"init_accumulate_frames": 6},
        optimization={"icp_maximum_iteration": 5, "full_iterations": 3},
    )
    ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
    sim = LivoxSimulator(SimConfig(points_per_frame=3072, seed=3),
                         traj=Trajectory(ramp_t0=ramp))
    caps = cfg.capacity

    def raw(i):
        xyz, inten, t0 = sim.frame(i)
        n = caps.max_raw_points
        pts = np.zeros((n, 3), np.float32)
        it = np.zeros((n,), np.float32)
        m = np.zeros((n,), bool)
        k = min(len(xyz), n)
        pts[:k], it[:k], m[:k] = xyz[:k], inten[:k], True
        return (jnp.asarray(pts), jnp.asarray(it), jnp.asarray(m),
                jnp.float32(t0))

    # Warm up 10 frames unsharded so registration is enabled and the
    # matching buffer is populated.
    state = init_state(cfg)
    frames = [raw(i) for i in range(12)]
    for i in range(10):
        state, _, _ = process_raw_frame(state, *frames[i], cfg,
                                        piecewise_number=1)
    state = jax.device_get(state)
    state = jax.tree_util.tree_map(jnp.asarray, state)

    mesh = make_mesh(8)
    state_sh = shard_state(state, mesh)

    # ---- component: dense kNN over the sharded map buffer ----------------
    from loam_livox_tpu.ops.knn import knn

    q = state.map_corners.xyz[:256]
    d1, i1 = knn(q, state.map_surface.xyz, state.map_surface.mask, k=5,
                 precision=cfg.optimization.knn_precision)
    d2, i2 = knn(replicate(q, mesh), state_sh.map_surface.xyz,
                 state_sh.map_surface.mask, k=5,
                 precision=cfg.optimization.knn_precision)
    print("kNN (dense engine), sharded ref vs replicated:")
    cmp("sq_dists", d1, d2)
    cmp("indices", i1, i2)

    # ---- component: one full odometry step -------------------------------
    print("one odometry_step, sharded state vs unsharded:")
    inp = frames[10]
    s1, r1, _ = process_raw_frame(state, *inp, cfg, piecewise_number=1)
    s2, r2, _ = process_raw_frame(state_sh, *replicate(inp, mesh), cfg,
                                  piecewise_number=1)
    for f in ("t_w", "q_w", "final_cost", "gate_cost", "inlier_threshold",
              "n_blocks", "iterations", "accepted"):
        cmp(f, getattr(r1, f), getattr(r2, f))
    cmp("state.map_surface.xyz", s1.map_surface.xyz, s2.map_surface.xyz)
    cmp("state.map_surface.mask", s1.map_surface.mask, s2.map_surface.mask)
    cmp("state.hist_surf_xyz", s1.hist_surf_xyz, s2.hist_surf_xyz)

    # ---- second step (compounding) ---------------------------------------
    print("second odometry_step:")
    inp = frames[11]
    s1b, r1b, _ = process_raw_frame(s1, *inp, cfg, piecewise_number=1)
    s2b, r2b, _ = process_raw_frame(s2, *replicate(inp, mesh), cfg,
                                    piecewise_number=1)
    for f in ("t_w", "final_cost", "gate_cost", "iterations", "accepted"):
        cmp(f, getattr(r1b, f), getattr(r2b, f))


if __name__ == "__main__":
    main()
