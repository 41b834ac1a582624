"""Per-dispatch breakdown of the odometry frame budget on the chip
(VERDICT r3 item 5): where do the milliseconds go inside one frame —
front-end, correspondence, target build, the LM chain (prerun → prune →
full solve), commit/rebuild — plus a speed-of-light row for the J^T J
build and an A/B of the constant-velocity increment init.

Run on the TPU chip:  python scripts/bench_breakdown.py
Writes scripts/bench_breakdown_out.json and prints it.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, n=30, warmup=3, **kw):
    import jax

    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0  # ms


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_xla_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from functools import partial

    from loam_livox_tpu.core.config import SlamConfig
    from loam_livox_tpu.frontend.livox import (
        extract_point_info,
        select_features,
    )
    from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig
    from loam_livox_tpu.ops.voxel import voxel_downsample
    from loam_livox_tpu.registration.icp import register_frame
    from loam_livox_tpu.runtime.odometry import (
        init_state,
        input_downsample,
        odometry_step,
    )
    from loam_livox_tpu.runtime.pipeline import process_raw_frame

    results = {}

    def build(cfg, n_warm=30):
        sim = LivoxSimulator(SimConfig(points_per_frame=10000))
        caps = cfg.capacity
        state = init_state(cfg)
        raw = []
        for i in range(n_warm + 1):
            xyz, inten, t0 = sim.frame(i)
            pts = np.zeros((caps.max_raw_points, 3), np.float32)
            it = np.zeros((caps.max_raw_points,), np.float32)
            m = np.zeros((caps.max_raw_points,), bool)
            k = min(len(xyz), caps.max_raw_points)
            pts[:k], it[:k], m[:k] = xyz[:k], inten[:k], True
            raw.append((jnp.asarray(pts), jnp.asarray(it), jnp.asarray(m),
                        jnp.float32(t0)))
        for i in range(n_warm):
            state, _, _ = process_raw_frame(state, *raw[i], cfg,
                                            piecewise_number=1)
        jax.block_until_ready(state)
        return state, raw

    cfg = SlamConfig().replace(mapping={"init_accumulate_frames": 10})
    state, raw = build(cfg)
    pts, inten, mask, t0 = raw[-1]
    fe, caps = cfg.feature_extraction, cfg.capacity

    # ---- stage programs --------------------------------------------------
    @jax.jit
    def frontend_only(pts, inten, mask, t0):
        info, n_petals = extract_point_info(pts, inten, mask, t0, fe, caps)
        fr = select_features(pts, info, n_petals, 0.0, 1.0, fe, caps)
        return fr._replace(
            corners=voxel_downsample(fr.corners, fe.mapping_line_resolution,
                                     capacity=caps.max_corner),
            surface=voxel_downsample(fr.surface,
                                     fe.mapping_plane_resolution / 2.0,
                                     capacity=caps.max_surface))

    frame = frontend_only(pts, inten, mask, t0)
    corner_in, surf_in = jax.jit(
        partial(input_downsample, cfg=cfg))(frame)

    results["frontend_ms"] = timeit(frontend_only, pts, inten, mask, t0)

    # registration at the warm state, full ICP
    @jax.jit
    def reg_only(state, corner_in, surf_in, frame):
        return register_frame(
            corner_in, surf_in, state.map_corners, state.map_surface,
            state.q_w, state.t_w, frame.time_min, frame.time_max,
            jnp.bool_(True), state.rng, cfg,
            grid_corners=state.grid_corners, grid_surface=state.grid_surface)

    results["register_frame_ms"] = timeit(reg_only, state, corner_in,
                                          surf_in, frame)
    reg = reg_only(state, corner_in, surf_in, frame)
    results["icp_iterations"] = int(reg.iterations)

    # full step (adds commit + cadenced rebuild)
    results["odometry_step_ms"] = timeit(
        lambda: odometry_step(state, frame, cfg)[0])
    results["process_raw_frame_ms"] = timeit(
        lambda: process_raw_frame(state, pts, inten, mask, t0, cfg,
                                  piecewise_number=1)[0])

    # ---- inside one ICP iteration ---------------------------------------
    from loam_livox_tpu.ops.pallas.knn_fused import build_ref4
    from loam_livox_tpu.ops.pallas import knn_fused
    from loam_livox_tpu.registration import residuals as res
    from loam_livox_tpu.registration.gauss_newton import (
        _normal_system,
        _system_from_rJ,
        _solve_damped,
        solve_two_phase,
    )

    on_tpu = jax.default_backend() == "tpu"
    opt = cfg.optimization
    if on_tpu:
        r4c = build_ref4(state.map_corners.xyz, state.map_corners.mask)
        r4s = build_ref4(state.map_surface.xyz, state.map_surface.mask)
        nqc = jnp.sum(corner_in.mask.astype(jnp.int32))
        nqs = jnp.sum(surf_in.mask.astype(jnp.int32))

        @jax.jit
        def corr(qc, qs):
            cd, ci = knn_fused(qc, state.map_corners.xyz,
                               state.map_corners.mask, k=5, ref4=r4c,
                               query_count=nqc)
            sd, si = knn_fused(qs, state.map_surface.xyz,
                               state.map_surface.mask, k=5, ref4=r4s,
                               query_count=nqs)
            return cd, ci, sd, si

        results["correspondence_ms"] = timeit(corr, corner_in.xyz,
                                              surf_in.xyz)
        cd, ci, sd, si = corr(corner_in.xyz, surf_in.xyz)

        @jax.jit
        def targets(cd, ci, sd, si):
            lt = res.build_line_targets(cd, ci, state.map_corners.xyz,
                                        corner_in.mask,
                                        opt.maximum_dis_line_for_match)
            pt = res.build_plane_targets(sd, si, state.map_surface.xyz,
                                         surf_in.mask,
                                         opt.maximum_dis_plane_for_match)
            return lt, pt

        results["target_build_ms"] = timeit(targets, cd, ci, sd, si)
        lt, pt = targets(cd, ci, sd, si)

        # the LM chain on the frozen correspondence set
        nq = jnp.float32(1.0)
        base_mask = jnp.concatenate([lt.valid, pt.valid])
        sc = jnp.ones(corner_in.xyz.shape[0], jnp.float32)
        ss = jnp.ones(surf_in.xyz.shape[0], jnp.float32)
        q0 = state.q_w
        t0v = state.t_w

        def f_with_mask(extra_mask):
            def f(q, t):
                rl = res.line_residuals(q, t, corner_in.xyz, sc, lt,
                                        q0, t0v, True)
                rp = res.plane_residuals(q, t, surf_in.xyz, ss, pt,
                                         q0, t0v, True)
                return jnp.concatenate([rl, rp], axis=0), extra_mask
            return f

        ident = jnp.array([1.0, 0, 0, 0], jnp.float32)
        zero = jnp.zeros(3, jnp.float32)

        @jax.jit
        def lm_chain():
            return solve_two_phase(f_with_mask, base_mask, ident, zero, opt)

        results["lm_chain_ms"] = timeit(lm_chain)

        # speed-of-light row for the J^T J build: N residual blocks,
        # (N,3,6)^T (N,3,6) in f32 = N*324 MACs ≈ tiny; the real cost
        # is dispatch + HBM for J. Measure _system_from_rJ alone.
        N = base_mask.shape[0]
        rr = jnp.ones((N, 3), jnp.float32) * 0.01
        JJ = jnp.ones((N, 3, 6), jnp.float32) * 0.1

        @jax.jit
        def jtj(rr, JJ, m):
            return _system_from_rJ(rr, JJ, m, opt.huber_delta)

        results["jtj_build_ms"] = timeit(jtj, rr, JJ, base_mask)
        results["jtj_n_blocks"] = int(N)
        # SoL: HBM read of J (N*18*4 B) at ~1.2 TB/s + r/w overhead
        results["jtj_sol_ms"] = round(N * 18 * 4 / 1.2e12 * 1e3, 4)

    # ---- constant-velocity increment init A/B ---------------------------
    cfg_cv = cfg.replace(optimization={"increment_init": 1})
    state_cv, raw_cv = build(cfg_cv)
    n_bench = 30

    def run_fps(cfg_x, state_x, raw_x):
        st = state_x
        t0w = time.perf_counter()
        iters = []
        for i in range(n_bench):
            st, reg, _ = process_raw_frame(st, *raw_x[i % len(raw_x)],
                                           cfg_x, piecewise_number=1)
            iters.append(reg.iterations)
        jax.block_until_ready(st)
        wall = time.perf_counter() - t0w
        return n_bench / wall, float(np.mean([int(x) for x in iters]))

    fps_id, it_id = run_fps(cfg, state, raw)
    fps_cv, it_cv = run_fps(cfg_cv, state_cv, raw_cv)
    results["fps_identity_init"] = round(fps_id, 2)
    results["fps_constvel_init"] = round(fps_cv, 2)
    results["iters_identity_init"] = round(it_id, 2)
    results["iters_constvel_init"] = round(it_cv, 2)

    out = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in results.items()}
    with open(os.path.join(os.path.dirname(__file__),
                           "bench_breakdown_out.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
