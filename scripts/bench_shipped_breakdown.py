"""Roofline of the SHIPPED-profile frame (VERDICT r4 item 7): where do
the milliseconds go at the precision profile's production shape —
piecewise-3, deblur off, full capacities — and what is the marginal
cost of an outer ICP iteration / an inner LM step there.

Unlike scripts/bench_breakdown.py (toy warm state, per-stage timings
polluted by ~1 ms dispatch RTT through the remote-TPU tunnel), every
stage here is measured AMORTIZED: the stage runs `reps` times inside
one jitted `lax.fori_loop` with a carried data dependency, so the
per-rep time is pure on-device cost.

Run on the TPU chip:  python scripts/bench_shipped_breakdown.py
Writes scripts/bench_shipped_breakdown_out.json and prints it.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_xla_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from loam_livox_tpu.core.config import precision_profile
    from loam_livox_tpu.frontend.livox import (
        extract_point_info,
        select_features,
    )
    from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig
    from loam_livox_tpu.ops.voxel import voxel_downsample
    from loam_livox_tpu.registration.icp import register_frame
    from loam_livox_tpu.runtime.odometry import init_state, input_downsample
    from loam_livox_tpu.runtime.pipeline import process_raw_frame

    results = {"device": jax.devices()[0].device_kind}

    cfg = precision_profile().replace(
        mapping={"init_accumulate_frames": 10})
    fe, caps, opt = cfg.feature_extraction, cfg.capacity, cfg.optimization
    pieces = cfg.common.piecewise_number

    # ---- warm stream + state at the shipped shape -----------------------
    sim = LivoxSimulator(SimConfig(points_per_frame=10000))
    raw = []
    n_warm, n_bench = 30, 30
    for i in range(n_warm + n_bench):
        xyz, inten, t0 = sim.frame(i)
        pts = np.zeros((caps.max_raw_points, 3), np.float32)
        it = np.zeros((caps.max_raw_points,), np.float32)
        m = np.zeros((caps.max_raw_points,), bool)
        k = min(len(xyz), caps.max_raw_points)
        pts[:k], it[:k], m[:k] = xyz[:k], inten[:k], True
        raw.append((jnp.asarray(pts), jnp.asarray(it), jnp.asarray(m),
                    jnp.float32(t0)))

    def warm_and_time(cfg_x, label):
        state = init_state(cfg_x)
        for i in range(n_warm):
            state, _, _ = process_raw_frame(state, *raw[i], cfg_x,
                                            piecewise_number=pieces)
        jax.block_until_ready(state)
        t0w = time.perf_counter()
        for i in range(n_warm, n_warm + n_bench):
            state, _, _ = process_raw_frame(state, *raw[i], cfg_x,
                                            piecewise_number=pieces)
        jax.block_until_ready(state)
        ms = (time.perf_counter() - t0w) / n_bench * 1000.0
        results[label] = round(ms, 3)
        return state, ms

    state, base_ms = warm_and_time(cfg, "frame_ms_baseline")
    results["fps_baseline"] = round(1000.0 / base_ms, 2)

    # ---- per-piece ICP iteration counts at the warm state ---------------
    from functools import partial

    @partial(jax.jit, static_argnames=("cfg_", "pieces_"))
    def piece_iters(st, pts, inten, mask, t0, cfg_, pieces_):
        info, n_petals = extract_point_info(pts, inten, mask, t0,
                                            cfg_.feature_extraction,
                                            cfg_.capacity)
        bounds = jnp.stack(
            [jnp.arange(pieces_) / pieces_,
             (jnp.arange(pieces_) + 1) / pieces_], -1).astype(jnp.float32)

        def step(s, lohi):
            from loam_livox_tpu.runtime.odometry import odometry_step

            piece = select_features(pts, info, n_petals, lohi[0], lohi[1],
                                    cfg_.feature_extraction, cfg_.capacity)
            piece = piece._replace(
                corners=voxel_downsample(
                    piece.corners, cfg_.feature_extraction
                    .mapping_line_resolution, capacity=cfg_.capacity
                    .max_corner),
                surface=voxel_downsample(
                    piece.surface, cfg_.feature_extraction
                    .mapping_plane_resolution / 2.0,
                    capacity=cfg_.capacity.max_surface))
            s, reg = odometry_step(s, piece, cfg_)
            nc = jnp.sum(piece.corners.mask.astype(jnp.int32))
            ns = jnp.sum(piece.surface.mask.astype(jnp.int32))
            return s, (reg.iterations, reg.n_blocks, nc, ns)

        st, out = lax.scan(step, st, bounds)
        return st, out

    st2 = state
    iters_all, blocks_all, nc_all, ns_all = [], [], [], []
    for i in range(n_warm, n_warm + 10):
        st2, (its, nb, nc, ns) = piece_iters(st2, *raw[i], cfg, pieces)
        iters_all += [int(x) for x in np.asarray(its)]
        blocks_all += [int(x) for x in np.asarray(nb)]
        nc_all += [int(x) for x in np.asarray(nc)]
        ns_all += [int(x) for x in np.asarray(ns)]
    results["icp_iters_mean"] = round(float(np.mean(iters_all)), 2)
    results["icp_iters_max"] = int(np.max(iters_all))
    results["blocks_mean"] = int(np.mean(blocks_all))
    results["piece_corner_fill_mean"] = int(np.mean(nc_all))
    results["piece_surface_fill_mean"] = int(np.mean(ns_all))

    # ---- knob marginals --------------------------------------------------
    for label, over in [
        ("frame_ms_full2", {"optimization": {"full_iterations": 2}}),
        ("frame_ms_full3", {"optimization": {"full_iterations": 3}}),
        ("frame_ms_prerun1", {"optimization": {"prerun_iterations": 1}}),
        ("frame_ms_cv_init", {"optimization": {"increment_init": 1}}),
        ("frame_ms_icp10", {"optimization": {"icp_maximum_iteration": 10}}),
    ]:
        warm_and_time(cfg.replace(**over), label)

    # ---- amortized stage microbenches at the real piece shape -----------
    # one piece's real inputs from the warm state
    pts, inten, mask, t0 = raw[n_warm]
    info, n_petals = jax.jit(extract_point_info, static_argnums=(4, 5))(
        pts, inten, mask, t0, fe, caps)
    piece = select_features(pts, info, n_petals, 0.0, 1.0 / pieces, fe, caps)
    piece = piece._replace(
        corners=voxel_downsample(piece.corners, fe.mapping_line_resolution,
                                 capacity=caps.max_corner),
        surface=voxel_downsample(piece.surface,
                                 fe.mapping_plane_resolution / 2.0,
                                 capacity=caps.max_surface))
    corner_in, surf_in = input_downsample(piece, cfg)
    qc, qs = corner_in.xyz, surf_in.xyz

    from loam_livox_tpu.ops.pallas import knn_fused
    from loam_livox_tpu.ops.pallas.knn_fused import build_ref4
    from loam_livox_tpu.registration import residuals as res
    from loam_livox_tpu.registration.gauss_newton import solve_two_phase

    on_tpu = jax.default_backend() == "tpu"
    mapc, maps = state.map_corners, state.map_surface
    r4c = build_ref4(mapc.xyz, mapc.mask)
    r4s = build_ref4(maps.xyz, maps.mask)
    nqc = jnp.sum(corner_in.mask.astype(jnp.int32))
    nqs = jnp.sum(surf_in.mask.astype(jnp.int32))

    REPS = 50

    def amortized(label, body, init_carry):
        """Per-rep ms of `body` via (T(REPS) - T(5)) / (REPS - 5) inside
        jitted fori_loops — dispatch and fixed costs cancel."""
        @partial(jax.jit, static_argnames=("reps",))
        def loop(carry, reps):
            return lax.fori_loop(0, reps, body, carry)

        for reps in (5, REPS):
            jax.block_until_ready(loop(init_carry, reps))  # compile+warm
        times = {}
        for reps in (5, REPS):
            t0_ = time.perf_counter()
            for _ in range(3):
                out = loop(init_carry, reps)
            jax.block_until_ready(out)
            times[reps] = (time.perf_counter() - t0_) / 3
        ms = (times[REPS] - times[5]) / (REPS - 5) * 1000.0
        results[label] = round(ms, 4)
        return ms

    if on_tpu:
        def knn_body(i, carry):
            qc_, qs_ = carry
            cd, ci = knn_fused(qc_, mapc.xyz, mapc.mask, k=5, ref4=r4c,
                               query_count=nqc)
            sd, si = knn_fused(qs_, maps.xyz, maps.mask, k=5, ref4=r4s,
                               query_count=nqs)
            return (qc_ + 1e-12 * cd[:, :1], qs_ + 1e-12 * sd[:, :1])

        knn_ms = amortized("knn_pair_ms", knn_body, (qc, qs))

        cd, ci = knn_fused(qc, mapc.xyz, mapc.mask, k=5, ref4=r4c,
                           query_count=nqc)
        sd, si = knn_fused(qs, maps.xyz, maps.mask, k=5, ref4=r4s,
                           query_count=nqs)

        def tgt_body(i, carry):
            cd_, sd_ = carry
            lt = res.build_line_targets(cd_, ci, mapc.xyz, corner_in.mask,
                                        opt.maximum_dis_line_for_match)
            pt = res.build_plane_targets(sd_, si, maps.xyz, surf_in.mask,
                                         opt.maximum_dis_plane_for_match)
            return (cd_ + 1e-12 * lt.valid[:, None],
                    sd_ + 1e-12 * pt.valid[:, None])

        tgt_ms = amortized("target_build_ms", tgt_body, (cd, sd))

        lt = res.build_line_targets(cd, ci, mapc.xyz, corner_in.mask,
                                    opt.maximum_dis_line_for_match)
        pt = res.build_plane_targets(sd, si, maps.xyz, surf_in.mask,
                                     opt.maximum_dis_plane_for_match)
        base_mask = jnp.concatenate([lt.valid, pt.valid])
        sc = jnp.ones(qc.shape[0], jnp.float32)
        ss = jnp.ones(qs.shape[0], jnp.float32)
        q0 = state.q_w
        t0v = state.t_w

        def f_with_mask(extra_mask):
            def f(q, t):
                rl = res.line_residuals(q, t, qc, sc, lt, q0, t0v, False)
                rp = res.plane_residuals(q, t, qs, ss, pt, q0, t0v, False)
                return jnp.concatenate([rl, rp], 0), extra_mask
            return f

        def fj_with_mask(extra_mask):
            def fj(q, t):
                r, _ = f_with_mask(extra_mask)(q, t)
                jc = res.point_world_jacobian(q, t, qc, q0)
                js = res.point_world_jacobian(q, t, qs, q0)
                J = jnp.concatenate([res.line_jacobian(jc, lt),
                                     res.plane_jacobian(js, pt)], 0)
                return r, J, extra_mask
            return fj

        ident = jnp.array([1.0, 0, 0, 0], jnp.float32)
        zero = jnp.zeros(3, jnp.float32)

        def lm_body(i, carry):
            q, t = carry
            qn, tn, info_ = solve_two_phase(f_with_mask, base_mask, q, t,
                                            opt, fj_with_mask)
            return (q + 1e-12 * qn, t + 1e-12 * tn)

        lm_ms = amortized("lm_chain_ms", lm_body, (ident, zero))

        def transform_body(i, carry):
            q, t = carry
            w1 = res.transform_points_incre(q, t, qc, sc, q0, t0v, False)
            w2 = res.transform_points_incre(q, t, qs, ss, q0, t0v, False)
            return (q + 1e-12 * w1[0, 0], t + 1e-12 * w2[0])

        tr_ms = amortized("transform_pair_ms", transform_body, (ident, zero))

        per_iter = knn_ms + tgt_ms + lm_ms + tr_ms
        results["icp_iter_sum_ms"] = round(per_iter, 4)
        results["icp_total_est_ms"] = round(
            per_iter * results["icp_iters_mean"] * pieces, 2)

    # front-end: extract + per-piece select/downsample, amortized
    def fe_body(i, carry):
        p = carry
        info_, n_p = extract_point_info(p, inten, mask, t0, fe, caps)
        outs = []
        for q in range(pieces):
            fr = select_features(p, info_, n_p, q / pieces,
                                 (q + 1) / pieces, fe, caps)
            fr = fr._replace(
                corners=voxel_downsample(fr.corners,
                                         fe.mapping_line_resolution,
                                         capacity=caps.max_corner),
                surface=voxel_downsample(fr.surface,
                                         fe.mapping_plane_resolution / 2.0,
                                         capacity=caps.max_surface))
            outs.append(fr.corners.xyz[0, 0])
        return p + 1e-12 * sum(outs)

    fe_ms = amortized("frontend_3piece_ms", fe_body, pts)

    # input downsample ×3, amortized
    def ids_body(i, carry):
        p = carry
        c_, s_ = input_downsample(piece._replace(
            corners=piece.corners._replace(
                xyz=piece.corners.xyz + p * 1e-12)), cfg)
        return carry + 1e-12 * c_.xyz[0, 0]

    ids_ms = amortized("input_downsample_ms", ids_body, jnp.float32(0.0))

    # commit path (everything in odometry_step minus register_frame):
    # measure odometry_step with icp_maximum_iteration=0? Not valid —
    # approximate as frame_ms - frontend - 3*icp_est instead.
    if on_tpu:
        accounted = (fe_ms + 3 * ids_ms
                     + results["icp_iter_sum_ms"]
                     * results["icp_iters_mean"] * pieces)
        results["accounted_ms"] = round(accounted, 2)
        results["unaccounted_ms"] = round(base_ms - accounted, 2)

    out = {k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in results.items()}
    path = os.path.join(os.path.dirname(__file__),
                        "bench_shipped_breakdown_out.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
