"""Bisect the cost of ONE real ICP iteration at the shipped-precision
shape: cumulative stage variants (transform → kNN → targets → LM solve)
chained through a carried (q, t) so nothing hoists out of the timing
loop.  Identifies which stage owns the ~1.5 ms/iteration the shipped
profile pays (scripts/bench_shipped_breakdown.py).

Run on the TPU chip:  python scripts/bench_icp_iter_bisect.py
"""
import json
import os
import sys
import time
from functools import partial

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

    from loam_livox_tpu.core.config import precision_profile
    from loam_livox_tpu.frontend.livox import (
        extract_point_info,
        select_features,
    )
    from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig
    from loam_livox_tpu.ops.pallas import knn_fused
    from loam_livox_tpu.ops.pallas.knn_fused import build_ref_operand
    from loam_livox_tpu.ops.voxel import voxel_downsample
    from loam_livox_tpu.registration import residuals as res
    from loam_livox_tpu.registration.gauss_newton import solve_two_phase
    from loam_livox_tpu.runtime.odometry import init_state, input_downsample
    from loam_livox_tpu.runtime.pipeline import process_raw_frame

    results = {}
    cfg = precision_profile().replace(mapping={"init_accumulate_frames": 10})
    fe, caps, opt = cfg.feature_extraction, cfg.capacity, cfg.optimization
    pieces = cfg.common.piecewise_number

    sim = LivoxSimulator(SimConfig(points_per_frame=10000))
    raw = []
    for i in range(31):
        xyz, inten, t0 = sim.frame(i)
        pts = np.zeros((caps.max_raw_points, 3), np.float32)
        it = np.zeros((caps.max_raw_points,), np.float32)
        m = np.zeros((caps.max_raw_points,), bool)
        k = min(len(xyz), caps.max_raw_points)
        pts[:k], it[:k], m[:k] = xyz[:k], inten[:k], True
        raw.append((jnp.asarray(pts), jnp.asarray(it), jnp.asarray(m),
                    jnp.float32(t0)))
    state = init_state(cfg)
    for i in range(30):
        state, _, _ = process_raw_frame(state, *raw[i], cfg,
                                        piecewise_number=pieces)
    jax.block_until_ready(state)

    pts, inten, mask, t0 = raw[30]
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

    mapc, maps = state.map_corners, state.map_surface
    ref4_c = build_ref_operand(mapc.xyz, mapc.mask)
    ref4_s = build_ref_operand(maps.xyz, maps.mask)
    nqc = jnp.sum(corner_in.mask.astype(jnp.int32))
    nqs = jnp.sum(surf_in.mask.astype(jnp.int32))
    rad_c = float(opt.maximum_dis_line_for_match) ** 0.5
    rad_s = float(opt.maximum_dis_plane_for_match) ** 0.5
    sc = jnp.ones(corner_in.xyz.shape[0], jnp.float32)
    ss = jnp.ones(surf_in.xyz.shape[0], jnp.float32)
    q_last, t_last = state.q_w, state.t_w

    def iteration(q, t, upto):
        """One real ICP iteration, truncated after stage `upto`."""
        qc = res.transform_points_incre(q, t, corner_in.xyz, sc,
                                        q_last, t_last, False)
        qs = res.transform_points_incre(q, t, surf_in.xyz, ss,
                                        q_last, t_last, False)
        if upto == "transform":
            return q + 1e-9 * qc[0, 0], t + 1e-9 * qs[0]
        cd, ci = knn_fused(qc, mapc.xyz, mapc.mask, k=5, ref4=ref4_c,
                           query_count=nqc, max_radius=rad_c)
        sd, si = knn_fused(qs, maps.xyz, maps.mask, k=5, ref4=ref4_s,
                           query_count=nqs, max_radius=rad_s)
        if upto == "knn":
            return q + 1e-9 * cd[0, 0], t + 1e-9 * sd[0, :3]
        lt = res.build_line_targets(cd, ci, mapc.xyz, corner_in.mask,
                                    opt.maximum_dis_line_for_match)
        pt = res.build_plane_targets(sd, si, maps.xyz, surf_in.mask,
                                     opt.maximum_dis_plane_for_match)
        if upto == "targets":
            return (q + 1e-9 * lt.a[0, 0] + 1e-9 * pt.a[0, 0],
                    t + 1e-9 * pt.normal[0])
        base_mask = jnp.concatenate([lt.valid, pt.valid])

        def f_with_mask(extra_mask):
            def f(qq, tt):
                rl = res.line_residuals(qq, tt, corner_in.xyz, sc, lt,
                                        q_last, t_last, False)
                rp = res.plane_residuals(qq, tt, surf_in.xyz, ss, pt,
                                         q_last, t_last, False)
                return jnp.concatenate([rl, rp], 0), extra_mask
            return f

        def fj_with_mask(extra_mask):
            def fj(qq, tt):
                r, _ = f_with_mask(extra_mask)(qq, tt)
                jc = res.point_world_jacobian(qq, tt, corner_in.xyz, q_last)
                js = res.point_world_jacobian(qq, tt, surf_in.xyz, q_last)
                J = jnp.concatenate([res.line_jacobian(jc, lt),
                                     res.plane_jacobian(js, pt)], 0)
                return r, J, extra_mask
            return fj

        qn, tn, _ = solve_two_phase(f_with_mask, base_mask, q, t, opt,
                                    fj_with_mask)
        return qn, tn

    ident = jnp.array([1.0, 0, 0, 0], jnp.float32)
    zero = jnp.zeros(3, jnp.float32)
    REPS = 50

    def amortized(label, upto):
        @partial(jax.jit, static_argnames=("reps",))
        def loop(carry, reps):
            def body(i, c):
                return iteration(c[0], c[1], upto)
            return lax.fori_loop(0, reps, body, carry)

        for reps in (5, REPS):
            jax.block_until_ready(loop((ident, zero), reps))
        ts = {}
        for reps in (5, REPS):
            t0_ = time.perf_counter()
            for _ in range(3):
                out = loop((ident, zero), reps)
            jax.block_until_ready(out)
            ts[reps] = (time.perf_counter() - t0_) / 3
        ms = (ts[REPS] - ts[5]) / (REPS - 5) * 1000.0
        results[label] = round(ms, 4)
        return ms

    amortized("iter_upto_transform_ms", "transform")
    amortized("iter_upto_knn_ms", "knn")
    amortized("iter_upto_targets_ms", "targets")
    amortized("iter_full_ms", "solve")

    # LM-iteration marginal: vary full_iterations via opt replace
    import dataclasses

    def amortized_opt(label, opt_x):
        def it(q, t):
            qc = res.transform_points_incre(q, t, corner_in.xyz, sc,
                                            q_last, t_last, False)
            qs = res.transform_points_incre(q, t, surf_in.xyz, ss,
                                            q_last, t_last, False)
            cd, ci = knn_fused(qc, mapc.xyz, mapc.mask, k=5, ref4=ref4_c,
                               query_count=nqc, max_radius=rad_c)
            sd, si = knn_fused(qs, maps.xyz, maps.mask, k=5, ref4=ref4_s,
                               query_count=nqs, max_radius=rad_s)
            lt = res.build_line_targets(cd, ci, mapc.xyz, corner_in.mask,
                                        opt.maximum_dis_line_for_match)
            pt = res.build_plane_targets(sd, si, maps.xyz, surf_in.mask,
                                         opt.maximum_dis_plane_for_match)
            base_mask = jnp.concatenate([lt.valid, pt.valid])

            def f_with_mask(extra_mask):
                def f(qq, tt):
                    rl = res.line_residuals(qq, tt, corner_in.xyz, sc, lt,
                                            q_last, t_last, False)
                    rp = res.plane_residuals(qq, tt, surf_in.xyz, ss, pt,
                                             q_last, t_last, False)
                    return jnp.concatenate([rl, rp], 0), extra_mask
                return f

            def fj_with_mask(extra_mask):
                def fj(qq, tt):
                    r, _ = f_with_mask(extra_mask)(qq, tt)
                    jc = res.point_world_jacobian(qq, tt, corner_in.xyz,
                                                  q_last)
                    js = res.point_world_jacobian(qq, tt, surf_in.xyz,
                                                  q_last)
                    J = jnp.concatenate([res.line_jacobian(jc, lt),
                                         res.plane_jacobian(js, pt)], 0)
                    return r, J, extra_mask
                return fj

            return solve_two_phase(f_with_mask, base_mask, q, t, opt_x,
                                   fj_with_mask)[:2]

        @partial(jax.jit, static_argnames=("reps",))
        def loop(carry, reps):
            def body(i, c):
                return it(c[0], c[1])
            return lax.fori_loop(0, reps, body, carry)

        for reps in (5, REPS):
            jax.block_until_ready(loop((ident, zero), reps))
        ts = {}
        for reps in (5, REPS):
            t0_ = time.perf_counter()
            for _ in range(3):
                out = loop((ident, zero), reps)
            jax.block_until_ready(out)
            ts[reps] = (time.perf_counter() - t0_) / 3
        ms = (ts[REPS] - ts[5]) / (REPS - 5) * 1000.0
        results[label] = round(ms, 4)
        return ms

    amortized_opt("iter_full2_ms",
                  dataclasses.replace(opt, full_iterations=2))
    amortized_opt("iter_prerun1_full3_ms",
                  dataclasses.replace(opt, prerun_iterations=1,
                                      full_iterations=3))

    out = {k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in results.items()}
    path = os.path.join(os.path.dirname(__file__),
                        "bench_icp_iter_bisect_out.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
