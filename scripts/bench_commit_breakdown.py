"""Attribution of the shipped-profile frame's commit-path cost (the
~27 ms scripts/bench_shipped_breakdown.py leaves unaccounted): history
downsamples, matching-buffer append vs cadenced rebuild, register_frame
fixed costs (ref4 relayout), at the precision profile's real shapes.

Run on the TPU chip:  python scripts/bench_commit_breakdown.py
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
    from functools import partial
    from jax import lax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_xla_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from loam_livox_tpu.core.config import precision_profile
    from loam_livox_tpu.core.types import PointBatch
    from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig
    from loam_livox_tpu.ops.voxel import voxel_downsample
    from loam_livox_tpu.runtime.odometry import (
        _rebuild_matching_buffer,
        init_state,
    )
    from loam_livox_tpu.runtime.pipeline import process_raw_frame

    results = {}
    cfg = precision_profile().replace(mapping={"init_accumulate_frames": 10})
    caps = cfg.capacity
    pieces = cfg.common.piecewise_number

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
    # rebuild cadence ablations: never rebuild after warm (appends only)
    # vs rebuild every piece
    warm_and_time(cfg.replace(capacity={"matching_rebuild_interval": 997}),
                  "frame_ms_no_rebuild")
    warm_and_time(cfg.replace(capacity={"matching_rebuild_interval": 1}),
                  "frame_ms_rebuild_every")
    # append mode off (pure cadence, delay-derived interval=1 at precision)
    warm_and_time(cfg.replace(capacity={"matching_append_mode": 0}),
                  "frame_ms_no_append_mode")
    # ICP fully off (registration gate never opens): isolates
    # frontend + commit + buffer maintenance
    warm_and_time(cfg.replace(mapping={"init_accumulate_frames": 10 ** 6}),
                  "frame_ms_icp_disabled")

    # ---- amortized: the cadenced full rebuild alone ---------------------
    REPS = 30

    def amortized(label, body, init_carry):
        @partial(jax.jit, static_argnames=("reps",))
        def loop(carry, reps):
            return lax.fori_loop(0, reps, body, carry)

        for reps in (5, REPS):
            jax.block_until_ready(loop(init_carry, reps))
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

    def rebuild_body(i, st):
        c, s, gc, gs = _rebuild_matching_buffer(st, cfg)
        return st._replace(map_corners=c._replace(
            xyz=c.xyz + 1e-12 * i), map_surface=s)

    amortized("rebuild_ms", rebuild_body, state)

    # history-flatten voxel downsample alone (the rebuild's two sorts)
    hc = state.hist_corner_xyz.reshape(-1, 3)
    hcm = state.hist_corner_mask.reshape(-1)
    hs = state.hist_surf_xyz.reshape(-1, 3)
    hsm = state.hist_surf_mask.reshape(-1)

    def vox_surf_body(i, x):
        pb = PointBatch(xyz=hs + 1e-12 * x, time=jnp.zeros(hs.shape[0]),
                        mask=hsm)
        out = voxel_downsample(pb, cfg.feature_extraction
                               .mapping_plane_resolution,
                               capacity=caps.map_surf_capacity,
                               with_time=False)
        return x + 1e-12 * out.xyz[0, 0]

    amortized("rebuild_surf_voxel_ms", vox_surf_body, jnp.float32(0.0))

    def vox_corner_body(i, x):
        pb = PointBatch(xyz=hc + 1e-12 * x, time=jnp.zeros(hc.shape[0]),
                        mask=hcm)
        out = voxel_downsample(pb, cfg.feature_extraction
                               .mapping_line_resolution,
                               capacity=caps.map_corner_capacity,
                               with_time=False)
        return x + 1e-12 * out.xyz[0, 0]

    amortized("rebuild_corner_voxel_ms", vox_corner_body, jnp.float32(0.0))

    # per-piece history downsamples (hist caps 512 / 2048)
    piece_c = PointBatch(xyz=jnp.zeros((caps.max_corner, 3)),
                         time=jnp.zeros(caps.max_corner),
                         mask=jnp.arange(caps.max_corner) < 100)
    piece_s = PointBatch(xyz=jax.random.uniform(jax.random.PRNGKey(0),
                                                (caps.max_surface, 3)) * 20,
                         time=jnp.zeros(caps.max_surface),
                         mask=jnp.arange(caps.max_surface) < 800)

    def hist_ds_body(i, x):
        c = voxel_downsample(piece_c._replace(xyz=piece_c.xyz + 1e-12 * x),
                             cfg.feature_extraction.mapping_line_resolution,
                             capacity=caps.hist_corner_capacity)
        s = voxel_downsample(piece_s._replace(xyz=piece_s.xyz + 1e-12 * x),
                             cfg.feature_extraction.mapping_plane_resolution,
                             capacity=caps.hist_surf_capacity)
        return x + 1e-12 * (c.xyz[0, 0] + s.xyz[0, 0])

    amortized("hist_downsample_pair_ms", hist_ds_body, jnp.float32(0.0))

    # build_ref4 pair (runs once per odometry_step = per piece)
    from loam_livox_tpu.ops.pallas.knn_fused import build_ref4

    if jax.default_backend() == "tpu":
        def ref4_body(i, x):
            r4c = build_ref4(state.map_corners.xyz + 1e-12 * x,
                             state.map_corners.mask)
            r4s = build_ref4(state.map_surface.xyz + 1e-12 * x,
                             state.map_surface.mask)
            return x + 1e-12 * (r4c[0, 0] + r4s[0, 0])

        amortized("build_ref4_pair_ms", ref4_body, jnp.float32(0.0))

    out = {k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in results.items()}
    path = os.path.join(os.path.dirname(__file__),
                        "bench_commit_breakdown_out.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
