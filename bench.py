"""Headline benchmark: end-to-end odometry frames/s on one chip.

Simulates a Mid-40-like stream (10,000 pts / 0.1 s frame — the
reference's design rate, ``laser_feature_extractor.hpp:68``,
``livox_feature_extractor.hpp:145``), then times the full compute path
(front-end feature extraction + scan-to-map registration + map update)
per frame.  Baseline = the 10 Hz real-time input rate the reference is
engineered to keep up with ("real time" ``README.md:9``); the driver
target is >2× that on a single TPU chip (BASELINE.md).

Three configurations are timed:
* the framework default (deblur ON → one slerp-compensated registration
  per frame) — the headline ``value``;
* the SHIPPED precision profile (deblur OFF, piecewise 3 — the
  reference's actual precision mode: 3 registrations per 0.1 s frame,
  ``config/performance_precision.yaml:5`` +
  ``laser_feature_extractor.hpp:141-142``);
* the SHIPPED realtime profile (same piecewise-3 mode at the realtime
  knobs).

Prints ONE JSON line:
  {"metric": "odometry_fps", "value": N, "unit": "frames/s",
   "vs_baseline": N / 10.0, "shipped_precision_fps": N,
   "shipped_realtime_fps": N}
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def bench_config(cfg, raw, warmup, n_frames):
    """Time the fused per-frame program over the prepared raw stream."""
    import jax

    from loam_livox_tpu.runtime.odometry import init_state
    from loam_livox_tpu.runtime.pipeline import process_raw_frame

    pieces = (1 if cfg.common.if_motion_deblur
              else cfg.common.piecewise_number)
    state = init_state(cfg)
    for i in range(warmup):
        state, _, _ = process_raw_frame(state, *raw[i], cfg,
                                        piecewise_number=pieces)
    jax.block_until_ready(state)

    t_start = time.perf_counter()
    for i in range(warmup, warmup + n_frames):
        state, _, _ = process_raw_frame(state, *raw[i], cfg,
                                        piecewise_number=pieces)
    jax.block_until_ready(state)
    wall = time.perf_counter() - t_start
    return n_frames / wall


def bench_config_racing(cfg, raw, warmup, n_frames):
    """Time the batched racing program (`parallel/frame_batch` — the
    reference's maximum_parallel_thread worker racing re-expressed as
    one vmapped dispatch, runtime/batched.py): G raw frames × P
    piecewise windows register as G·P racing lanes per dispatch."""
    import jax
    import jax.numpy as jnp

    from loam_livox_tpu.runtime.odometry import init_state
    from loam_livox_tpu.runtime.pipeline import process_raw_frames_batched

    G = cfg.parallel.frame_batch
    pieces = (1 if cfg.common.if_motion_deblur
              else cfg.common.piecewise_number)
    state = init_state(cfg)

    def stack(group):
        return (jnp.stack([g[0] for g in group]),
                jnp.stack([g[1] for g in group]),
                jnp.stack([g[2] for g in group]),
                jnp.stack([jnp.asarray(g[3]) for g in group]))

    groups = [raw[i:i + G] for i in range(0, warmup + n_frames, G)]
    groups = [g for g in groups if len(g) == G]
    warm_groups = max(1, warmup // G)
    for g in groups[:warm_groups]:
        state, _, _ = process_raw_frames_batched(
            state, *stack(g), cfg, G, pieces=pieces)
    jax.block_until_ready(state)

    t_start = time.perf_counter()
    for g in groups[warm_groups:]:
        state, _, _ = process_raw_frames_batched(
            state, *stack(g), cfg, G, pieces=pieces)
    jax.block_until_ready(state)
    wall = time.perf_counter() - t_start
    return G * len(groups[warm_groups:]) / wall


def bench_config_chunked(cfg, raw, warmup, n_frames, chunk=8):
    """Time the SEQUENTIAL chunked program (parallel/dispatch_chunk):
    K frames per dispatch with per-frame semantics — isolates how much
    of the single-dispatch budget is per-dispatch host latency."""
    import jax
    import jax.numpy as jnp

    from loam_livox_tpu.runtime.odometry import init_state
    from loam_livox_tpu.runtime.pipeline import process_raw_frames_chunked

    pieces = (1 if cfg.common.if_motion_deblur
              else cfg.common.piecewise_number)
    state = init_state(cfg)

    def stack(group):
        return (jnp.stack([g[0] for g in group]),
                jnp.stack([g[1] for g in group]),
                jnp.stack([g[2] for g in group]),
                jnp.stack([jnp.asarray(g[3]) for g in group]))

    groups = [raw[i:i + chunk] for i in range(0, warmup + n_frames, chunk)]
    groups = [g for g in groups if len(g) == chunk]
    warm_groups = max(1, warmup // chunk)
    for g in groups[:warm_groups]:
        state, _, _ = process_raw_frames_chunked(
            state, *stack(g), cfg, chunk, piecewise_number=pieces)
    jax.block_until_ready(state)

    t_start = time.perf_counter()
    for g in groups[warm_groups:]:
        state, _, _ = process_raw_frames_chunked(
            state, *stack(g), cfg, chunk, piecewise_number=pieces)
    jax.block_until_ready(state)
    wall = time.perf_counter() - t_start
    return chunk * len(groups[warm_groups:]) / wall


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the frame program costs minutes of
    # XLA compile through the remote-TPU tunnel; cache it across bench
    # runs (same knobs as tests/conftest.py).
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_xla_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from loam_livox_tpu.core.config import (
        SlamConfig,
        precision_profile,
        realtime_profile,
        realtime_racing_profile,
    )
    from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig

    n_frames = int(os.environ.get("BENCH_FRAMES", "50"))
    warmup = int(os.environ.get("BENCH_WARMUP", "10"))
    pts_per_frame = 10000
    cap = 16384

    sim = LivoxSimulator(SimConfig(points_per_frame=pts_per_frame))
    raw = []
    for i in range(n_frames + warmup):
        xyz, inten, t0 = sim.frame(i)
        pts = np.zeros((cap, 3), np.float32)
        it = np.zeros((cap,), np.float32)
        m = np.zeros((cap,), bool)
        pts[:pts_per_frame] = xyz
        it[:pts_per_frame] = inten
        m[:pts_per_frame] = True
        raw.append((jnp.asarray(pts), jnp.asarray(it), jnp.asarray(m),
                    jnp.float32(t0)))

    accel = dict(mapping={"init_accumulate_frames": 10})
    fps = bench_config(SlamConfig().replace(**accel), raw, warmup, n_frames)
    fps_prec = bench_config(precision_profile().replace(**accel),
                            raw, warmup, n_frames)
    fps_rt = bench_config(realtime_profile().replace(**accel),
                          raw, warmup, n_frames)
    fps_rt_racing = bench_config_racing(
        realtime_racing_profile().replace(**accel), raw, warmup, n_frames)
    fps_chunked = bench_config_chunked(
        SlamConfig().replace(**accel), raw, warmup, n_frames, chunk=8)
    from loam_livox_tpu.core.config import bounded_scene_caps

    fps_bounded = bench_config(
        SlamConfig().replace(**accel, capacity=bounded_scene_caps()),
        raw, warmup, n_frames)

    print(json.dumps({
        "metric": "odometry_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
        "shipped_precision_fps": round(fps_prec, 3),
        "shipped_realtime_fps": round(fps_rt, 3),
        "realtime_racing_fps": round(fps_rt_racing, 3),
        "sequential_chunked_fps": round(fps_chunked, 3),
        "bounded_scene_caps_fps": round(fps_bounded, 3),
    }))


if __name__ == "__main__":
    main()
