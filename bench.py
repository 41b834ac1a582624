"""Headline benchmark: end-to-end odometry frames/s on one chip.

Simulates a Mid-40-like stream (10,000 pts / 0.1 s frame — the
reference's design rate, ``laser_feature_extractor.hpp:68``,
``livox_feature_extractor.hpp:145``), then times the full pipeline
(`runtime.pipeline.OdometryPipeline`: feature extraction → piecewise
scan-to-map registration → map update → drain) per raw frame.
Baseline = the 10 Hz real-time input rate the reference is engineered
to keep up with ("real time" ``README.md:9``); the driver target is
>2× that on a single TPU chip (BASELINE.md).

Configurations timed (all through the SAME pipeline class the CLI
runs):
* the framework default (deblur ON → one slerp-compensated registration
  per frame) — the headline ``value``;
* the SHIPPED precision profile (deblur OFF, piecewise 3 — the
  reference's actual precision mode: 3 registrations per 0.1 s frame,
  ``config/performance_precision.yaml:5`` +
  ``laser_feature_extractor.hpp:141-142``);
* the SHIPPED realtime profile (same piecewise-3 mode at the realtime
  knobs, sequential drain);
* realtime RACING (`realtime_racing_profile`): the reference's
  ``maximum_parallel_thread: 3`` worker racing re-expressed as 3
  vmapped racing lanes with the motion staleness guard;
* sequential chunked dispatch (8 frames per device program);
* the frozen bounded-scene capacity preset (superseded by the adaptive
  schedule, kept for round-over-round comparability).

The adaptive capacity schedule (runtime/capacity_schedule.py) is ON
for the sequential rows, exactly as the pipeline ships: buffers start
small and grow as measured fills demand.  Each row runs a full
untimed pre-pass first so every capacity tier the stream visits is
compiled (and persistently cached) before the timed pass.

Prints ONE JSON line:
  {"metric": "odometry_fps", "value": N, "unit": "frames/s",
   "vs_baseline": N / 10.0, "shipped_precision_fps": N, ...}
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def bench_pipeline(cfg, raw, warmup, n_frames):
    """Time `OdometryPipeline.process_raw` over the prepared raw stream
    (device-resident, pre-padded inputs — the sensor-DMA analogue).

    An untimed full-stream pre-pass on a throwaway pipeline compiles
    every program (including every adaptive-capacity tier this stream
    triggers); the timed pipeline then replays the identical tier
    ladder against the in-process jit cache."""
    import jax

    from loam_livox_tpu.runtime.pipeline import OdometryPipeline

    pre = OdometryPipeline(cfg)
    for pts, inten, m, t0 in raw:
        pre.process_raw(pts, inten, t0, mask=m)
    pre.flush()
    jax.block_until_ready(pre.state)

    pipe = OdometryPipeline(cfg)
    for i in range(warmup):
        pts, inten, m, t0 = raw[i]
        pipe.process_raw(pts, inten, t0, mask=m)
    jax.block_until_ready(pipe.state)

    t_start = time.perf_counter()
    for i in range(warmup, warmup + n_frames):
        pts, inten, m, t0 = raw[i]
        pipe.process_raw(pts, inten, t0, mask=m)
    pipe.flush()
    jax.block_until_ready(pipe.state)
    wall = time.perf_counter() - t_start
    return n_frames / wall


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
        bounded_scene_caps,
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
                    float(t0)))

    accel = dict(mapping={"init_accumulate_frames": 10})
    fps = bench_pipeline(SlamConfig().replace(**accel), raw, warmup,
                         n_frames)
    fps_prec = bench_pipeline(precision_profile().replace(**accel),
                              raw, warmup, n_frames)
    fps_rt = bench_pipeline(realtime_profile().replace(**accel),
                            raw, warmup, n_frames)
    fps_rt_racing = bench_pipeline(
        realtime_racing_profile().replace(**accel), raw, warmup, n_frames)
    fps_chunked = bench_pipeline(
        SlamConfig().replace(**accel, parallel={"dispatch_chunk": 8}),
        raw, warmup, n_frames)
    fps_bounded = bench_pipeline(
        SlamConfig().replace(**accel, capacity={**bounded_scene_caps(),
                                                "auto_schedule": 0}),
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
