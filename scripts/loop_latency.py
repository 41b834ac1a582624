"""Keyframe-spike latency: p50/p99 per-frame wall time of the loop
scenario with the loop service INLINE vs on the BACKGROUND worker
(VERDICT r4 item 5 'Done' criterion: p99 frame latency flat across
keyframe completions).

The reference isolates place recognition + scene alignment on a
detached thread (`service_loop_detection`, laser_mapping.hpp:1683-1686)
exactly so a keyframe completion never stalls registration; the inline
mode reproduces the round-4 behavior (descriptor build + up-to-N
alignment ICPs synchronously inside the frame drain), the async mode is
the shipped default.

Run on the TPU chip:  python scripts/loop_latency.py
Writes scripts/loop_latency_out.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(async_mode: int, frames: int):
    from loam_livox_tpu.eval.scenarios import scenario_config
    from loam_livox_tpu.io.simulator import (
        ConvexScene,
        LivoxSimulator,
        SimConfig,
        Trajectory,
    )
    from loam_livox_tpu.runtime.pipeline import OdometryPipeline

    cfg, kw = scenario_config("loop_closure")
    cfg = cfg.replace(loop_closure={"if_loop_service_async": async_mode})
    rng = np.random.default_rng(0)
    scene = ConvexScene.random_rich_world(rng, **kw["scene"])
    ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
    traj = Trajectory(ramp_t0=ramp)
    for a, v in kw.get("traj", {}).items():
        setattr(traj, a, v)
    sim = LivoxSimulator(SimConfig(points_per_frame=kw["points"], seed=0,
                                   noise_std=kw.get("noise", 0.01)),
                         scene=scene, traj=traj)
    raw = [sim.frame(i) for i in range(frames)]

    # FULL untimed pre-pass (same discipline as bench.py): the measured
    # pass must hit only the in-process jit cache — otherwise every
    # capacity-schedule tier growth, keyframe-descriptor build, and
    # alignment-ICP program charges its XLA compile (tens of seconds
    # through the remote-TPU tunnel) to some arbitrary frame and the
    # latency percentiles measure the compiler, not the pipeline.
    pipe = OdometryPipeline(cfg)
    for xyz, inten, t0 in raw:
        pipe.process_raw(xyz, inten, t0)
    pipe.flush()
    pipe.loop_closer.drain()

    pipe = OdometryPipeline(cfg)
    per_frame = []
    kf_done_at = []
    n_kf = 0
    for i in range(frames):
        xyz, inten, t0 = raw[i]
        t = time.perf_counter()
        pipe.process_raw(xyz, inten, t0)
        per_frame.append((time.perf_counter() - t) * 1000.0)
        k = len(pipe.loop_closer.keyframes) + len(pipe.loop_closer.waiting)
        if k > n_kf:
            kf_done_at.append(i)
            n_kf = k
    pipe.flush()
    pipe.loop_closer.drain()
    arr = np.asarray(per_frame)
    # frames at/after a keyframe completion (the spike window)
    spike = np.zeros(len(arr), bool)
    for i in kf_done_at:
        spike[i:i + 2] = True
    return {
        "mode": "async" if async_mode else "inline",
        "frames": frames,
        "keyframes": int(len(pipe.loop_closer.keyframes)),
        "dropped": int(pipe.loop_closer.dropped_keyframes),
        "closed": bool(pipe.loop_closer.closed),
        "p50_ms": round(float(np.percentile(arr, 50)), 2),
        "p99_ms": round(float(np.percentile(arr, 99)), 2),
        "max_ms": round(float(arr.max()), 2),
        "kf_frame_p_max_ms": (round(float(arr[spike].max()), 2)
                              if spike.any() else None),
        "nonkf_p99_ms": round(float(np.percentile(arr[~spike], 99)), 2),
    }


def main():
    import jax

    # persistent compile cache across invocations (same knobs as
    # bench.py / tests/conftest.py)
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_xla_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    frames = int(os.environ.get("LOOP_LAT_FRAMES", "170"))
    out = {"inline": run(0, frames), "async": run(1, frames)}
    path = os.path.join(os.path.dirname(__file__), "loop_latency_out.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
