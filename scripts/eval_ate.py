"""ATE evaluation over config variants on the synthetic ground-truthed
stream (TPU-runnable; the CPU fallback works with JAX_PLATFORMS=cpu).

Usage: python scripts/eval_ate.py [variant ...]
Variants: base (deblur), piecewise3, nodeblur1, realtime, cellmode
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from loam_livox_tpu.core.config import SlamConfig, realtime_profile
from loam_livox_tpu.eval.ate import ate_rmse
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig
from loam_livox_tpu.runtime.pipeline import OdometryPipeline

N_FRAMES = int(sys.argv[sys.argv.index("--frames") + 1]) if "--frames" in sys.argv else 60


def variant_cfg(name):
    base = SlamConfig().replace(mapping={"init_accumulate_frames": 10})
    if name == "base":
        return base
    if name == "piecewise3":
        return base.replace(common={"piecewise_number": 3, "if_motion_deblur": 0})
    if name == "nodeblur1":
        return base.replace(common={"if_motion_deblur": 0, "piecewise_number": 1})
    if name == "realtime":
        return realtime_profile().replace(mapping={"init_accumulate_frames": 10})
    if name == "cellmode":
        return base.replace(mapping={"init_accumulate_frames": 10,
                                     "matching_mode": 1})
    raise SystemExit(f"unknown variant {name}")


def run(name):
    cfg = variant_cfg(name)
    sim = LivoxSimulator(SimConfig(points_per_frame=10000))
    pipe = OdometryPipeline(cfg)
    t0 = time.perf_counter()
    for i in range(N_FRAMES):
        xyz, inten, bt = sim.frame(i)
        pipe.process_raw(xyz, inten, bt)
    pipe.flush()
    wall = time.perf_counter() - t0
    est = pipe.trajectory.positions_array()
    gt = np.stack([sim.gt_pose_at(t)[1] for t in pipe.trajectory.times])
    return {
        "variant": name,
        "frames": N_FRAMES,
        "steps": len(est),
        "fps": round(N_FRAMES / wall, 2),
        "accepted": int(sum(pipe.trajectory.accepted)),
        "ate_aligned": round(ate_rmse(est, gt), 4),
        "ate_raw": round(ate_rmse(est, gt, align=False), 4),
        "final_err": round(float(np.linalg.norm(est[-1] - gt[-1])), 4),
    }


if __name__ == "__main__":
    variants = [a for a in sys.argv[1:] if not a.startswith("--")
                and not a.lstrip("-").isdigit()] or ["base"]
    for v in variants:
        print(json.dumps(run(v)), flush=True)
