"""Quick end-to-end odometry smoke run on CPU: simulator → frontend →
odometry → ATE vs ground truth."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.eval.ate import ate_rmse
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig
from loam_livox_tpu.runtime.pipeline import run_odometry

cfg = SlamConfig().replace(
    capacity={
        "max_raw_points": 8192,
        "max_corner": 512,
        "max_surface": 2048,
        "map_corner_capacity": 8192,
        "map_surf_capacity": 32768,
        "hist_corner_capacity": 256,
        "hist_surf_capacity": 1024,
        "history_window": 32,
    },
    common={"piecewise_number": 1},
    mapping={"init_accumulate_frames": 10},
    optimization={"icp_maximum_iteration": 5, "full_iterations": 4},
)

sim = LivoxSimulator(SimConfig(points_per_frame=8192))
N = 30
pipe, sim, wall = run_odometry(cfg, N, sim=sim, verbose=True)

est = pipe.trajectory.positions_array()
gt = np.stack([sim.gt_pose_at(t)[1] for t in pipe.trajectory.times])
print(f"frames={N} wall={wall:.1f}s fps={N / wall:.2f}")
print(f"accepted={sum(pipe.trajectory.accepted)}/{len(pipe.trajectory.accepted)}")
print("ATE RMSE (aligned):", ate_rmse(est, gt))
print("ATE RMSE (raw):    ", ate_rmse(est, gt, align=False))
print("final est", est[-1], "gt", gt[-1])
