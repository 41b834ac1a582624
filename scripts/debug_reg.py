import os, sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig
from loam_livox_tpu.frontend.livox import extract_frame
from loam_livox_tpu.ops.voxel import voxel_downsample
from loam_livox_tpu.runtime.odometry import init_state, odometry_step

cfg = SlamConfig().replace(
    capacity={
        "max_raw_points": 8192, "max_corner": 512, "max_surface": 2048,
        "map_corner_capacity": 8192, "map_surf_capacity": 32768,
        "hist_corner_capacity": 256, "hist_surf_capacity": 1024,
        "history_window": 32,
    },
    mapping={"init_accumulate_frames": 10},
    optimization={"icp_maximum_iteration": 6, "full_iterations": 5},
)
sim = LivoxSimulator(SimConfig(points_per_frame=8192))
state = init_state(cfg)
fe = cfg.feature_extraction

for i in range(16):
    xyz, inten, t0 = sim.frame(i)
    pts = jnp.asarray(np.pad(xyz, ((0, 0), (0, 0))))
    mask = jnp.ones((8192,), bool)
    info, n_petals, pieces = extract_frame(
        pts, jnp.asarray(inten), mask, t0, fe, cfg.capacity)
    f = pieces[0]
    f = f._replace(
        corners=voxel_downsample(f.corners, fe.mapping_line_resolution, capacity=cfg.capacity.max_corner),
        surface=voxel_downsample(f.surface, fe.mapping_plane_resolution / 2, capacity=cfg.capacity.max_surface),
    )
    print(f"frame {i}: petals={int(n_petals)} corners={int(f.corners.count())} "
          f"surf={int(f.surface.count())} full={int(f.full.count())}")
    state, reg = odometry_step(state, f, cfg)
    print(f"  enabled={bool(reg.enabled)} accepted={bool(reg.accepted)} "
          f"iters={int(reg.iterations)} nblk={int(reg.n_blocks)} "
          f"cost={float(reg.final_cost):.4f} gate={float(reg.gate_cost):.4f} "
          f"t_incre={np.round(np.asarray(reg.t_incre), 4)} "
          f"ang={float(reg.angular_diff_deg):.3f}")
    print(f"  map_c={int(state.map_corners.count())} map_s={int(state.map_surface.count())} "
          f"t_w={np.round(np.asarray(state.t_w), 4)}")
