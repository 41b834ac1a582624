"""Is the matching-buffer rebuild (voxel sort + segment means) the
sharded-vs-unsharded noise source?  Run _rebuild_matching_buffer on the
same state, sharded and not, and compare outputs bitwise.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
if cache:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial

import jax.numpy as jnp
import numpy as np

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.eval.scenarios import SMALL_CAPS
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig, Trajectory
from loam_livox_tpu.parallel import make_mesh
from loam_livox_tpu.parallel.layout import shard_state
from loam_livox_tpu.runtime.odometry import (
    _rebuild_matching_buffer,
    init_state,
)
from loam_livox_tpu.runtime.pipeline import process_raw_frame


def cmp(name, a, b):
    a, b = np.asarray(a), np.asarray(b)
    if a.dtype == bool or np.issubdtype(a.dtype, np.integer):
        neq = int((a != b).sum())
        print(f"  {name:<24} mismatches={neq}/{a.size}")
        return
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    print(f"  {name:<24} max|Δ|={d.max():.3e}  n>0: {int((d > 0).sum())}"
          f"/{a.size}")


def main():
    cfg = SlamConfig().replace(
        capacity=SMALL_CAPS,
        mapping={"init_accumulate_frames": 6},
        optimization={"icp_maximum_iteration": 5, "full_iterations": 3},
    )
    ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
    sim = LivoxSimulator(SimConfig(points_per_frame=3072, seed=3),
                         traj=Trajectory(ramp_t0=ramp))
    caps = cfg.capacity
    state = init_state(cfg)
    for i in range(5):
        xyz, inten, t0 = sim.frame(i)
        n = caps.max_raw_points
        pts = np.zeros((n, 3), np.float32)
        it = np.zeros((n,), np.float32)
        m = np.zeros((n,), bool)
        k = min(len(xyz), n)
        pts[:k], it[:k], m[:k] = xyz[:k], inten[:k], True
        state, _, _ = process_raw_frame(
            state, jnp.asarray(pts), jnp.asarray(it), jnp.asarray(m),
            jnp.float32(t0), cfg, piecewise_number=1)
    state = jax.tree_util.tree_map(jnp.asarray, jax.device_get(state))
    mesh = make_mesh(8)
    state_sh = shard_state(state, mesh)

    reb = jax.jit(partial(_rebuild_matching_buffer, cfg=cfg))
    c1, s1, _, _ = reb(state)
    c8, s8, _, _ = reb(state_sh)
    print("rebuild, sharded vs unsharded state:")
    cmp("corners.xyz", c1.xyz, c8.xyz)
    cmp("corners.mask", c1.mask, c8.mask)
    cmp("surface.xyz", s1.xyz, s8.xyz)
    cmp("surface.mask", s1.mask, s8.mask)


if __name__ == "__main__":
    main()
