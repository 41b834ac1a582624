"""Diagnose the sharded-vs-1-device trajectory divergence
(tests/test_parallel_mode.py::test_sharded_pipeline_matches_single_device).

Runs the same 20-frame small-caps stream through the jitted frame
program unsharded and sharded over the 8-device virtual CPU mesh, and
prints a per-frame table of the gate-feeding scalars so the first
divergence (and whether it is a gate flip or numeric drift) is visible.
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

import jax.numpy as jnp
import numpy as np

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.eval.scenarios import SMALL_CAPS
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig, Trajectory
from loam_livox_tpu.runtime.odometry import init_state
from loam_livox_tpu.runtime.pipeline import process_raw_frame


def small_cfg(mesh_devices=1):
    return SlamConfig().replace(
        capacity=SMALL_CAPS,
        mapping={"init_accumulate_frames": 6},
        optimization={"icp_maximum_iteration": 5, "full_iterations": 3},
        parallel={"mesh_devices": mesh_devices},
    )


def run(mesh_n, n_frames=20):
    cfg = small_cfg(mesh_n)
    ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
    sim = LivoxSimulator(SimConfig(points_per_frame=3072, seed=3),
                         traj=Trajectory(ramp_t0=ramp))
    state = init_state(cfg)
    mesh = None
    if mesh_n > 1:
        from loam_livox_tpu.parallel import make_mesh
        from loam_livox_tpu.parallel.layout import replicate, shard_state

        mesh = make_mesh(mesh_n)
        state = shard_state(state, mesh)
    caps = cfg.capacity
    pieces = (1 if cfg.common.if_motion_deblur else cfg.common.piecewise_number)
    rows = []
    for i in range(n_frames):
        xyz, inten, t0 = sim.frame(i)
        n = caps.max_raw_points
        pts = np.zeros((n, 3), np.float32)
        it = np.zeros((n,), np.float32)
        m = np.zeros((n,), bool)
        k = min(len(xyz), n)
        pts[:k], it[:k], m[:k] = xyz[:k], inten[:k], True
        inputs = (jnp.asarray(pts), jnp.asarray(it), jnp.asarray(m),
                  jnp.float32(t0))
        if mesh is not None:
            from loam_livox_tpu.parallel.layout import replicate

            inputs = replicate(inputs, mesh)
        state, reg, poses = process_raw_frame(state, *inputs, cfg,
                                              piecewise_number=pieces)
        rows.append(dict(
            t=np.asarray(reg.t_w, np.float64),
            q=np.asarray(reg.q_w, np.float64),
            acc=bool(reg.accepted), en=bool(reg.enabled),
            cost=float(reg.final_cost), gate=float(reg.gate_cost),
            thr=float(reg.inlier_threshold), nb=int(reg.n_blocks),
            it=int(reg.iterations), dr=float(reg.angular_diff_deg),
            dt=float(reg.t_diff),
        ))
    return rows


if __name__ == "__main__":
    n_frames = int(os.environ.get("N_FRAMES", "20"))
    r1 = run(1, n_frames)
    r8 = run(8, n_frames)
    hdr = (f"{'f':>2} {'|dT|':>9} {'acc':>7} {'iters':>5} {'nb':>9} "
           f"{'gate1':>10} {'gate8':>10} {'cost1':>10} {'cost8':>10} "
           f"{'dR1':>7} {'dR8':>7}")
    print(hdr)
    for i, (a, b) in enumerate(zip(r1, r8)):
        dt = np.linalg.norm(a["t"] - b["t"])
        print(f"{i:>2} {dt:9.2e} {int(a['acc'])}/{int(b['acc'])}    "
              f"{a['it']}/{b['it']} {a['nb']:>4}/{b['nb']:<4} "
              f"{a['gate']:10.6f} {b['gate']:10.6f} "
              f"{a['cost']:10.6f} {b['cost']:10.6f} "
              f"{a['dr']:7.3f} {b['dr']:7.3f}")
