"""Find the FIRST step and state leaf where the sharded pipeline
diverges from the unsharded one: run both from init, compare every
state leaf after every frame.
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
from loam_livox_tpu.parallel import make_mesh
from loam_livox_tpu.parallel.layout import replicate, shard_state
from loam_livox_tpu.runtime.odometry import init_state
from loam_livox_tpu.runtime.pipeline import process_raw_frame


def main():
    opt = {"icp_maximum_iteration": 5, "full_iterations": 3}
    if os.environ.get("KNN_EXACT"):
        opt["knn_exact"] = 1
    cfg = SlamConfig().replace(
        capacity=SMALL_CAPS,
        mapping={"init_accumulate_frames": 6},
        optimization=opt,
    )
    cfg8 = cfg.replace(parallel={"mesh_devices": 8})
    ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
    sim = LivoxSimulator(
        SimConfig(points_per_frame=3072,
                  seed=int(os.environ.get("SEED", "3"))),
        traj=Trajectory(ramp_t0=ramp))
    caps = cfg.capacity
    mesh = make_mesh(8)
    s1 = init_state(cfg)
    s8 = shard_state(init_state(cfg), mesh)
    fields = s1._fields

    def leaves(s):
        return jax.device_get(s)

    for i in range(int(os.environ.get("N_FRAMES", "10"))):
        xyz, inten, t0 = sim.frame(i)
        n = caps.max_raw_points
        pts = np.zeros((n, 3), np.float32)
        it = np.zeros((n,), np.float32)
        m = np.zeros((n,), bool)
        k = min(len(xyz), n)
        pts[:k], it[:k], m[:k] = xyz[:k], inten[:k], True
        inputs = (jnp.asarray(pts), jnp.asarray(it), jnp.asarray(m),
                  jnp.float32(t0))
        from loam_livox_tpu.parallel.mesh import set_active_mesh

        set_active_mesh(None, deterministic=True)
        s1, r1, _ = process_raw_frame(s1, *inputs, cfg, piecewise_number=1)
        set_active_mesh(mesh, deterministic=True)
        s8, r8, _ = process_raw_frame(s8, *replicate(inputs, mesh), cfg8,
                                      piecewise_number=1)
        a, b = leaves(s1), leaves(s8)
        bad = []
        for f in fields:
            fa = jax.tree_util.tree_leaves(getattr(a, f))
            fb = jax.tree_util.tree_leaves(getattr(b, f))
            for j, (x, y) in enumerate(zip(fa, fb)):
                x, y = np.asarray(x), np.asarray(y)
                if x.dtype == bool or np.issubdtype(x.dtype, np.integer):
                    neq = int((x != y).sum())
                    if neq:
                        bad.append(f"{f}[{j}] int mismatches={neq}")
                else:
                    d = np.abs(x.astype(np.float64) - y.astype(np.float64))
                    if d.max() > 0:
                        bad.append(f"{f}[{j}] max|Δ|={d.max():.3e}")
        dt = np.linalg.norm(np.asarray(a.t_w, np.float64)
                            - np.asarray(b.t_w, np.float64))
        acc = f"acc={int(np.asarray(r1.accepted))}/{int(np.asarray(r8.accepted))}"
        print(f"frame {i}: |dT|={dt:.2e} {acc} "
              + ("IDENTICAL" if not bad else "; ".join(bad[:4])), flush=True)
        if bad and i >= 6 and not os.environ.get("N_FRAMES"):
            break


if __name__ == "__main__":
    main()
