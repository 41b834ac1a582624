"""Record ONLY the divergence-seeding frame (default 8, SEED=1): warm
up N frames with recording disabled (states bit-identical across
layouts), then enable the recorder for the seeding frame and compare
the kNN selections / solver stream between layouts with no sequence
misalignment."""
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

import jax.numpy as jnp
import numpy as np

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.eval.scenarios import SMALL_CAPS
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig, Trajectory
from loam_livox_tpu.parallel import make_mesh
from loam_livox_tpu.parallel.layout import replicate, shard_state
from loam_livox_tpu.registration import icp as icp_mod
from loam_livox_tpu.runtime.odometry import init_state
from loam_livox_tpu.runtime.pipeline import process_raw_frame

RECORDS = []
ENABLED = [False]


def _rec(tag):
    def cb(*arrs):
        if ENABLED[0]:
            RECORDS.append((tag, [np.asarray(a).copy() for a in arrs]))
    return cb


_site = [0]

from loam_livox_tpu.ops import knn as knn_mod

_orig_knn = knn_mod.knn.__wrapped__


def patched_knn(*args, **kw):
    site = _site[0]; _site[0] += 1
    d, i = _orig_knn(*args, **kw)
    jax.debug.callback(_rec(f"knn@{site}"), d, i)
    return d, i


icp_mod.knn = patched_knn

# ---- solver + target instrumentation (guarded by ENABLED) ------------------
from loam_livox_tpu.registration import gauss_newton as gn
from loam_livox_tpu.registration import residuals as res_mod

_orig_sys = gn._system_from_rJ


def patched_sys(r0, J, mask, delta):
    site = _site[0]; _site[0] += 1
    H, g = _orig_sys(r0, J, mask, delta)
    jax.debug.callback(_rec(f"rJ@{site}"), r0, J, mask)
    jax.debug.callback(_rec(f"Hg@{site}"), H, g)
    return H, g


gn._system_from_rJ = patched_sys

_orig_solve = gn._solve_damped


def patched_solve(H, g, lam):
    site = _site[0]; _site[0] += 1
    dd = _orig_solve(H, g, lam)
    jax.debug.callback(_rec(f"dd@{site}"), dd, lam)
    return dd


gn._solve_damped = patched_solve

_orig_cost = gn._cost


def patched_cost(r, mask, delta):
    site = _site[0]; _site[0] += 1
    c = _orig_cost(r, mask, delta)
    jax.debug.callback(_rec(f"cost@{site}"), c)
    return c


gn._cost = patched_cost

for _name in ("build_line_targets", "build_plane_targets"):
    def _wrap(name):
        orig = getattr(res_mod, name)

        def patched(*args, **kw):
            site = _site[0]; _site[0] += 1
            out = orig(*args, **kw)
            flat = jax.tree_util.tree_leaves(out)
            jax.debug.callback(_rec(f"{name}@{site}"), *flat)
            return out

        return patched

    setattr(icp_mod.res, _name, _wrap(_name))


def run(mesh_n, seed_frame):
    RECORDS.clear()
    _site[0] = 0
    cfg = SlamConfig().replace(
        capacity=SMALL_CAPS,
        mapping={"init_accumulate_frames": 6},
        optimization={"icp_maximum_iteration": 5, "full_iterations": 3,
                      "knn_exact": 1},
        parallel={"mesh_devices": mesh_n},
    )
    ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
    sim = LivoxSimulator(
        SimConfig(points_per_frame=3072,
                  seed=int(os.environ.get("SEED", "1"))),
        traj=Trajectory(ramp_t0=ramp))
    caps = cfg.capacity
    state = init_state(cfg)
    mesh = None
    if mesh_n > 1:
        mesh = make_mesh(mesh_n)
        state = shard_state(state, mesh)
    from loam_livox_tpu.parallel.mesh import set_active_mesh
    set_active_mesh(mesh, deterministic=True)
    for i in range(seed_frame + 1):
        ENABLED[0] = i == seed_frame
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
            inputs = replicate(inputs, mesh)
        state, reg, _ = process_raw_frame(state, *inputs, cfg,
                                          piecewise_number=1)
        jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
        jax.effects_barrier()
    return list(RECORDS)


def main():
    seed_frame = int(os.environ.get("FRAME", "8"))
    r1 = run(1, seed_frame)
    r8 = run(8, seed_frame)
    print(f"records: {len(r1)} vs {len(r8)}")

    # async dispatch interleaves the corner/surface streams differently
    # per run — pair records by SHAPE stream, in stream order
    def streams(recs):
        g = {}
        for t, arrs in recs:
            key = (t.split("@")[0], tuple(a.shape for a in arrs))
            g.setdefault(key, []).append((t, arrs))
        return g

    g1, g8 = streams(r1), streams(r8)
    pairs = []
    for shape in g1:
        for (t1, a1), (t8, a8) in zip(g1[shape], g8.get(shape, [])):
            pairs.append((f"{shape} {t1}/{t8}", a1, a8))
    for k, (t1, a1, a8) in enumerate(pairs):
        msgs = []
        for j, (x, y) in enumerate(zip(a1, a8)):
            if np.issubdtype(x.dtype, np.integer):
                neq = int((x != y).sum())
                if neq:
                    rows = np.unique(np.nonzero(x != y)[0])[:4]
                    msgs.append(f"arr[{j}] idx mismatches={neq} rows={rows}")
            else:
                d = np.abs(x.astype(np.float64) - y.astype(np.float64))
                if d.max() > 0:
                    msgs.append(f"arr[{j}] max|Δ|={d.max():.3e} "
                                f"@row {int(np.unravel_index(d.argmax(), d.shape)[0])}")
        if msgs:
            print(f"#{k} {t1}: " + "; ".join(msgs))
    if len(r1) != len(r8):
        print(f"record-count mismatch: {len(r1)} vs {len(r8)} "
              "(iteration counts differ inside the frame)")


if __name__ == "__main__":
    main()
