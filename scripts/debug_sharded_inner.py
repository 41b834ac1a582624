"""Pinpoint the remaining sharded-vs-unsharded noise: monkeypatch the
solver internals with jax.debug.callback recorders, run frame 6 (the
first diverging step) in both layouts, and diff the recorded stream.
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

import jax.numpy as jnp
import numpy as np

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.eval.scenarios import SMALL_CAPS
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig, Trajectory
from loam_livox_tpu.parallel import make_mesh
from loam_livox_tpu.parallel.layout import replicate, shard_state
from loam_livox_tpu.registration import gauss_newton as gn
from loam_livox_tpu.registration import icp as icp_mod
from loam_livox_tpu.runtime.odometry import init_state
from loam_livox_tpu.runtime.pipeline import process_raw_frame

RECORDS = []


def _rec(tag):
    def cb(*arrs):
        RECORDS.append((tag, [np.asarray(a).copy() for a in arrs]))
    return cb


# ---- instrument _system_from_rJ and knn ------------------------------------
_orig_sys = gn._system_from_rJ
_site = [0]


def patched_sys(r0, J, mask, delta):
    site = _site[0]; _site[0] += 1
    H, g = _orig_sys(r0, J, mask, delta)
    # recompute the weight chain with the same tracer inputs — CSE
    # makes these the same values the original computed
    from loam_livox_tpu.registration.residuals import huber_weight
    s2 = jnp.sum(r0 * r0, axis=-1)
    w = jnp.where(mask, huber_weight(s2, delta), 0.0)
    sw = jnp.sqrt(w)
    jax.debug.callback(_rec(f"rJ@{site}"), r0, J, mask)
    jax.debug.callback(_rec(f"wchain@{site}"), s2, w, sw,
                       r0 * sw[:, None], J * sw[:, None, None])
    jax.debug.callback(_rec(f"Hg@{site}"), H, g)
    return H, g


gn._system_from_rJ = patched_sys

_orig_ns = gn._normal_system


def patched_ns(f, q, t, delta, fj=None):
    site = _site[0]; _site[0] += 1
    jax.debug.callback(_rec(f"qt@{site}"), q, t)
    return _orig_ns(f, q, t, delta, fj)


gn._normal_system = patched_ns

_orig_solve = gn._solve_damped


def patched_solve(H, g, lam):
    site = _site[0]; _site[0] += 1
    dd = _orig_solve(H, g, lam)
    jax.debug.callback(_rec(f"dd@{site}"), dd, lam, H, g)
    return dd


gn._solve_damped = patched_solve

_orig_cost = gn._cost


def patched_cost(r, mask, delta):
    site = _site[0]; _site[0] += 1
    c = _orig_cost(r, mask, delta)
    jax.debug.callback(_rec(f"cost@{site}"), c)
    return c


gn._cost = patched_cost

from loam_livox_tpu.ops import knn as knn_mod

_orig_knn = knn_mod.knn.__wrapped__  # un-jitted


def patched_knn(*args, **kw):
    site = _site[0]; _site[0] += 1
    d, i = _orig_knn(*args, **kw)
    jax.debug.callback(_rec(f"knn@{site}"), d, i)
    return d, i


icp_mod.knn = patched_knn

# ---- instrument the target-build + query-transform chain -------------------
from loam_livox_tpu.registration import residuals as res_mod

for _name in ("build_line_targets", "build_plane_targets",
              "transform_points_incre"):
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


def run(mesh_n):
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
                  seed=int(os.environ.get("SEED", "3"))),
        traj=Trajectory(ramp_t0=ramp))
    caps = cfg.capacity
    state = init_state(cfg)
    mesh = None
    if mesh_n > 1:
        mesh = make_mesh(mesh_n)
        state = shard_state(state, mesh)
    from loam_livox_tpu.parallel.mesh import set_active_mesh
    set_active_mesh(mesh, deterministic=True)
    for i in range(int(os.environ.get("N_FRAMES", "7"))):
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
    jax.block_until_ready(state)
    jax.effects_barrier()
    return list(RECORDS)


def main():
    r1 = run(1)
    r8 = run(8)
    print(f"records: {len(r1)} vs {len(r8)}")

    def group(recs):
        g = {}
        for t, arrs in recs:
            key = (t, tuple(a.shape for a in arrs))
            g.setdefault(key, []).append(arrs)
        return g

    g1, g8 = group(r1), group(r8)
    bad = 0
    for key in g1:
        seq1, seq8 = g1[key], g8.get(key, [])
        if len(seq1) != len(seq8):
            print(f"{key[0]} {key[1]}: count {len(seq1)} vs {len(seq8)}")
            continue
        first = True
        for k, (a1, a8) in enumerate(zip(seq1, seq8)):
            for j, (x, y) in enumerate(zip(a1, a8)):
                d = np.abs(x.astype(np.float64) - y.astype(np.float64)).max()
                if d > 0:
                    if first:
                        print(f"{key[0]} {key[1]}: FIRST diff seq#{k} "
                              f"arr[{j}] max|Δ|={d:.3e}")
                        first = False
                    bad += 1
                    break
        if first:
            print(f"{key[0]} {key[1]}: all {len(seq1)} identical")
    if not bad:
        print("all recorded intermediates identical")


if __name__ == "__main__":
    main()
