"""The multi-chip equivalence contract, executed against the REAL TPU
backend (VERDICT r4 item 4).

The two-leg contract (tests/test_parallel_mode.py) is proven on the
virtual XLA:CPU mesh, where the ulp-floor forensics live
(docs/multichip.md): CPU codegen FMA-contracts partitioned and
whole-array elementwise loops differently, so the motion regime only
gets a chaos envelope.  This script executes the SAME contract against
the chip, at the strongest configuration one physical chip supports —
a 1-device product mesh (GSPMD partitioner, product layout, replication
pinning) vs the unsharded program — and asks whether Mosaic/XLA:TPU
codegen permits a *tighter* contract (bitwise with motion):

* leg `det`       — deterministic mode, NO mesh (hardened baseline);
* leg `det_mesh1` — deterministic mode, 1-DEVICE product mesh;
* leg `plain`     — plain numerics: yardstick B (the chip's legitimate
  f32 re-rounding sensitivity) + the on-chip deterministic tax;
* leg `ulp`       — deterministic, post-ramp input nudged by one f32
  ulp: yardstick A (the solver's intrinsic input sensitivity);
* legs `det_short` / `det_mesh1_short` — only the init-accumulation
  window (no chaotic solver in the loop): the BITWISE contractive-
  regime leg, compared over EVERY state leaf.

Verdicts mirror tests/test_parallel_mode.py: contractive-window state
bitwise; motion-regime trajectory gap within max(4·max(gapA, gapB),
5 mm); ATE agreement within the yardstick spread (0.05 m floor);
accept-count agreement within the yardstick spread (±3 floor).

Each leg runs in a SUBPROCESS (own jit cache — the mesh-global tracing
flag must not alias cache entries across legs; persistent cache off for
code provenance, mirroring the test suite's fixture).

Writes scripts/contract_tpu_out.json.
Run on the TPU chip:  python scripts/contract_tpu.py
"""
import json
import os
import subprocess
import sys

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.join(SCRIPTS, "..")

RAMP_FRAMES = 8  # standstill prefix: ramp_t0 = 0.8 s at 10 Hz

LEG_SRC = r'''
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", None)  # code provenance

mode = sys.argv[1]      # det|det_mesh1|plain|ulp[,_short suffix]
out_path = sys.argv[2]
n_frames = int(sys.argv[3])
perturb = bool(int(sys.argv[4]))
RAMP_FRAMES = 8

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.eval.scenarios import SMALL_CAPS
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig, Trajectory
from loam_livox_tpu.runtime.pipeline import OdometryPipeline

det = 0 if mode.startswith("plain") else 1
mesh1 = mode.startswith("det_mesh1")
cfg = SlamConfig().replace(
    capacity={**SMALL_CAPS, "auto_schedule": 0},
    mapping={"init_accumulate_frames": 6},
    optimization={"icp_maximum_iteration": 5, "full_iterations": 3},
    parallel={"mesh_devices": 1, "deterministic": det},
)
ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
sim = LivoxSimulator(SimConfig(points_per_frame=3072, seed=3),
                     traj=Trajectory(ramp_t0=ramp))


def make_pipe():
    pipe = OdometryPipeline(cfg)
    if mesh1:
        # the full product path on ONE chip: a 1-device mesh with the
        # product layout — GSPMD partitions the same program it would
        # on a pod slice, minus the collectives
        from loam_livox_tpu.parallel import make_mesh
        from loam_livox_tpu.parallel.layout import shard_state

        pipe.mesh = make_mesh(1)
        pipe.state = shard_state(pipe.state, pipe.mesh)
    return pipe


frames = []
for i in range(n_frames):
    xyz, inten, t0 = sim.frame(i)
    if perturb and i >= RAMP_FRAMES:
        # one f32 ulp on every coordinate of every post-ramp frame —
        # the smallest representable SUSTAINED input change
        xyz = np.nextafter(np.asarray(xyz, np.float32),
                           np.float32(np.inf))
    frames.append((xyz, inten, t0))

# warm compile outside the timing
pipe = make_pipe()
for xyz, inten, t0 in frames[:2]:
    pipe.process_raw(xyz, inten, t0)
pipe.flush()

pipe2 = make_pipe()
t0w = time.perf_counter()
for xyz, inten, t0 in frames:
    pipe2.process_raw(xyz, inten, t0)
pipe2.flush()
wall = time.perf_counter() - t0w

state = jax.device_get(pipe2.state)
gt = np.stack([sim.gt_pose_at(t)[1] for t in pipe2.trajectory.times])
out = {
    "positions": pipe2.trajectory.positions_array(),
    "quaternions": np.stack(pipe2.trajectory.quaternions),
    "accepted": np.asarray(pipe2.trajectory.accepted),
    "gt": gt,
    "wall_s": np.float64(wall),
}
# every state leaf, field-labeled — the bitwise contractive-regime leg
# compares ALL of them (mirrors test_map_build_is_bitwise)
for f in state._fields:
    for j, leaf in enumerate(jax.tree_util.tree_leaves(getattr(state, f))):
        out["state.%%s.%%d" %% (f, j)] = np.asarray(leaf)
np.savez(out_path, **out)
print(json.dumps({"mode": mode, "wall_s": round(wall, 3),
                  "fps": round(len(frames) / wall, 2),
                  "backend": jax.default_backend(),
                  "device": jax.devices()[0].device_kind}))
'''


def run_leg(mode, out_path, n_frames=16, perturb=False):
    src = LEG_SRC % {"repo": os.path.abspath(REPO)}
    r = subprocess.run([sys.executable, "-c", src, mode, out_path,
                        str(n_frames), str(int(perturb))],
                       capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        raise RuntimeError(f"leg {mode} failed:\n{r.stderr[-3000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    import numpy as np

    sys.path.insert(0, os.path.abspath(REPO))
    from loam_livox_tpu.eval.ate import ate_rmse

    results = {}
    legs = {}
    spec = {
        "det": dict(n_frames=16),
        "det_mesh1": dict(n_frames=16),
        "plain": dict(n_frames=16),
        "ulp": dict(n_frames=16, perturb=True),
        "det_short": dict(n_frames=6),
        "det_mesh1_short": dict(n_frames=6),
    }
    for mode, kw in spec.items():
        out_path = os.path.join(SCRIPTS, f"_contract_leg_{mode}.npz")
        base = "det" if mode == "ulp" else mode.replace("_short", "")
        legs[mode] = run_leg(base, out_path, **kw)
        legs[mode]["mode"] = mode
        legs[mode]["npz"] = out_path
    results["device"] = legs["det"].get("device")
    results["backend"] = legs["det"].get("backend")

    a = np.load(legs["det"]["npz"])
    b = np.load(legs["det_mesh1"]["npz"])
    c = np.load(legs["plain"]["npz"])
    p = np.load(legs["ulp"]["npz"])
    s1 = np.load(legs["det_short"]["npz"])
    s8 = np.load(legs["det_mesh1_short"]["npz"])

    # ---- leg 1: contractive regime (init-accumulation window) must be
    # bit-identical across layouts over EVERY state leaf
    bad_leaves = []
    for k in s1.files:
        if not k.startswith("state."):
            continue
        if not np.array_equal(s1[k], s8[k]):
            bad_leaves.append(k)
    results["bitwise_contractive_leg"] = {
        "n_frames": 6,
        "all_state_leaves_bitwise": not bad_leaves,
        "diverged_leaves": bad_leaves[:10],
        "n_leaves_compared": sum(k.startswith("state.")
                                 for k in s1.files),
    }

    # ---- leg 2: chaos envelope with both yardsticks
    t1 = np.asarray(a["positions"], np.float64)
    t8 = np.asarray(b["positions"], np.float64)
    tn = np.asarray(c["positions"], np.float64)
    tp = np.asarray(p["positions"], np.float64)
    gt = np.asarray(a["gt"], np.float64)
    pergap = np.linalg.norm(t8 - t1, axis=1)
    gap8 = float(pergap.max())
    gapP = float(np.linalg.norm(tp - t1, axis=1).max())
    gapN = float(np.linalg.norm(tn - t1, axis=1).max())
    env = max(4.0 * max(gapP, gapN), 5e-3)
    nz = np.nonzero(pergap > 0)[0]
    first_div = int(nz[0]) if nz.size else -1
    a1, a8 = ate_rmse(t1, gt), ate_rmse(t8, gt)
    aP, aN = ate_rmse(tp, gt), ate_rmse(tn, gt)
    spread = max(2.0 * max(abs(aP - a1), abs(aN - a1)), 0.05)
    acc1 = int(a["accepted"].astype(int).sum())
    acc8 = int(b["accepted"].astype(int).sum())
    accP = int(p["accepted"].astype(int).sum())
    accN = int(c["accepted"].astype(int).sum())
    acc_env = max(2 * max(abs(accP - acc1), abs(accN - acc1)), 3)
    results["chaos_envelope_leg"] = {
        "n_frames": 16,
        "trajectory_bitwise_with_motion": bool((t1 == t8).all()),
        "first_divergence_frame": first_div,
        "sharded_gap_m": gap8,
        "yardstick_ulp_gap_m": gapP,
        "yardstick_rerounding_gap_m": gapN,
        "envelope_m": env,
        "gap_within_envelope": gap8 <= env,
        "ate_1dev_m": a1, "ate_mesh1_m": a8,
        "ate_spread_allowed_m": spread,
        "ate_within_spread": abs(a8 - a1) <= spread,
        "accepts": {"det": acc1, "mesh1": acc8, "ulp": accP,
                    "plain": accN},
        "accept_within_envelope": abs(acc8 - acc1) <= acc_env,
    }
    results["det_tax_fps"] = {
        "plain_fps": legs["plain"]["fps"],
        "det_fps": legs["det"]["fps"],
        "mesh1_fps": legs["det_mesh1"]["fps"],
        "note": "16 frames at SMALL_CAPS — wall is sub-second on the "
                "chip; fps deltas here are dispatch noise, not a tax "
                "measurement (see BENCH for the production-shape tax)",
    }
    results["contract_pass"] = bool(
        results["bitwise_contractive_leg"]["all_state_leaves_bitwise"]
        and results["chaos_envelope_leg"]["gap_within_envelope"]
        and results["chaos_envelope_leg"]["ate_within_spread"]
        and results["chaos_envelope_leg"]["accept_within_envelope"])
    results["tighter_contract_possible"] = bool(
        results["chaos_envelope_leg"]["trajectory_bitwise_with_motion"])
    results["legs"] = {m: {k: v for k, v in d.items() if k != "npz"}
                       for m, d in legs.items()}
    for d in legs.values():
        os.remove(d["npz"])
    path = os.path.join(SCRIPTS, "contract_tpu_out.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
