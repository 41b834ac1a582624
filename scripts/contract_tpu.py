"""The multi-chip equivalence contract, executed against the REAL TPU
backend (VERDICT r4 item 4).

The two-leg contract (tests/test_parallel_mode.py) is proven on the
virtual XLA:CPU mesh, where the ulp-floor forensics live
(docs/multichip.md): CPU codegen FMA-contracts partitioned and
whole-array elementwise loops differently, so the motion regime only
gets a chaos envelope.  This script asks what the TPU target itself
permits, at the strongest configuration one physical chip supports:

* leg A — deterministic mode, NO mesh (the hardened baseline),
* leg B — deterministic mode, a 1-DEVICE mesh: the full product path
  (GSPMD partitioner, replication pinning, sharding constraints) over
  the same chip,
* leg C — plain numerics (deterministic=0), no mesh: the measured
  re-rounding sensitivity of Mosaic/XLA:TPU codegen, and the
  deterministic-mode throughput tax on the chip.

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
import time

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.join(SCRIPTS, "..")

LEG_SRC = r'''
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", None)  # code provenance

mode = sys.argv[1]          # "plain" | "det" | "det_mesh1"
out_path = sys.argv[2]

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.eval.scenarios import SMALL_CAPS
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig, Trajectory
from loam_livox_tpu.runtime.pipeline import OdometryPipeline

det = 0 if mode == "plain" else 1
cfg = SlamConfig().replace(
    capacity={**SMALL_CAPS, "auto_schedule": 0},
    mapping={"init_accumulate_frames": 6},
    optimization={"icp_maximum_iteration": 5, "full_iterations": 3},
    parallel={"mesh_devices": 1, "deterministic": det},
)
n_frames = 16
ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
sim = LivoxSimulator(SimConfig(points_per_frame=3072, seed=3),
                     traj=Trajectory(ramp_t0=ramp))
pipe = OdometryPipeline(cfg)
if mode == "det_mesh1":
    # the full product path on ONE chip: a 1-device mesh with the
    # product layout — GSPMD partitions the same program it would on a
    # pod slice, minus the collectives
    from loam_livox_tpu.parallel import make_mesh
    from loam_livox_tpu.parallel.layout import shard_state

    pipe.mesh = make_mesh(1)
    pipe.state = shard_state(pipe.state, pipe.mesh)

frames = []
for i in range(n_frames):
    xyz, inten, t0 = sim.frame(i)
    frames.append((xyz, inten, t0))
# warm compile outside the timing
for xyz, inten, t0 in frames[:2]:
    pipe.process_raw(xyz, inten, t0)
pipe.flush()
pipe2 = OdometryPipeline(cfg)
if mode == "det_mesh1":
    from loam_livox_tpu.parallel import make_mesh
    from loam_livox_tpu.parallel.layout import shard_state

    pipe2.mesh = make_mesh(1)
    pipe2.state = shard_state(pipe2.state, pipe2.mesh)
t0w = time.perf_counter()
for xyz, inten, t0 in frames:
    pipe2.process_raw(xyz, inten, t0)
pipe2.flush()
wall = time.perf_counter() - t0w
import jax
state = jax.device_get(pipe2.state)
np.savez(out_path,
         positions=pipe2.trajectory.positions_array(),
         quaternions=np.stack(pipe2.trajectory.quaternions),
         accepted=np.asarray(pipe2.trajectory.accepted),
         map_surf_xyz=np.asarray(state.map_surface.xyz),
         map_surf_mask=np.asarray(state.map_surface.mask),
         hist_surf=np.asarray(state.hist_surf_xyz),
         t_w=np.asarray(state.t_w), q_w=np.asarray(state.q_w),
         wall_s=np.float64(wall))
print(json.dumps({"mode": mode, "wall_s": round(wall, 2),
                  "fps": round(len(frames) / wall, 2)}))
'''


def run_leg(mode: str, out_path: str) -> dict:
    src = LEG_SRC % {"repo": os.path.abspath(REPO)}
    r = subprocess.run([sys.executable, "-c", src, mode, out_path],
                       capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        raise RuntimeError(f"leg {mode} failed:\n{r.stderr[-3000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    import numpy as np

    results = {"device": None}
    legs = {}
    for mode in ("det", "det_mesh1", "plain"):
        out_path = os.path.join(SCRIPTS, f"_contract_leg_{mode}.npz")
        legs[mode] = run_leg(mode, out_path)
        legs[mode]["npz"] = out_path
    results["legs"] = legs

    a = np.load(legs["det"]["npz"])
    b = np.load(legs["det_mesh1"]["npz"])
    c = np.load(legs["plain"]["npz"])

    def gap(x, y):
        return float(np.abs(np.asarray(x, np.float64)
                            - np.asarray(y, np.float64)).max())

    bitwise_traj = bool((a["positions"] == b["positions"]).all()
                        and (a["quaternions"] == b["quaternions"]).all())
    bitwise_map = bool((a["map_surf_xyz"] == b["map_surf_xyz"]).all()
                       and (a["map_surf_mask"] == b["map_surf_mask"]).all()
                       and (a["hist_surf"] == b["hist_surf"]).all())
    results["mesh1_vs_unsharded"] = {
        "trajectory_bitwise": bitwise_traj,
        "map_bitwise": bitwise_map,
        "max_traj_gap_m": gap(a["positions"], b["positions"]),
        "accept_diff": int(np.abs(a["accepted"].astype(int)
                                  - b["accepted"].astype(int)).sum()),
    }
    results["plain_vs_det"] = {
        "max_traj_gap_m": gap(a["positions"], c["positions"]),
        "det_tax_fps": {
            "plain_fps": legs["plain"]["fps"],
            "det_fps": legs["det"]["fps"],
            "mesh1_fps": legs["det_mesh1"]["fps"],
        },
    }
    for mode in legs.values():
        os.remove(mode.pop("npz"))
    path = os.path.join(SCRIPTS, "contract_tpu_out.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
