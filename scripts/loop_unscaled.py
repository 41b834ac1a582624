"""Loop closure with NOTHING scaled: the shipped keyframe cadence and
every shipped gate, on a commensurately long capture.

Configuration is `performance_precision.yaml` + the loop flags the
SHIPPED loop launch sets (reference ``launch/rosbag_loop_simple.launch:
10-11``: enable + ``minimum_keyframe_differen = 20``) — NOTHING else:

* scans_of_each_keyframe = 300, scans_between_two_keyframe = 100
  (``config/performance_precision.yaml:46-47``),
* threshold_cell_revisit = 2000 (``performance_precision.yaml:7``),
* similarity 0.94/0.65, ratios 0.05/0.03, inlier accept 0.20
  (``performance_precision.yaml:49-56``, ``laser_mapping.hpp:994-1116``),
* 1 cm range noise (the Livox spec at this world's ranges).

The capture: the loop-closure scenario's rich world with the trajectory
periods stretched to τ = 60 s so revisits occur at the 300-scan
keyframe timescale; the keyframe-separation gate (≥ 20 keyframes)
first admits candidates at keyframe 20 ≈ frame 2300, so the run is
2600 frames ≈ 4.3 min of sensor time.

Writes scripts/loop_unscaled_out.json and prints one JSON line.
Run on the TPU chip:  python scripts/loop_unscaled.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_cfg():
    """The run's exact configuration — shared with the CI replay guard
    (tests/test_loop_unscaled_guard.py), which must evaluate the gates
    under the SAME shipped parameters the artifact was produced with."""
    from loam_livox_tpu.core.config import SlamConfig

    return SlamConfig().replace(
        # odometry setup as the loop scenario ships it (deblur off on the
        # oscillating trajectory; NOT a loop gate)
        common={"if_motion_deblur": 0, "piecewise_number": 1},
        mapping={"init_accumulate_frames": 10},
        # the shipped loop launch's exact flags — everything else stays
        # at performance_precision.yaml values
        loop_closure={"if_enable_loop_closure": 1,
                      "minimum_keyframe_differen": 20},
        # capacities are TPU static shapes, not behavior: the cell
        # directory must hold this world's full-map cells
        capacity={"cell_capacity": 16384},
    )


def main():
    from loam_livox_tpu.eval.ate import ate_rmse
    from loam_livox_tpu.io.simulator import (
        ConvexScene,
        LivoxSimulator,
        SimConfig,
        Trajectory,
    )
    from loam_livox_tpu.runtime.pipeline import OdometryPipeline

    frames = int(os.environ.get("LOOP_FRAMES", "2600"))
    # LOOP_NOISE > the 0.01 default produces the DRIFT-regime variant
    # (loop_drift_*.json artifacts): enough accumulated odometry error
    # that the pose-graph payoff must be strictly positive — the regime
    # loop closure exists for (eval/loop_payoff.payoff_verdict).
    noise = float(os.environ.get("LOOP_NOISE", "0.01"))
    suffix = os.environ.get("LOOP_SUFFIX", "")
    cfg = make_cfg()
    lc = cfg.loop_closure
    assert lc.scans_of_each_keyframe == 300
    assert lc.scans_between_two_keyframe == 100
    assert cfg.common.threshold_cell_revisit == 2000
    assert lc.minimum_similarity_planar == 0.94
    assert lc.minimum_similarity_linear == 0.65
    assert lc.map_alignment_inlier_threshold == 0.20
    assert lc.avail_ratio_plane == 0.05 and lc.avail_ratio_line == 0.03

    rng = np.random.default_rng(0)
    scene = ConvexScene.random_rich_world(
        rng, half_extent=28.0, half_extent_z=5.0,
        n_rot_boxes=28, n_rocks=48, n_ridges=14)
    # commensurate periods: all axes and yaw return to the start pose at
    # τ = 60 s — the same revisiting trajectory as the scenario, at the
    # 300-scan keyframe timescale
    traj = Trajectory(ramp_t0=0.1 * cfg.mapping.init_accumulate_frames + 0.2)
    traj.lin_hz = np.array([1 / 60.0, 1 / 60.0, 1 / 60.0])
    traj.yaw_hz = 1 / 60.0
    traj.pitch_hz = 1 / 60.0
    sim = LivoxSimulator(SimConfig(points_per_frame=10000, seed=0,
                                   noise_std=noise), scene=scene, traj=traj)

    pipe = OdometryPipeline(cfg)
    t0 = time.perf_counter()
    for i in range(frames):
        xyz, inten, bt = sim.frame(i)
        pipe.process_raw(xyz, inten, bt)
        if (i + 1) % 200 == 0:
            closed = pipe.loop_closer.closed
            print(f"frame {i + 1}/{frames} keyframes="
                  f"{len(pipe.loop_closer.keyframes)} closed={closed}",
                  file=sys.stderr, flush=True)
        if pipe.loop_closer.closed:
            break
    pipe.flush()
    wall = time.perf_counter() - t0

    est = pipe.trajectory.positions_array()
    gt = np.stack([sim.gt_pose_at(t)[1] for t in pipe.trajectory.times])
    closer = pipe.loop_closer
    out = {
        "frames": len(pipe.trajectory.positions),
        "wall_s": round(wall, 1),
        "keyframes": len(closer.keyframes),
        "loop_closed": bool(closer.closed),
        "ate_aligned": round(ate_rmse(est, gt), 4),
        "ate_raw": round(ate_rmse(est, gt, align=False), 4),
        "accepted": int(sum(pipe.trajectory.accepted)),
        "shipped_gates": {
            "scans_of_each_keyframe": lc.scans_of_each_keyframe,
            "scans_between_two_keyframe": lc.scans_between_two_keyframe,
            "threshold_cell_revisit": cfg.common.threshold_cell_revisit,
            "minimum_keyframe_differen": lc.minimum_keyframe_differen,
            "similarity": [lc.minimum_similarity_planar,
                           lc.minimum_similarity_linear],
            "ratios": [lc.avail_ratio_plane, lc.avail_ratio_line],
            "inlier_accept": lc.map_alignment_inlier_threshold,
            "noise_std_m": noise,
        },
    }
    if closer.result is not None:
        out["loop"] = {"his": closer.result.his_idx,
                       "cur": closer.result.cur_idx,
                       "icp_score": round(closer.result.icp_score, 4)}
        # ---- loop-closure PAYOFF (VERDICT r4 item 2): the optimized
        # path and corrected map scored, not just produced (reference
        # outputs: laser_mapping.hpp:845-871, :1091-1100) -------------
        from loam_livox_tpu.eval.loop_payoff import score_loop_payoff

        payoff = score_loop_payoff(closer, pipe.trajectory.times,
                                   sim.gt_pose_at)
        out["payoff"] = payoff
        # keyframe ground-truth positions — lets the CI replay guard
        # re-score a replayed pose-graph solve against the same truth
        times = pipe.trajectory.times
        out["kf_gt_positions"] = [
            [round(float(v), 6) for v in
             sim.gt_pose_at(times[min(int(k.ending_frame_idx),
                                      len(times) - 1)])[1]]
            for k in closer.keyframes]
        # payoff asserted AFTER the artifacts are written (a failed
        # expectation must still leave the data on disk for forensics)
    # the decisive gate values actually measured, for the write-up
    out["gate_trace_tail"] = closer.gate_trace[-8:]
    out["gate_trace_len"] = len(closer.gate_trace)

    # ---- regression-guard artifact (VERDICT r3 item 6): the keyframe
    # records + descriptors + era snapshots of this run, so CI can
    # REPLAY the shipped-gate decision chain against real unscaled data
    # without the 2300-frame run (tests/test_loop_unscaled_guard.py).
    from loam_livox_tpu.runtime.checkpoint import save_loop_state

    # strip the full-cloud snapshots (the guard replays gates +
    # scene-alignment ICP, which read descriptors + line/plane
    # snapshots only; full clouds would bloat the committed artifact)
    # and round the kept clouds to 1 mm — semantically inert at 1 cm
    # sensor noise, and the zeroed mantissas compress ~3× smaller
    for rec in closer.keyframes:
        rec.snap_full = None
        for s in ("snap_line", "snap_plane"):
            v = getattr(rec, s)
            if v is not None:
                setattr(rec, s, np.round(v * 1024.0) / 1024.0)
    state_path = os.path.join(os.path.dirname(__file__),
                              f"loop_unscaled_state{suffix}.npz")
    save_loop_state(closer, state_path)
    trace_path = os.path.join(os.path.dirname(__file__),
                              f"loop_unscaled_trace{suffix}.json")
    with open(trace_path, "w") as f:
        json.dump(closer.gate_trace, f, default=str)
    out["state_artifact"] = os.path.basename(state_path)
    if "payoff" in out:
        from loam_livox_tpu.eval.loop_payoff import payoff_verdict

        out["payoff_verdict"] = payoff_verdict(out["payoff"])
    with open(os.path.join(os.path.dirname(__file__),
                           f"loop_unscaled_out{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps(out, default=str))
    if "payoff_verdict" in out:
        assert out["payoff_verdict"]["ok"], (out["payoff_verdict"],
                                             out["payoff"])


if __name__ == "__main__":
    main()
