"""The five BASELINE.json benchmark scenarios as runnable configs —
the CI matrix mirroring the reference's launch-file scenarios
(BASELINE.md "Scenario coverage").

Each entry returns (SlamConfig, runner kwargs).  `run_scenario` drives
it on the synthetic stream (rosbags are not shippable here; `--source
pcd:` in the CLI covers converted real sequences).
"""
from __future__ import annotations

import json
import time
from typing import Dict

import numpy as np

from ..core.config import SlamConfig, largescale_profile, realtime_profile


#: CPU-scale capacity overrides for the CI golden tests — one shared
#: static-shape set so the jitted frame program compiles once across
#: the whole scenario matrix (full-capacity steps are ~3 s/frame on a
#: CPU host; these run ~10× faster and still exercise every code path).
SMALL_CAPS = {
    "max_raw_points": 4096, "max_corner": 256, "max_surface": 1024,
    "max_corner_ds": 256, "max_surface_ds": 1024,
    "map_corner_capacity": 4096, "map_surf_capacity": 16384,
    "hist_corner_capacity": 128, "hist_surf_capacity": 512,
    "history_window": 16,
}


def scenario_config(name: str, small: bool = False):
    """Configs for the 5 BASELINE.json scenarios.  ``small=True``
    shrinks capacities/frames to the CPU-runnable CI variant (golden
    ATE regression tests in tests/test_scenarios_ci.py)."""
    cfg, kw = _scenario_config_full(name)
    if small:
        cfg = cfg.replace(
            capacity=SMALL_CAPS,
            mapping={"init_accumulate_frames": 6},
            optimization={"icp_maximum_iteration": 5,
                          "full_iterations": 3},
        )
        kw = dict(kw)
        kw["points"] = 3072
        kw["frames"] = min(kw["frames"], 24)
        if name == "loop_closure":
            # keyframes must complete within the shortened run; the
            # CPU-scale point budget can't populate enough plane cells
            # for the shipped 0.05 admission ratio, so the SMALL
            # variant loosens the ratios to exercise the machinery —
            # the full-scale scenario (small=False, run on the chip)
            # validates the reference gates UNCHANGED
            cfg = cfg.replace(loop_closure={
                "scans_of_each_keyframe": 12,
                "scans_between_two_keyframe": 6,
                "minimum_keyframe_differen": 2,
                "avail_ratio_plane": 0.005,
                "avail_ratio_line": 0.0})
            kw = dict(kw, frames=40, noise=0.005)
            kw.pop("scene", None)       # CPU budget: default room scene
            kw.pop("scene_kind", None)
    return cfg, kw


def _scenario_config_full(name: str):
    if name == "odometry_only":
        # 1: Mid-40 short sequence, odometry-only, loop off (CPU-runnable)
        cfg = SlamConfig().replace(
            common={"if_motion_deblur": 0, "piecewise_number": 1},
            mapping={"init_accumulate_frames": 10},
            capacity={"max_raw_points": 8192, "map_surf_capacity": 32768,
                      "map_corner_capacity": 8192},
        )
        return cfg, {"frames": 40, "points": 8192}
    if name == "full_mapping":
        # 2: Mid-40 full odometry+mapping with motion deblur + cell maps
        cfg = SlamConfig().replace(
            mapping={"init_accumulate_frames": 20, "matching_mode": 1},
        )
        return cfg, {"frames": 60, "points": 10000}
    if name == "largescale_realtime":
        # 3: coarse resolutions, realtime profile, large outdoor-scale
        # scene (the HKUST_01 analogue — the 1.2 m plane leaf assumes
        # big structure)
        cfg = largescale_profile().replace(
            mapping={"init_accumulate_frames": 20},
        )
        return cfg, {"frames": 60, "points": 10000,
                     "scene": {"half_extent": 45.0, "half_extent_z": 8.0,
                               "n_pillars": 14, "n_ridges": 24},
                     "traj_scale": 4.0}
    if name == "loop_closure":
        # 4: loop closure enabled (scene alignment + pose graph) with
        # ALL of the reference's SHIPPED loop gates UNCHANGED —
        # admission ratios 0.05/0.03, similarity 0.94/0.65
        # (laser_mapping.hpp:994-1001), and scene-alignment inlier
        # score 0.20 (performance_precision.yaml
        # map_alignment_inlier_threshold): the orientation-rich world
        # supplies the ≥180 distinct plane-normal bins per keyframe a
        # real campus scene has; 1 cm range noise is the Livox spec at
        # this world's ≤15 m ranges (σ grows with range — 2 cm is the
        # long-range figure; a flat 2 cm here models a sensor 2-4×
        # worse than real at these distances, and measurably flattens
        # the ICP cost valley into multi-modal wandering near the
        # revisit — see the f117-125 landscape analysis in RESULTS.md);
        # the trajectory oscillates through its start so real revisits
        # occur within the run
        cfg = SlamConfig().replace(
            # deblur's s-weighted fit amplifies static pose error 1.5×
            # per frame — marginal on this oscillating trajectory; the
            # plain path is the stable odometry for the loop run
            # threshold_cell_revisit scales with sequence length: the
            # reference ships 2000 frames (~3.3 min) for hour-long
            # captures; this 17 s run revisits after ~100 frames, so the
            # same "reset a cell not seen for a while" behavior needs a
            # proportional threshold (a temporal parameter, not an
            # accuracy gate — the loop gates are the shipped ones)
            common={"if_motion_deblur": 0, "piecewise_number": 1,
                    "threshold_cell_revisit": 50},
            mapping={"init_accumulate_frames": 10},
            # keyframe cadence 30/10 (shipped: 300/100 scans for
            # hour-long captures — scaled like threshold_cell_revisit;
            # also a time parameter): shorter keyframes accumulate less
            # intra-keyframe odometry smear, and both 30/10 and 45/15
            # pass the shipped 0.20 alignment score (0.177 / 0.196) —
            # 30/10 is kept for margin
            loop_closure={"if_enable_loop_closure": 1,
                          "scans_of_each_keyframe": 30,
                          "scans_between_two_keyframe": 10,
                          "minimum_keyframe_differen": 5},
        )
        # commensurate periods: all axes and yaw return to the start
        # pose at τ = 10 s (≈ frame 115 after the ramp)
        return cfg, {"frames": 170, "points": 10000, "noise": 0.01,
                     "scene_kind": "rich",
                     "scene": {"half_extent": 28.0, "half_extent_z": 5.0,
                               "n_rot_boxes": 28, "n_rocks": 48,
                               "n_ridges": 14},
                     "traj": {"lin_hz": np.array([0.05, 0.05, 0.05]),
                              "yaw_hz": 0.05, "pitch_hz": 0.05}}
    if name == "mid100_trilidar":
        # 5: tri-lidar input through the REAL multi-sensor front end
        # (`frontend.multi.extract_multi_lidar` — vmapped heads, merged
        # per piecewise window, reference laser_feature_extractor.hpp:
        # 85,173-180,305-389); the CI variant additionally runs the
        # odometry step sharded over the virtual 8-device mesh (the
        # multi-host substitute on this machine, parallel/mesh_devices)
        cfg = SlamConfig().replace(
            common={"if_motion_deblur": 0, "piecewise_number": 2},
            capacity={"max_raw_points": 8192},
        )
        return cfg, {"frames": 30, "points": 8192, "sensors": 3}
    raise KeyError(name)


SCENARIOS = ("odometry_only", "full_mapping", "largescale_realtime",
             "loop_closure", "mid100_trilidar")


def run_scenario(name: str, frames: int | None = None,
                 small: bool = False,
                 overrides: Dict | None = None) -> Dict:
    from ..eval.ate import ate_rmse
    from ..io.simulator import LivoxSimulator, SimConfig
    from ..runtime.pipeline import OdometryPipeline

    from ..io.simulator import ConvexScene, Trajectory

    cfg, kw = scenario_config(name, small=small)
    if small and kw.get("sensors", 1) > 1:
        # CI variant of the tri-lidar scenario: shard the odometry step
        # over the virtual 8-device mesh (the multi-host substitute)
        import jax

        if len(jax.devices()) >= 8:
            cfg = cfg.replace(parallel={"mesh_devices": 8})
    if overrides:
        cfg = cfg.replace(**overrides)
    n = frames or kw["frames"]
    pts = kw["points"]
    sensors = kw.get("sensors", 1)

    # the standstill ramp must cover the init-accumulation window (real
    # captures hold still while the seed map accumulates)
    ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
    tscale = kw.get("traj_scale", 1.0)
    sims = []
    for s in range(sensors):
        rng = np.random.default_rng(s)
        builder = (ConvexScene.random_rich_world
                   if kw.get("scene_kind") == "rich"
                   else ConvexScene.random_room)
        scene = builder(rng, **kw["scene"]) if "scene" in kw else None
        traj = Trajectory(ramp_t0=ramp)
        traj.lin_amp = traj.lin_amp * tscale
        for attr, val in kw.get("traj", {}).items():
            setattr(traj, attr, val)
        sims.append(LivoxSimulator(
            SimConfig(points_per_frame=pts, seed=s,
                      noise_std=kw.get("noise", 0.005)),
            scene=scene, traj=traj))
    pipe = OdometryPipeline(cfg)
    t0 = time.perf_counter()
    for i in range(n):
        if sensors == 1:
            xyz, inten, bt = sims[0].frame(i)
            pipe.process_raw(xyz, inten, bt)
        else:
            # the REAL multi-sensor path: per-head raw clouds through
            # the vmapped multi-lidar front end, merged per piecewise
            # window (reference: per-topic Livox_laser + merge-publish,
            # laser_feature_extractor.hpp:305-389); identity extrinsics
            # like the reference (the Mid-100 driver publishes a common
            # frame)
            import jax.numpy as jnp

            from ..frontend.multi import extract_multi_lidar
            from ..ops.voxel import voxel_downsample

            parts = [s.frame(i) for s in sims]
            caps = cfg.capacity
            nr = caps.max_raw_points
            xyz_s = np.zeros((sensors, nr, 3), np.float32)
            int_s = np.zeros((sensors, nr), np.float32)
            msk_s = np.zeros((sensors, nr), bool)
            for si, (x, it, _) in enumerate(parts):
                m = min(len(x), nr)
                xyz_s[si, :m] = x[:m]
                int_s[si, :m] = it[:m]
                msk_s[si, :m] = True
            fe = cfg.feature_extraction
            frames_out = extract_multi_lidar(
                jnp.asarray(xyz_s), jnp.asarray(int_s), jnp.asarray(msk_s),
                jnp.float32(parts[0][2]), fe, caps,
                piecewise_number=cfg.common.piecewise_number)
            for fr in frames_out:
                # source voxel downsample before "publish" (reference
                # laser_feature_extractor.hpp:372-384)
                fr = fr._replace(
                    corners=voxel_downsample(
                        fr.corners, fe.mapping_line_resolution,
                        capacity=fr.corners.capacity),
                    surface=voxel_downsample(
                        fr.surface, fe.mapping_plane_resolution / 2.0,
                        capacity=fr.surface.capacity))
                pipe.process_feature_frame(fr)
    pipe.flush()
    wall = time.perf_counter() - t0
    est = pipe.trajectory.positions_array()
    gt = np.stack([sims[0].gt_pose_at(t)[1] for t in pipe.trajectory.times])
    out = {
        "scenario": name,
        "frames": n,
        "fps": round(n / wall, 2),
        "ate_aligned": round(ate_rmse(est, gt), 4),
        "ate_raw": round(ate_rmse(est, gt, align=False), 4),
        "accepted": int(sum(pipe.trajectory.accepted)),
        "loop_closed": bool(pipe.loop_closer and pipe.loop_closer.closed),
    }
    # loop-closure PAYOFF: raw keyframe-pose ATE before/after the
    # pose-graph solve + revisit-cloud NN consistency (the reference's
    # optimized-path / corrected-map outputs, laser_mapping.hpp:845-871,
    # :1091-1100 — scored against ground truth here)
    from .loop_payoff import score_loop_payoff

    out.update(score_loop_payoff(pipe.loop_closer, pipe.trajectory.times,
                                 sims[0].gt_pose_at))
    return out


if __name__ == "__main__":
    import sys

    # `--set NS/KEY=VALUE` overrides (repeatable) apply to every listed
    # scenario — the A/B hook for solver-divergence studies
    args = sys.argv[1:]
    overrides: Dict = {}
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--set":
            path, val = args[i + 1].split("=", 1)
            ns, key = path.replace(".", "/").split("/", 1)
            try:
                v: object = int(val)
            except ValueError:
                try:
                    v = float(val)
                except ValueError:
                    v = val
            overrides.setdefault(ns, {})[key] = v
            i += 2
        else:
            names.append(args[i])
            i += 1
    for nm in names or list(SCENARIOS):
        print(json.dumps(run_scenario(nm, overrides=overrides or None)),
              flush=True)
