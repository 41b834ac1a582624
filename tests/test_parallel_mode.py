"""Multi-chip PRODUCT mode: `parallel/mesh_devices > 1` runs the real
pipeline (OdometryPipeline / the CLI) sharded over the device mesh with
the product layout (`parallel.layout`).  Validated on the virtual
8-device CPU mesh (SURVEY.md §4's prescribed pjit test pattern).

The contract — "the mesh changes the schedule, not the math" — has two
legs, calibrated by the round-4 forensics (docs/multichip.md):

1. **Deterministic leg (bitwise).**  Where the solver is out of its
   chaotic regime (the standstill ramp: zero-increment registrations),
   the sharded run must be BIT-IDENTICAL to the 1-device run.  This
   holds because the solver's reductions, kNN distances, and residual
   chains are layout-hardened (shard_invariant_sum, _sq3/_dot3
   barriers, replicated solver pinning).

2. **Chaos-envelope leg.**  Once real motion starts, the
   iteration-capped ICP is a chaotic amplifier: XLA:CPU emits
   different FMA contractions for the partitioned and whole-array
   programs (~1-ulp residual noise, below source-level control —
   verified against barriers, fixed-block einsums, pairwise-tree
   reductions, and replication pinning at every solver boundary), and
   near-tie correspondence flips amplify ulps to visible trajectory
   differences within ONE solve.  The honest contract is therefore
   *the mesh must not add error beyond the solver's own input
   sensitivity*: the sharded-vs-1-device gap is bounded by the
   measured 1-ulp-input-perturbation envelope of the 1-device run
   itself, and the two runs must be equally accurate against ground
   truth.  (The reference's own `maximum_parallel_thread` racing is
   nondeterministic in exactly this way — laser_mapping.hpp:1737-1742
   commits whichever worker wins the timestamp race.)
"""
import json

import numpy as np
import pytest

from loam_livox_tpu.core.config import SlamConfig

# the scenario CI's proven CPU-scale knobs (eval/scenarios.py SMALL_CAPS)
from loam_livox_tpu.eval.scenarios import SMALL_CAPS

# full-pipeline tier: excluded from the fast CI tier (-m 'not slow')
pytestmark = pytest.mark.slow

RAMP_FRAMES = 8  # standstill prefix: ramp_t0 = 0.8 s at 10 Hz


@pytest.fixture(scope="module", autouse=True)
def _no_persistent_cache():
    """The equivalence comparisons require BOTH compared programs to be
    compiled by THIS machine: a persistent-cache entry produced on a
    different driver VM (different CPUID features → different codegen)
    mixes code provenance between the 1-device and sharded programs and
    confounds the bit/envelope legs (round-4 postmortem: cpu_aot_loader
    feature-mismatch loads during this very suite)."""
    import jax

    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


def small_cfg(mesh_devices=1):
    return SlamConfig().replace(
        capacity=SMALL_CAPS,
        mapping={"init_accumulate_frames": 6},
        optimization={"icp_maximum_iteration": 5, "full_iterations": 3},
        # deterministic=1: the 1-device REFERENCE runs must use the
        # same layout-hardened numerics the mesh mode uses (AUTO would
        # leave them on the fused fast path — different f32 roundings)
        parallel={"mesh_devices": mesh_devices, "deterministic": 1},
    )


def run_pipeline(cfg, n_frames=20, seed=3, perturb=False):
    """Run the product pipeline on a simulated stream.  With
    ``perturb``, one coordinate of one point of the first post-ramp
    frame is moved by ONE FLOAT32 ULP — the yardstick run measuring the
    solver's intrinsic input sensitivity."""
    from loam_livox_tpu.io.simulator import (
        LivoxSimulator,
        SimConfig,
        Trajectory,
    )
    from loam_livox_tpu.runtime.pipeline import OdometryPipeline

    # standstill ramp covering the init-accumulation window, like the
    # scenario runner (eval/scenarios.py)
    ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
    sim = LivoxSimulator(SimConfig(points_per_frame=3072, seed=seed),
                         traj=Trajectory(ramp_t0=ramp))
    pipe = OdometryPipeline(cfg)
    for i in range(n_frames):
        xyz, inten, t0 = sim.frame(i)
        if perturb and i >= RAMP_FRAMES:
            # nudge every coordinate of every post-ramp frame by one
            # f32 ulp — the smallest representable SUSTAINED input
            # change, matching how layout noise enters (every frame),
            # not a one-shot kick that can decay
            xyz = np.nextafter(np.asarray(xyz, np.float32),
                               np.float32(np.inf))
        pipe.process_raw(xyz, inten, t0)
    pipe.flush()
    gt = np.stack([sim.gt_pose_at(t)[1] for t in pipe.trajectory.times])
    return pipe, gt


class TestProductMode:
    # seeds chosen to produce MOVING accepted trajectories at the
    # CPU-scale budget (seeds whose streams reject everything would
    # make the equivalence vacuous — probed in round 4)
    @pytest.mark.parametrize("seed", [3, 1, 6])
    def test_sharded_pipeline_matches_single_device(self, eight_devices,
                                                    seed):
        from loam_livox_tpu.eval.ate import ate_rmse

        n_frames = 16
        p1, gt = run_pipeline(small_cfg(1), n_frames, seed=seed)
        p8, _ = run_pipeline(small_cfg(8), n_frames, seed=seed)
        # yardstick A (input sensitivity): every post-ramp frame nudged
        # by one f32 ulp
        pp, _ = run_pipeline(small_cfg(1), n_frames, seed=seed,
                             perturb=True)
        # yardstick B (rounding sensitivity): the same 1-device run
        # under the plain (fused/FMA) numerics instead of the hardened
        # ones — exactly the class of legitimate f32 re-rounding the
        # partitioned compilation introduces
        pn, _ = run_pipeline(
            small_cfg(1).replace(parallel={"deterministic": 0}),
            n_frames, seed=seed)
        t1 = p1.trajectory.positions_array()
        t8 = p8.trajectory.positions_array()
        tp = pp.trajectory.positions_array()
        tn = pn.trajectory.positions_array()
        assert t1.shape == t8.shape == tp.shape == tn.shape

        # ---- leg 1: before registration enables (the accumulation
        # window) the trajectory is pinned at the origin in BOTH runs;
        # the full bitwise determinism check on this regime is
        # test_map_build_is_bitwise below (registration-enabled
        # standstill frames already run chaotic solves: sensor noise
        # makes their increments nonzero, so they belong to leg 2)
        n_acc = small_cfg().mapping.init_accumulate_frames
        np.testing.assert_array_equal(t8[:n_acc], 0.0)
        np.testing.assert_array_equal(t1[:n_acc], 0.0)

        # ---- leg 2: chaos envelope — the mesh must not add error
        # beyond the solver's own measured sensitivity to ulp-level
        # input noise / legitimate f32 re-rounding
        gap8 = float(np.linalg.norm(t8 - t1, axis=1).max())
        gapP = float(np.linalg.norm(tp - t1, axis=1).max())
        gapN = float(np.linalg.norm(tn - t1, axis=1).max())
        env = max(4.0 * max(gapP, gapN), 5e-3)
        assert gap8 <= env, (
            f"sharded gap {gap8:.4f} m exceeds the chaos envelope "
            f"(1-ulp input sensitivity {gapP:.4f} m, re-rounding "
            f"sensitivity {gapN:.4f} m)")

        # equally accurate against ground truth: the mesh run's ATE must
        # stay within the chaos spread of the 1-device run's ATE
        a1 = ate_rmse(t1, gt)
        a8 = ate_rmse(t8, gt)
        spread = max(2.0 * max(abs(ate_rmse(tp, gt) - a1),
                               abs(ate_rmse(tn, gt) - a1)), 0.05)
        assert abs(a8 - a1) <= spread, (
            f"ATE diverged: 1-dev {a1:.4f}, sharded {a8:.4f}, "
            f"chaos spread {spread:.4f}")

        # accept counts equivalent within the chaos envelope
        acc1 = int(np.asarray(p1.trajectory.accepted).sum())
        acc8 = int(np.asarray(p8.trajectory.accepted).sum())
        accP = int(np.asarray(pp.trajectory.accepted).sum())
        accN = int(np.asarray(pn.trajectory.accepted).sum())
        assert abs(acc8 - acc1) <= max(
            2 * max(abs(accP - acc1), abs(accN - acc1)), 3)

        # the pose actually moved and a meaningful share of frames
        # registered (CPU-scale point budgets reject liberally)
        assert np.linalg.norm(t1[-1] - t1[0]) > 0.02
        assert acc1 >= 5

    def test_map_build_is_bitwise(self, eight_devices):
        """The contractive regime IS bit-identical across layouts:
        during the init-accumulation window (front end → voxel filters
        → map/matching-buffer build; no chaotic solver in the loop)
        every state leaf of the sharded run equals the 1-device run
        exactly.  This is the regression guard on the layout-hardening
        (shard_invariant_sum, _sq3/_dot3, exact kNN, replication
        pinning) — any new layout-sensitive float path breaks it."""
        import jax

        n = small_cfg().mapping.init_accumulate_frames
        p1, _ = run_pipeline(small_cfg(1), n_frames=n)
        p8, _ = run_pipeline(small_cfg(8), n_frames=n)
        s1 = jax.device_get(p1.state)
        s8 = jax.device_get(p8.state)
        for f in s1._fields:
            l1 = jax.tree_util.tree_leaves(getattr(s1, f))
            l8 = jax.tree_util.tree_leaves(getattr(s8, f))
            for j, (x, y) in enumerate(zip(l1, l8)):
                np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y),
                    err_msg=f"state leaf {f}[{j}] not bit-identical")

    def test_state_is_distributed(self, eight_devices):
        p8, _ = run_pipeline(small_cfg(8), n_frames=4)
        surf = p8.state.map_surface.xyz
        assert len(surf.sharding.device_set) == 8, (
            "matching buffer must be sharded over all 8 devices")
        hist = p8.state.hist_surf_xyz
        assert len(hist.sharding.device_set) == 8
        # replicated scalars live on the mesh too
        assert len(p8.state.q_w.sharding.device_set) == 8

    def test_cli_mesh_flag(self, eight_devices, tmp_path, capsys):
        from loam_livox_tpu.cli.run_odometry import main

        argv = ["--frames", "5", "--mesh", "8", "--quiet",
                "--set", "mapping/init_accumulate_frames=2",
                "--set", "optimization/icp_maximum_iteration=3"]
        for k, v in SMALL_CAPS.items():
            argv += ["--set", f"capacity/{k}={v}"]
        assert main(argv) == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        summary = json.loads(out)
        assert summary["mesh_devices"] == 8
        assert summary["frames"] == 5
