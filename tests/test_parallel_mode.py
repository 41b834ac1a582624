"""Multi-chip PRODUCT mode: `parallel/mesh_devices > 1` runs the real
pipeline (OdometryPipeline / the CLI) sharded over the device mesh with
the product layout (`parallel.layout`).  Validated on the virtual
8-device CPU mesh (SURVEY.md §4's prescribed pjit test pattern).

The contract: the sharded run computes the SAME trajectory as the
1-device run (the mesh changes the schedule, not the math), and the
state is genuinely distributed (every device holds a shard)."""
import json

import numpy as np
import pytest

from loam_livox_tpu.core.config import SlamConfig

# the scenario CI's proven CPU-scale knobs (eval/scenarios.py SMALL_CAPS)
from loam_livox_tpu.eval.scenarios import SMALL_CAPS

# full-pipeline tier: excluded from the fast CI tier (-m 'not slow')
pytestmark = pytest.mark.slow


def small_cfg(mesh_devices=1):
    return SlamConfig().replace(
        capacity=SMALL_CAPS,
        mapping={"init_accumulate_frames": 6},
        optimization={"icp_maximum_iteration": 5, "full_iterations": 3},
        parallel={"mesh_devices": mesh_devices},
    )


def run_pipeline(cfg, n_frames=20):
    from loam_livox_tpu.io.simulator import (
        LivoxSimulator,
        SimConfig,
        Trajectory,
    )
    from loam_livox_tpu.runtime.pipeline import OdometryPipeline

    # standstill ramp covering the init-accumulation window, like the
    # scenario runner (eval/scenarios.py)
    ramp = 0.1 * cfg.mapping.init_accumulate_frames + 0.2
    sim = LivoxSimulator(SimConfig(points_per_frame=3072, seed=3),
                         traj=Trajectory(ramp_t0=ramp))
    pipe = OdometryPipeline(cfg)
    for i in range(n_frames):
        xyz, inten, t0 = sim.frame(i)
        pipe.process_raw(xyz, inten, t0)
    pipe.flush()
    return pipe


class TestProductMode:
    def test_sharded_pipeline_matches_single_device(self, eight_devices):
        p1 = run_pipeline(small_cfg(1))
        p8 = run_pipeline(small_cfg(8))
        t1 = p1.trajectory.positions_array()
        t8 = p8.trajectory.positions_array()
        assert t1.shape == t8.shape
        # Same trajectory: collectives change reduction grouping, so
        # exact bit-equality is not guaranteed — the tolerance here is
        # far below any scenario ATE bound.
        np.testing.assert_allclose(t8, t1, atol=5e-3)
        acc1 = np.asarray(p1.trajectory.accepted)
        acc8 = np.asarray(p8.trajectory.accepted)
        np.testing.assert_array_equal(acc1, acc8)
        # the pose actually moved and a meaningful share of frames
        # registered (CPU-scale point budgets reject liberally — the CI
        # goldens accept 13/24 on some scenarios; equivalence above is
        # the real contract here)
        assert np.linalg.norm(t1[-1] - t1[0]) > 0.02
        assert acc1.sum() >= 5

    def test_state_is_distributed(self, eight_devices):
        p8 = run_pipeline(small_cfg(8), n_frames=4)
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
