"""eval/scaling.py harness — runs on the virtual CPU mesh.

Validates the measurement plumbing (plain baseline, per-mesh-size
timings, overhead and efficiency ratios), not absolute numbers.
"""
import math

from loam_livox_tpu.eval.scaling import measure_scaling


def test_measure_scaling_smoke(eight_devices):
    out = measure_scaling(mesh_sizes=[1, 2], n_query=256, n_ref=4096,
                          k=3, reps=2)
    assert out["plain_time_s"] > 0
    assert set(out["times_s"]) == {"1", "2"}
    for t in out["times_s"].values():
        assert math.isfinite(t) and t > 0
    # shard_map @ 1 device vs the plain jitted program: finite, positive
    # ratio (the TPU-measured bound is recorded in RESULTS.md)
    assert out["sharded_overhead_x"] > 0
    assert out["efficiency"]["1"] == 1.0


def test_measure_pipeline_scaling_smoke(eight_devices):
    import pytest

    pytest.importorskip("jax")
    from loam_livox_tpu.eval.scaling import measure_pipeline_scaling

    out = measure_pipeline_scaling(
        mesh_sizes=[0, 1], frames=3, warmup=2, points_per_frame=1024,
        caps={"max_raw_points": 2048, "max_corner": 128,
              "max_surface": 512, "max_corner_ds": 128,
              "max_surface_ds": 512, "map_corner_capacity": 2048,
              "map_surf_capacity": 8192, "hist_corner_capacity": 128,
              "hist_surf_capacity": 512, "history_window": 8})
    assert out["fps"]["0"] > 0 and out["fps"]["1"] > 0
    assert out["sharded_overhead_x"] > 0
