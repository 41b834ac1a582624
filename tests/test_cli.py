"""CLI argument → config plumbing (cli.run_odometry)."""
import pytest

from loam_livox_tpu.cli.run_odometry import build_config, parse_args


def test_profiles_and_flags():
    cfg = build_config(parse_args(["--profile", "realtime"]))
    assert cfg.common.maximum_parallel_thread == 3
    cfg = build_config(parse_args(["--loop-closure"]))
    assert cfg.loop_closure.if_enable_loop_closure == 1
    cfg = build_config(parse_args(["--piecewise", "2"]))
    assert cfg.common.piecewise_number == 2


def test_set_overrides():
    cfg = build_config(parse_args([
        "--set", "loop_closure/minimum_keyframe_differen=20",
        "--set", "optimization.knn_precision=highest",
        "--set", "mapping/maximum_pointcloud_delay_time=1.0",
    ]))
    assert cfg.loop_closure.minimum_keyframe_differen == 20
    assert cfg.optimization.knn_precision == "highest"
    assert cfg.mapping.maximum_pointcloud_delay_time == 1.0


def test_set_rejects_unknown_and_malformed():
    with pytest.raises(AttributeError):
        build_config(parse_args(["--set", "nope/foo=1"]))
    with pytest.raises(SystemExit):
        build_config(parse_args(["--set", "garbage"]))


def test_pcd_source_stream(tmp_path):
    """`--source pcd:<dir>` streams decoded frames in filename order
    through the native prefetch queue."""
    import numpy as np

    from loam_livox_tpu.io.serialization import save_pcd

    rng = np.random.default_rng(0)
    frames = []
    for i in range(3):
        xyz = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
        frames.append(xyz)
        save_pcd(str(tmp_path / f"frame_{i:04d}.pcd"), xyz)

    args = parse_args(["--source", f"pcd:{tmp_path}", "--frames", "3"])
    from loam_livox_tpu.cli.run_odometry import build_config, frame_stream
    got = list(frame_stream(args, build_config(args)))
    assert len(got) == 3
    for (gx, gi, gt), xyz in zip(got, frames):
        np.testing.assert_allclose(gx, xyz, atol=1e-5)
        assert gi.shape == (100,)


def test_pcd_source_empty_dir_errors(tmp_path):
    args = parse_args(["--source", f"pcd:{tmp_path}"])
    from loam_livox_tpu.cli.run_odometry import build_config, frame_stream
    with pytest.raises(SystemExit):
        list(frame_stream(args, build_config(args)))


def test_follow_streams_pose_lines(tmp_path, capsys):
    """--follow emits one JSON line per observed frame before the
    final summary line."""
    import json

    from loam_livox_tpu.cli.run_odometry import main

    sets = []
    for kv in ["capacity/max_raw_points=2048", "capacity/max_corner=128",
               "capacity/max_surface=512", "capacity/max_corner_ds=128",
               "capacity/max_surface_ds=512",
               "capacity/map_corner_capacity=2048",
               "capacity/map_surf_capacity=8192",
               "capacity/hist_corner_capacity=128",
               "capacity/hist_surf_capacity=512",
               "capacity/history_window=4",
               "mapping/init_accumulate_frames=2",
               "optimization/icp_maximum_iteration=2",
               "optimization/full_iterations=2"]:
        sets += ["--set", kv]
    rc = main(["--frames", "3", "--quiet", "--follow"] + sets)
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    pose_lines = [l for l in lines if "frame" in l]
    summary = [l for l in lines if "frames" in l]
    # the default (precision) profile runs the SHIPPED piecewise-3
    # mode: one pose per piecewise registration, like the reference's
    # per-piece odometry publishes (laser_feature_extractor.hpp:305-389)
    assert len(pose_lines) == 3 * 3
    assert pose_lines[0]["frame"] == 0 and len(pose_lines[0]["t"]) == 3
    assert summary and summary[-1]["frames"] == 3
