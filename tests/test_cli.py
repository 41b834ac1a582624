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
