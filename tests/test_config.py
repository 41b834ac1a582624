import dataclasses

import pytest

from loam_livox_tpu.core import config as cfg_mod
from loam_livox_tpu.core.config import (
    SlamConfig, from_dict, largescale_profile, precision_profile,
    realtime_profile,
)


def test_shipped_profiles_run_deblur_off_piecewise_3():
    """The shipped reference YAMLs set `common/if_motion_deblur: 0`
    (performance_precision.yaml:5, performance_realtime.yaml:5) and
    omit `common/piecewise_number` whose node default is 3
    (laser_feature_extractor.hpp:141-142): the faithful shipped modes
    run 3 piecewise registrations per frame, deblur OFF."""
    for c in (precision_profile(), realtime_profile(), largescale_profile()):
        assert c.common.if_motion_deblur == 0
        assert c.common.piecewise_number == 3
    d = cfg_mod.deblur_precision_profile()
    assert d.common.if_motion_deblur == 1


def test_profiles_equal_shipped_yaml_files():
    """`precision_profile()`/`realtime_profile()` must equal loading
    the repo's reference-schema YAMLs — one source of truth."""
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    assert cfg_mod.load_yaml(
        os.path.join(root, "performance_precision.yaml")) == precision_profile()
    assert cfg_mod.load_yaml(
        os.path.join(root, "performance_realtime.yaml")) == realtime_profile()


def test_yaml_type_coercion():
    """YAML 1.1 parses `7e-4` (dotless exponent) as a string; the
    loader must coerce to the declared field types."""
    c = from_dict({"feature_extraction": {"livox_min_sigma": "7e-4",
                                          "scan_line": "64"},
                   "mapping": {"max_allow_incre_T": 1}})
    assert c.feature_extraction.livox_min_sigma == 7e-4
    assert c.feature_extraction.scan_line == 64
    assert c.mapping.max_allow_incre_T == 1.0
    assert isinstance(c.mapping.max_allow_incre_T, float)


def test_precision_defaults_match_reference_yaml():
    c = precision_profile()
    assert c.common.maximum_parallel_thread == 1
    assert c.common.threshold_cell_revisit == 2000
    assert c.feature_extraction.mapping_line_resolution == 0.1
    assert c.feature_extraction.mapping_plane_resolution == 0.4
    assert c.optimization.maximum_residual_blocks == 200
    assert c.optimization.icp_maximum_iteration == 15
    assert c.mapping.maximum_histroy_buffer == 400
    assert c.mapping.maximum_pointcloud_delay_time == 0.1
    assert c.loop_closure.minimum_similarity_planar == 0.94
    assert c.loop_closure.scene_alignment_maximum_residual_block == 3000


def test_realtime_profile_diffs():
    p, r = precision_profile(), realtime_profile()
    assert r.common.maximum_parallel_thread == 3
    assert r.common.if_update_mean_and_cov_incrementally == 0
    assert r.common.threshold_cell_revisit == 100000
    assert r.feature_extraction.mapping_line_resolution == 0.2
    assert r.optimization.maximum_residual_blocks == 150
    assert r.mapping.maximum_histroy_buffer == 200
    assert r.mapping.maximum_pointcloud_delay_time == 1.0
    assert r.mapping.maximum_mapping_buffer == 50
    # untouched sections stay at precision values
    assert r.loop_closure == p.loop_closure


def test_largescale_profile():
    c = largescale_profile()
    assert c.feature_extraction.mapping_line_resolution == 0.05
    assert c.feature_extraction.mapping_plane_resolution == 1.2


def test_from_dict_merging():
    c = from_dict({"optimization": {"icp_maximum_iteration": 7}})
    assert c.optimization.icp_maximum_iteration == 7
    assert c.optimization.maximum_residual_blocks == 200


def test_from_dict_unknown_section_raises():
    with pytest.raises(KeyError):
        from_dict({"nonsense": {}})


def test_replace_nested():
    c = SlamConfig().replace(mapping={"matching_mode": 1})
    assert c.mapping.matching_mode == 1
    assert c.mapping.init_accumulate_frames == 50


def test_yaml_roundtrip(tmp_path):
    import yaml

    d = {"feature_extraction": {"corner_curvature": 0.2},
         "loop_closure": {"if_enable_loop_closure": 1}}
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(d))
    c = cfg_mod.load_yaml(str(p))
    assert c.feature_extraction.corner_curvature == 0.2
    assert c.loop_closure.if_enable_loop_closure == 1


def test_config_is_hashable_for_jit_static_args():
    # configs are used as static args to jitted programs
    assert hash(precision_profile()) != 0
    d = {precision_profile(): 1, realtime_profile(): 2}
    assert len(d) == 2


def test_every_knob_is_read_outside_config():
    """Knob-audit regression (VERDICT r2 item 8): every config field
    must have a reader outside core/config.py — a knob nothing reads is
    either dead (delete it) or an unimplemented behavior (wire it)."""
    import dataclasses
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..", "loam_livox_tpu")
    sources = []
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if fn.endswith(".py") and fn != "config.py":
                with open(os.path.join(dirpath, fn)) as f:
                    sources.append(f.read())
    for extra in ("bench.py", "__graft_entry__.py"):
        with open(os.path.join(root, "..", extra)) as f:
            sources.append(f.read())
    blob = "\n".join(sources)

    dead = []
    for section, cls in cfg_mod._SECTION_TYPES.items():
        for field in dataclasses.fields(cls):
            if not re.search(rf"\.{field.name}\b", blob):
                dead.append(f"{section}/{field.name}")
    assert not dead, f"config fields with no reader: {dead}"
