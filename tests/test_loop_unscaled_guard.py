"""Regression guard for the UNSCALED loop-closure proof (VERDICT r3
item 6): replay the shipped-gate decision chain against the committed
keyframe artifact of the real 2600-frame run
(``scripts/loop_unscaled_state.npz``, produced by
``scripts/loop_unscaled.py`` — shipped cadence 300/100, revisit 2000,
gates verbatim, reference ``performance_precision.yaml:43-56`` +
``launch/rosbag_loop_simple.launch:10-11``).

The replay feeds the recorded keyframes (descriptors + era snapshots)
one at a time through a FRESH `LoopCloser`'s gate scan — ratio, ROI,
similarity, cell balance, scene-alignment ICP — so any refactor of
`runtime/loop_service.py` gate order/values or `loop/scene_alignment.py`
that would stop the shipped-configuration closure fails HERE, in
minutes, instead of silently invalidating the hour-long artifact
(reference gate chain: ``laser_mapping.hpp:994-1116``).
"""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
STATE = os.path.join(SCRIPTS, "loop_unscaled_state.npz")
OUT = os.path.join(SCRIPTS, "loop_unscaled_out.json")


def _load_run_cfg():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "loop_unscaled", os.path.join(SCRIPTS, "loop_unscaled.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.make_cfg()


@pytest.fixture(scope="module")
def artifact():
    if not (os.path.exists(STATE) and os.path.exists(OUT)):
        pytest.skip("unscaled loop artifact not present "
                    "(run scripts/loop_unscaled.py)")
    with open(OUT) as f:
        out = json.load(f)
    if not out.get("loop_closed"):
        pytest.skip("artifact run did not close its loop")
    return out


def test_replay_closes_at_recorded_keyframes(artifact):
    from loam_livox_tpu.map.cell_map import empty_cell_map
    from loam_livox_tpu.runtime.checkpoint import load_loop_state
    from loam_livox_tpu.runtime.loop_service import LoopCloser

    cfg = _load_run_cfg()
    saved = load_loop_state(STATE, cfg)
    assert saved.closed and saved.result is not None
    rec_his = int(artifact["loop"]["his"])
    rec_cur = int(artifact["loop"]["cur"])
    assert saved.result.his_idx == rec_his
    assert saved.result.cur_idx == rec_cur

    # the alignment capacity the live run used (LoopCloser._verify_icp
    # keys its jit shape off the full cell map)
    m = empty_cell_map(cfg.mapping.cell_resolution * 0.5,
                       cfg.capacity.cell_capacity,
                       cfg.capacity.cell_point_capacity)

    replay = LoopCloser(cfg)
    closed_at = None
    for i, rec in enumerate(saved.keyframes):
        replay.keyframes.append(rec)
        if not replay.closed:
            replay._scan_for_loop(m)
        if replay.closed and closed_at is None:
            closed_at = i
    assert replay.closed, "replayed gates no longer close the loop"
    # the SAME pair must close: earlier closure = a gate got looser,
    # later = tighter; both are behavior changes the artifact proved out
    assert closed_at == rec_cur, (
        f"closure moved: keyframe {closed_at} vs recorded {rec_cur}")
    assert replay.result.his_idx == rec_his
    assert replay.result.cur_idx == rec_cur
    # scene-alignment score is the decisive accept scalar — hold it to
    # the recorded value (loose tolerance: the replay recomputes the
    # ICP on this host's backend)
    assert abs(replay.result.icp_score
               - float(artifact["loop"]["icp_score"])) < 0.05
    # and the accept gate itself, verbatim
    assert replay.result.icp_score < cfg.loop_closure.map_alignment_inlier_threshold


def test_replay_gate_trace_matches_recorded(artifact):
    """The per-candidate gate decisions (stage names in reference
    order) must reproduce the recorded trace — not just the final
    closure (guards reorderings that happen to still close)."""
    trace_path = os.path.join(SCRIPTS, "loop_unscaled_trace.json")
    if not os.path.exists(trace_path):
        pytest.skip("gate trace artifact not present")
    with open(trace_path) as f:
        recorded = json.load(f)

    from loam_livox_tpu.map.cell_map import empty_cell_map
    from loam_livox_tpu.runtime.checkpoint import load_loop_state
    from loam_livox_tpu.runtime.loop_service import LoopCloser

    cfg = _load_run_cfg()
    saved = load_loop_state(STATE, cfg)
    m = empty_cell_map(cfg.mapping.cell_resolution * 0.5,
                       cfg.capacity.cell_capacity,
                       cfg.capacity.cell_point_capacity)
    replay = LoopCloser(cfg)
    for rec in saved.keyframes:
        replay.keyframes.append(rec)
        if not replay.closed:
            replay._scan_for_loop(m)

    assert len(replay.gate_trace) == len(recorded)
    for got, want in zip(replay.gate_trace, recorded):
        assert got["stage"] == want["stage"]
        assert got["cur"] == want["cur"] and got["his"] == want["his"]
        # numeric gate values: descriptor-derived scalars are exact
        # replays; similarity/ICP recompute on this backend
        for k in ("sim_plane", "sim_line", "score"):
            if k in want:
                assert abs(float(got[k]) - float(want[k])) < 0.02, (k, got, want)


def test_replay_loop_payoff_reduces_drift(artifact):
    """The loop's PAYOFF, not just its firing: the replayed pose-graph
    solve must reduce the keyframe poses' RAW (unaligned) ATE against
    the recorded ground truth (reference output: the optimized path it
    republishes, laser_mapping.hpp:845-871)."""
    if "kf_gt_positions" not in artifact:
        pytest.skip("artifact predates payoff scoring "
                    "(re-run scripts/loop_unscaled.py)")

    from loam_livox_tpu.eval.ate import ate_rmse
    from loam_livox_tpu.map.cell_map import empty_cell_map
    from loam_livox_tpu.runtime.checkpoint import load_loop_state
    from loam_livox_tpu.runtime.loop_service import LoopCloser

    cfg = _load_run_cfg()
    saved = load_loop_state(STATE, cfg)
    m = empty_cell_map(cfg.mapping.cell_resolution * 0.5,
                       cfg.capacity.cell_capacity,
                       cfg.capacity.cell_point_capacity)
    replay = LoopCloser(cfg)
    for rec in saved.keyframes:
        replay.keyframes.append(rec)
        if not replay.closed:
            replay._scan_for_loop(m)
    assert replay.closed

    from loam_livox_tpu.eval.loop_payoff import payoff_verdict

    gt = np.asarray(artifact["kf_gt_positions"], np.float64)
    kt = np.stack([k.t for k in saved.keyframes])
    n = min(len(gt), len(kt))
    before = ate_rmse(kt[:n], gt[:n], align=False)
    after = ate_rmse(np.asarray(replay.result.t_opt)[:n], gt[:n],
                     align=False)
    # regime-aware verdict on the REPLAYED solve (drift regime: strict
    # reduction; floor regime: bounded change — the capture's drift is
    # at the alignment measurement floor, see eval/loop_payoff.py)
    replay_payoff = dict(artifact.get("payoff", {}))
    replay_payoff["ate_kf_raw_before_loop"] = before
    replay_payoff["ate_kf_raw_after_loop"] = after
    v = payoff_verdict(replay_payoff)
    assert v["ok"], (v, before, after)
    # and the recorded live-run payoff held its own verdict
    if "payoff" in artifact:
        rec = payoff_verdict(artifact["payoff"])
        assert rec["ok"], (rec, artifact["payoff"])
        if "payoff_verdict" in artifact:
            assert artifact["payoff_verdict"]["ok"]
