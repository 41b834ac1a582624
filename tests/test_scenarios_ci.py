"""Golden-ATE regression tests over the five BASELINE scenarios
(CPU-scale variants, `scenario_config(..., small=True)`) — the CI
encoding of the reference's rosbag-replay validation matrix
(SURVEY.md §4; VERDICT round-1 item 5: an accuracy regression anywhere
in frontend/registration/runtime must fail the suite, not ship
silently).

Bounds are ~2× the measured CPU golden so numeric jitter passes while
real drift regressions fail.  Measured values are recorded next to
each bound.
"""
import pytest

from loam_livox_tpu.eval.scenarios import run_scenario

# full-pipeline tier: excluded from the fast CI tier (-m 'not slow')
pytestmark = pytest.mark.slow

# scenario → (ate_aligned bound, min accepted frames)
GOLDENS = {
    "odometry_only": (0.35, 12),        # measured 0.167 aligned
    "full_mapping": (0.40, 6),          # measured 0.194
    "largescale_realtime": (1.30, 12),  # measured 0.583/13 accepted
    "loop_closure": (0.45, 20),         # measured 0.195
    "mid100_trilidar": (0.75, 10),     # measured 0.361
}


@pytest.mark.parametrize("name", list(GOLDENS))
def test_scenario_golden_ate(name):
    bound, min_accepted = GOLDENS[name]
    res = run_scenario(name, small=True)
    assert res["ate_aligned"] < bound, res
    assert res["accepted"] >= min_accepted, res
