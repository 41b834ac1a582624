"""Velodyne LOAM extraction tests: ring assignment, sweep time,
edge/plane selection on a synthetic mechanical-lidar scan."""
import jax.numpy as jnp
import numpy as np
import pytest

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.frontend.velodyne import extract_velodyne_features

CFG = SlamConfig().replace(feature_extraction={"scan_line": 16})
FE = CFG.feature_extraction
CAPS = CFG.capacity


def synthetic_vlp16_scan(n_az=720, room=8.0, pillar=True):
    """A VLP-16 sweep inside a square room with an optional pillar:
    16 rings × n_az azimuths, row-major per ring."""
    rings = np.deg2rad(np.linspace(-15, 15, 16))
    az = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
    pts = []
    for rv in rings:
        for a in az:
            d = np.array([np.cos(a) * np.cos(rv), np.sin(a) * np.cos(rv),
                          np.sin(rv)])
            # distance to square-room wall in xy
            tx = room / max(abs(d[0]), 1e-9)
            ty = room / max(abs(d[1]), 1e-9)
            r = min(tx, ty)
            if pillar and abs(a - 0.5) < 0.12:
                r = min(r, 3.0 / np.cos(a - 0.5))
            pts.append(d * r)
    return np.asarray(pts, np.float32)


@pytest.fixture(scope="module")
def frame():
    pts = synthetic_vlp16_scan()
    n = len(pts)
    cap = 16384
    xyz = np.zeros((cap, 3), np.float32)
    mask = np.zeros((cap,), bool)
    xyz[:n] = pts
    mask[:n] = True
    return extract_velodyne_features(
        jnp.asarray(xyz), jnp.asarray(mask), jnp.float32(1.5), FE, CAPS)


class TestVelodyne:
    def test_produces_features(self, frame):
        assert int(frame.full.count()) > 10000
        assert int(frame.corners.count()) > 10
        assert int(frame.surface.count()) > 100

    def test_corners_on_edges(self, frame):
        """Sharp points should lie near the room corners / pillar edges
        (|x|≈|y| diagonal walls meet), not mid-wall."""
        c = np.asarray(frame.corners.xyz)[np.asarray(frame.corners.mask)]
        r = np.abs(c[:, :2])
        # near a corner the two horizontal coordinates are comparable
        frac_cornerish = np.mean(np.abs(r[:, 0] - r[:, 1]) < 2.5)
        assert frac_cornerish > 0.5

    def test_time_channel_spans_sweep(self, frame):
        t = np.asarray(frame.full.time)[np.asarray(frame.full.mask)]
        assert t.min() >= 1.5 - 1e-6
        assert t.max() <= 1.5 + 0.1 + 1e-6
        assert t.max() - t.min() > 0.05

    def test_surface_flatness(self, frame):
        """Surface points should be dominated by mid-wall (low
        curvature) points: none of them may coincide with a selected
        corner."""
        s = np.asarray(frame.surface.xyz)[np.asarray(frame.surface.mask)]
        c = np.asarray(frame.corners.xyz)[np.asarray(frame.corners.mask)]
        if len(c):
            from scipy.spatial import cKDTree
            d, _ = cKDTree(c).query(s, k=1)
            assert np.mean(d < 0.05) < 0.2

    def test_close_points_removed(self):
        pts = np.zeros((64, 3), np.float32)
        pts[:, 0] = 0.05  # all inside minimum_range (reference def. 0.1)
        out = extract_velodyne_features(
            jnp.asarray(pts), jnp.ones(64, bool), jnp.float32(0.0), FE, CAPS)
        assert int(out.full.count()) == 0
