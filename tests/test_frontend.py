import jax.numpy as jnp
import numpy as np
import pytest

from loam_livox_tpu.core.config import CapacityConfig, FeatureExtractionConfig
from loam_livox_tpu.frontend import livox
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig

FE = FeatureExtractionConfig()
CAPS = CapacityConfig(max_raw_points=10000, max_splits=256,
                      max_corner=512, max_surface=4096)


def run_info(xyz, intensity=None, mask=None, t0=0.0, fe=FE, caps=CAPS):
    n = xyz.shape[0]
    if intensity is None:
        intensity = np.ones(n, np.float32)
    if mask is None:
        mask = np.ones(n, bool)
    return livox.extract_point_info(
        jnp.asarray(xyz, jnp.float32), jnp.asarray(intensity),
        jnp.asarray(mask), jnp.float32(t0), fe, caps)


class TestMasks:
    def test_nan_and_zero(self):
        xyz = np.ones((64, 3), np.float32)
        xyz[:, 1:] = np.linspace(0, 0.2, 64)[:, None]
        xyz[5] = np.nan
        xyz[10] = 0.0
        info, _ = run_info(xyz)
        pt = np.asarray(info.pt_type)
        assert pt[5] & livox.PT_NAN
        assert pt[10] & livox.PT_000
        assert not (pt[3] & (livox.PT_NAN | livox.PT_000))

    def test_zero_point_inherits_projection(self):
        xyz = np.ones((64, 3), np.float32)
        xyz[:, 1] = np.linspace(0.01, 0.3, 64)
        xyz[:, 2] = 0.05
        xyz[20] = 0.0
        info, _ = run_info(xyz)
        polar = np.asarray(info.polar_dis_sq2)
        np.testing.assert_allclose(polar[20], polar[19], rtol=1e-5)

    def test_too_near(self):
        xyz = np.ones((64, 3), np.float32) * 5
        xyz[7] = [0.05, 0.0, 0.0]
        info, _ = run_info(xyz)
        assert np.asarray(info.pt_type)[7] & livox.PT_TOO_NEAR

    def test_low_reflectivity(self):
        xyz = np.ones((64, 3), np.float32)
        xyz[:, 1] = 0.1
        xyz[:, 2] = 0.1
        inten = np.ones(64, np.float32)
        inten[3] = 1e-9
        info, _ = run_info(xyz, intensity=inten)
        pt = np.asarray(info.pt_type)
        assert pt[3] & livox.PT_REFLECTIVITY_LOW
        assert not (pt[4] & livox.PT_REFLECTIVITY_LOW)

    def test_circle_edge_dilation(self):
        xyz = np.ones((64, 3), np.float32)
        xyz[:, 1] = 0.05
        xyz[:, 2] = 0.05
        # point 30 outside the 17° circle: tan(17°) ≈ 0.3057
        xyz[30, 1] = 0.5
        info, _ = run_info(xyz)
        pt = np.asarray(info.pt_type)
        for j in [28, 29, 30, 31]:  # source −2, −1, 0, +1
            assert pt[j] & livox.PT_CIRCLE_EDGE, j
        assert not (pt[32] & livox.PT_CIRCLE_EDGE)
        assert not (pt[27] & livox.PT_CIRCLE_EDGE)

    def test_timestamps(self):
        xyz = np.ones((64, 3), np.float32)
        info, _ = run_info(xyz, t0=2.5)
        t = np.asarray(info.time)
        np.testing.assert_allclose(t[0], 2.5, atol=1e-6)
        np.testing.assert_allclose(t[10] - t[0], 10 * FE.time_internal_pts,
                                   atol=5e-7)  # f32 time arithmetic


def make_petal_cloud(n_petals=6, pts_per_petal=200):
    """Synthetic rosette: polar distance rises 0→max→0 per petal."""
    n = n_petals * pts_per_petal
    s = np.arange(n)
    r = 0.25 * np.abs(np.sin(np.pi * s / pts_per_petal))
    phi = 2 * np.pi * s / n * 3.0
    u, v = r * np.cos(phi), r * np.sin(phi)
    depth = 5.0
    xyz = np.stack([np.full(n, depth), depth * u, depth * v], axis=-1)
    return xyz.astype(np.float32)


class TestPetalSplit:
    def test_petal_count(self):
        xyz = make_petal_cloud(6, 200)
        info, n_petals = run_info(xyz)
        # 6 maxima + 5 interior minima + terminator → 12 splits → 11 petals
        assert 10 <= int(n_petals) <= 12

    def test_too_few_petals_rejected(self):
        xyz = make_petal_cloud(1, 400)
        info, n_petals = run_info(xyz)
        assert int(n_petals) == 0

    def test_scan_angle_constant_within_petal(self):
        xyz = make_petal_cloud(8, 300)
        info, n_petals = run_info(xyz)
        assert int(n_petals) > 0
        ang = np.asarray(info.scan_angle)
        # mid-petal runs share one angle value
        assert np.std(ang[350:420]) < 1e-4
        assert ang[350] != ang[650]  # different petals differ

    def test_debounce_50_samples(self):
        # jittery polar distance flips direction every ~10 samples: the
        # debounce must not split every flip.
        n = 2000
        s = np.arange(n)
        r = 0.15 + 0.01 * np.sin(2 * np.pi * s / 20)
        xyz = np.stack([np.full(n, 5.0), 5 * r, np.zeros(n)], axis=-1)
        info, n_petals = run_info(xyz.astype(np.float32))
        # flips every 10 samples = 200 candidates, but acceptance requires
        # a >50 gap → at most ~40 splits
        assert int(n_petals) < 45


class TestLabels:
    def test_flat_wall_is_surface(self):
        # wall at x=5, scan across y — smooth, high view angle
        n = 256
        y = np.linspace(-1, 1, n)
        xyz = np.stack([np.full(n, 5.0), y, np.zeros(n)], axis=-1).astype(np.float32)
        info, _ = run_info(xyz)
        lbl = np.asarray(info.label)
        inner = lbl[10:-10]
        assert (inner & livox.LABEL_SURFACE).astype(bool).mean() > 0.9

    def test_corner_at_occlusion_edge(self):
        # loam_livox corners are occlusion edges: the scan crosses from a
        # background wall (8 m) onto a foreground object (5 m).  The first
        # foreground point is a local depth minimum, depth is continuous
        # on the foreground side (passes the one-sided 10% gate) and the
        # jump to background produces large curvature
        # (reference: livox_feature_extractor.hpp:443-452).
        # Note the regime: a huge jump (meters) makes the ±2 chord nearly
        # parallel to the ray and the view-angle gate rejects it; the
        # labeled corners are moderate steps (tens of cm) scanned with
        # enough lateral motion.
        n = 257
        y = np.linspace(-0.3, 0.3, n)
        edge = n // 2
        depth = np.where(np.arange(n) < edge, 5.3, 5.0)
        xyz = np.stack([depth, depth * y, np.zeros(n)], axis=-1).astype(np.float32)
        info, _ = run_info(xyz)
        lbl = np.asarray(info.label)
        window = lbl[edge: edge + 3]
        assert (window & livox.LABEL_CORNER).any(), (
            np.asarray(info.curvature)[edge - 3: edge + 4],
            np.asarray(info.view_angle)[edge - 3: edge + 4])

    def test_gentle_kink_is_not_corner(self):
        # A shallow V-shaped wall join produces tiny curvature — faithfully
        # NOT a corner under the reference's absolute curvature threshold.
        n = 257
        y = np.linspace(-1, 1, n)
        x = 5.0 + np.abs(y) * 1.0
        xyz = np.stack([x, x * y * 0.2, np.zeros(n)], axis=-1).astype(np.float32)
        info, _ = run_info(xyz)
        lbl = np.asarray(info.label)
        assert not (lbl & livox.LABEL_CORNER).any()

    def test_grazing_surface_rejected_by_view_angle(self):
        # A surface nearly parallel to the ray: chord ≈ ray direction →
        # tiny view angle → no surface label.
        n = 256
        t = np.linspace(0, 1, n)
        xyz = np.stack([5.0 + 4 * t, 0.3 + 0.001 * t, np.zeros(n)], axis=-1)
        info, _ = run_info(xyz.astype(np.float32))
        lbl = np.asarray(info.label)
        assert not (lbl[20:-20] & livox.LABEL_SURFACE).any()

    def test_neighbors_of_zero_points_not_labeled(self):
        n = 256
        y = np.linspace(-1, 1, n)
        xyz = np.stack([np.full(n, 5.0), y, np.zeros(n)], axis=-1).astype(np.float32)
        xyz[100] = 0.0
        info, _ = run_info(xyz)
        lbl = np.asarray(info.label)
        for j in [98, 99, 101, 102]:
            assert not (lbl[j] & (livox.LABEL_SURFACE | livox.LABEL_CORNER)), j
        assert lbl[99] & livox.LABEL_NEAR_ZERO
        assert lbl[101] & livox.LABEL_NEAR_ZERO


class TestSelection:
    def test_select_features_shapes_and_window(self):
        xyz = make_petal_cloud(8, 300)
        info, n_petals = run_info(xyz)
        frame = livox.select_features(
            jnp.asarray(xyz), info, n_petals, 0.0, 0.5, FE, CAPS)
        # only the first half of indices selected
        full_t = np.asarray(frame.full.time)[np.asarray(frame.full.mask)]
        assert full_t.max() <= 0.5 * len(xyz) * FE.time_internal_pts + 1e-6
        # Selections keep the raw capacity; the reduction to
        # max_corner/max_surface happens in the node-level source voxel
        # filter (runtime.pipeline), not here — truncating before the
        # spatial filter would crop by scan time.
        assert frame.corners.capacity == xyz.shape[0]
        assert frame.surface.capacity == xyz.shape[0]

    def test_rejected_frame_has_no_features(self):
        xyz = make_petal_cloud(1, 400)
        info, n_petals = run_info(xyz)
        frame = livox.select_features(
            jnp.asarray(xyz), info, n_petals, 0.0, 1.0, FE, CAPS)
        assert int(frame.full.count()) == 0

    def test_piecewise_extract(self):
        xyz = make_petal_cloud(8, 300)
        info, n_petals, pieces = livox.extract_frame(
            jnp.asarray(xyz), jnp.ones(len(xyz)), jnp.ones(len(xyz), bool),
            0.0, FE, CAPS, piecewise_number=3)
        assert len(pieces) == 3
        t1 = np.asarray(pieces[0].full.time)[np.asarray(pieces[0].full.mask)]
        t2 = np.asarray(pieces[1].full.time)[np.asarray(pieces[1].full.mask)]
        assert t1.max() <= t2.min() + 1e-6


class TestSimulatorIntegration:
    def test_simulated_frame_produces_features(self):
        sim = LivoxSimulator(SimConfig(points_per_frame=10000, seed=3))
        xyz, inten, t0 = sim.frame(0)
        caps = CapacityConfig(max_raw_points=10000, max_splits=256,
                              max_corner=1024, max_surface=8192)
        info, n_petals = run_info(xyz, intensity=inten, caps=caps)
        assert int(n_petals) >= 3
        frame = livox.select_features(
            jnp.asarray(xyz), info, n_petals, 0.0, 1.0, FE, caps)
        ns = int(frame.surface.count())
        nc = int(frame.corners.count())
        assert ns > 500, ns
        assert nc >= 0
        # full cloud keeps most points
        assert int(frame.full.count()) > 8000
