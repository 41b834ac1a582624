"""Cell-map tests: directory mechanics, moment statistics, feature
classification, revisit reset, radius/FoV queries — the behaviors of
`Points_cloud_cell` / `Points_cloud_map`
(reference: ``source/cell_map_keyframe.hpp:53-1000``)."""
import jax.numpy as jnp
import numpy as np
import pytest

from loam_livox_tpu.core.types import PointBatch
from loam_livox_tpu.map.cell_map import (
    FEATURE_LINE,
    FEATURE_PLANE,
    FEATURE_SPHERE,
    append_cloud,
    cell_features,
    cells_in_fov,
    cells_in_radius,
    empty_cell_map,
    gather_cell_points,
    point_keys,
)

BIG_REVISIT = 10**9


def batch_of(pts, cap=256):
    pts = np.asarray(pts, np.float32)
    out = np.zeros((cap, 3), np.float32)
    m = np.zeros((cap,), bool)
    out[: len(pts)] = pts
    m[: len(pts)] = True
    return PointBatch(xyz=jnp.asarray(out), time=jnp.zeros(cap), mask=jnp.asarray(m))


class TestDirectory:
    def test_points_in_same_cell_share_one_cell(self):
        m = empty_cell_map(1.0, capacity=64, pool_size=8)
        m, _ = append_cloud(m, batch_of([[0.1, 0.1, 0.1], [0.4, 0.2, 0.3]]),
                         BIG_REVISIT, max_new=16)
        assert int(m.n_cells()) == 1
        assert float(m.count.max()) == 2.0

    def test_cell_center_rounding_matches_reference(self):
        # find_cell_center: center = round((p - s/2)/s)*s + s/2
        # (reference cell_map_keyframe.hpp:556-571)
        m = empty_cell_map(1.0, capacity=64, pool_size=8)
        m, _ = append_cloud(m, batch_of([[0.2, 0.2, 0.2]]), BIG_REVISIT, max_new=16)
        centers = np.asarray(m.centers())[np.asarray(m.valid())]
        np.testing.assert_allclose(centers[0], [0.5, 0.5, 0.5], atol=1e-6)
        m2 = empty_cell_map(1.0, capacity=64, pool_size=8)
        m2, _ = append_cloud(m2, batch_of([[-0.2, 1.7, 0.0]]), BIG_REVISIT, max_new=16)
        centers = np.asarray(m2.centers())[np.asarray(m2.valid())]
        np.testing.assert_allclose(centers[0], [-0.5, 1.5, 0.5], atol=1e-6)

    def test_incremental_append_equals_batch(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-3, 3, (100, 3)).astype(np.float32)
        m1 = empty_cell_map(1.0, capacity=512, pool_size=16)
        m1, _ = append_cloud(m1, batch_of(pts), BIG_REVISIT, max_new=256)
        m2 = empty_cell_map(1.0, capacity=512, pool_size=16)
        for chunk in np.array_split(pts, 4):
            m2, _ = append_cloud(m2, batch_of(chunk), BIG_REVISIT, max_new=256)
        assert int(m1.n_cells()) == int(m2.n_cells())
        np.testing.assert_allclose(np.asarray(m1.count).sum(),
                                   np.asarray(m2.count).sum())
        # same directory → same per-cell counts
        np.testing.assert_array_equal(np.asarray(m1.keys), np.asarray(m2.keys))
        np.testing.assert_allclose(np.asarray(m1.count), np.asarray(m2.count))
        np.testing.assert_allclose(np.asarray(m1.sum_p), np.asarray(m2.sum_p),
                                   atol=1e-4)

    def test_mask_respected(self):
        b = batch_of([[0, 0, 0], [5, 5, 5]])
        b = b._replace(mask=b.mask.at[1].set(False))
        m = empty_cell_map(1.0, capacity=64, pool_size=8)
        m, _ = append_cloud(m, b, BIG_REVISIT, max_new=16)
        assert int(m.n_cells()) == 1


class TestMoments:
    def test_mean_cov_match_numpy(self):
        rng = np.random.default_rng(1)
        pts = (rng.normal(scale=0.2, size=(60, 3)) + [5.0, 5.0, 5.0]).astype(np.float32)
        m = empty_cell_map(10.0, capacity=16, pool_size=64)
        m, _ = append_cloud(m, batch_of(pts, cap=128), BIG_REVISIT, max_new=8)
        f = cell_features(m)
        i = int(np.asarray(m.valid()).nonzero()[0][0])
        np.testing.assert_allclose(np.asarray(f.mean)[i], pts.mean(0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(f.cov)[i], np.cov(pts.T), atol=1e-4)


class TestFeatureClassification:
    def make_map_with(self, pts):
        m = empty_cell_map(10.0, capacity=16, pool_size=128)
        return append_cloud(m, batch_of(pts, cap=256), BIG_REVISIT, max_new=8)[0]

    def test_plane(self):
        rng = np.random.default_rng(2)
        pts = np.stack([rng.uniform(4, 6, 200), rng.uniform(4, 6, 200),
                        5.0 + rng.normal(scale=1e-3, size=200)], axis=1)
        f = cell_features(self.make_map_with(pts))
        i = 0
        assert int(f.feature_type[i]) == FEATURE_PLANE
        # plane normal ≈ z
        assert abs(float(f.feature_dir[i, 2])) > 0.99

    def test_line(self):
        rng = np.random.default_rng(3)
        t = rng.uniform(4, 6, 200)
        pts = np.stack([t, np.full(200, 5.0) + rng.normal(scale=1e-2, size=200),
                        np.full(200, 5.0) + rng.normal(scale=1e-2, size=200)],
                       axis=1)
        f = cell_features(self.make_map_with(pts))
        assert int(f.feature_type[0]) == FEATURE_LINE
        assert abs(float(f.feature_dir[0, 0])) > 0.99

    def test_sphere_blob(self):
        rng = np.random.default_rng(4)
        pts = rng.normal(scale=1.0, size=(200, 3)) + 5.0
        f = cell_features(self.make_map_with(pts))
        assert int(f.feature_type[0]) == FEATURE_SPHERE

    def test_too_few_points_is_sphere(self):
        f = cell_features(self.make_map_with([[5, 5, 5], [5.1, 5, 5]]))
        assert int(f.feature_type[0]) == FEATURE_SPHERE


class TestRevisit:
    def test_revisit_resets_stats(self):
        m = empty_cell_map(1.0, capacity=64, pool_size=8)
        b = batch_of([[0.2, 0.2, 0.2]])
        m, _ = append_cloud(m, b, 5, max_new=16)          # frame 0
        for _ in range(6):                              # advance frames with
            m, _ = append_cloud(m, batch_of([[9.5, 9.5, 9.5]]), 5, max_new=16)
        assert float(m.count.max()) >= 6.0              # far cell accumulated
        # revisit the original cell after gap ≥ 5 frames → reset to 1 pt
        m, _ = append_cloud(m, b, 5, max_new=16)
        keys = point_keys(m, b.xyz, b.mask)
        slot = int(np.searchsorted(np.asarray(m.keys), int(keys[0])))
        assert float(m.count[slot]) == 1.0

    def test_no_reset_below_threshold(self):
        m = empty_cell_map(1.0, capacity=64, pool_size=8)
        b = batch_of([[0.2, 0.2, 0.2]])
        m, _ = append_cloud(m, b, BIG_REVISIT, max_new=16)
        m, _ = append_cloud(m, b, BIG_REVISIT, max_new=16)
        assert float(m.count.max()) == 2.0


class TestQueries:
    def test_radius_query(self):
        m = empty_cell_map(1.0, capacity=64, pool_size=8)
        m, _ = append_cloud(m, batch_of([[0.5, 0.5, 0.5], [8.5, 0.5, 0.5]]),
                         BIG_REVISIT, max_new=16)
        sel = cells_in_radius(m, jnp.zeros(3), 2.0)
        assert int(sel.sum()) == 1

    def test_fov_gate(self):
        m = empty_cell_map(1.0, capacity=64, pool_size=8)
        m, _ = append_cloud(m, batch_of([[5.5, 0.5, 0.5], [-5.5, 0.5, 0.5]]),
                         BIG_REVISIT, max_new=16)
        q = jnp.array([1.0, 0, 0, 0])
        sel = cells_in_fov(m, jnp.zeros(3), q, 45.0)
        centers = np.asarray(m.centers())[np.asarray(sel)]
        assert len(centers) == 1 and centers[0][0] > 0

    def test_gather_points(self):
        m = empty_cell_map(1.0, capacity=64, pool_size=8)
        pts = [[0.1, 0.2, 0.3], [0.15, 0.22, 0.31], [5.5, 5.5, 5.5]]
        m, _ = append_cloud(m, batch_of(pts), BIG_REVISIT, max_new=16)
        out = gather_cell_points(m, m.valid())
        got = np.asarray(out.xyz)[np.asarray(out.mask)]
        assert len(got) == 3
        # gather only the near cell
        sel = cells_in_radius(m, jnp.zeros(3), 2.0)
        out2 = gather_cell_points(m, sel)
        assert int(out2.mask.sum()) == 2

    def test_pool_ring_overwrite(self):
        m = empty_cell_map(1.0, capacity=16, pool_size=4)
        rng = np.random.default_rng(5)
        pts = (rng.uniform(0, 1, (10, 3)) * 0.9).astype(np.float32)
        m, _ = append_cloud(m, batch_of(pts), BIG_REVISIT, max_new=8)
        out = gather_cell_points(m, m.valid())
        assert int(out.mask.sum()) == 4   # pool capped
        assert float(m.count.max()) == 10.0  # moments see everything
