import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from loam_livox_tpu.core.types import PointBatch
from loam_livox_tpu.ops import knn as knn_mod
from loam_livox_tpu.ops import masked
from loam_livox_tpu.ops.voxel import voxel_downsample


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestKnn:
    def test_matches_kdtree(self, rng):
        q = rng.normal(size=(100, 3)).astype(np.float32) * 5
        r = rng.normal(size=(512, 3)).astype(np.float32) * 5
        d, i = knn_mod.knn(jnp.asarray(q), jnp.asarray(r),
                           jnp.ones(512, bool), k=5, query_tile=128)
        tree = cKDTree(r)
        td, ti = tree.query(q, k=5)
        np.testing.assert_allclose(np.sqrt(np.asarray(d)), td, atol=1e-3)
        # indices can differ under distance ties; compare the points
        np.testing.assert_allclose(r[np.asarray(i)], r[ti], atol=1e-5)

    def test_respects_mask(self, rng):
        q = np.zeros((1, 3), np.float32)
        r = np.stack([np.full(3, 0.1, np.float32),
                      np.full(3, 10.0, np.float32),
                      np.full(3, 0.2, np.float32),
                      np.full(3, 0.3, np.float32)])
        mask = jnp.array([False, True, True, True])
        d, i = knn_mod.knn(jnp.asarray(q), jnp.asarray(r), mask, k=2, query_tile=4)
        assert int(i[0, 0]) == 2 and int(i[0, 1]) == 3

    def test_fewer_valid_than_k(self, rng):
        q = np.zeros((1, 3), np.float32)
        r = rng.normal(size=(8, 3)).astype(np.float32)
        mask = jnp.array([True] + [False] * 7)
        d, i = knn_mod.knn(jnp.asarray(q), jnp.asarray(r), mask, k=3, query_tile=8)
        assert int(i[0, 0]) == 0
        assert float(d[0, 1]) > 1e29 and float(d[0, 2]) > 1e29

    def test_multi_tile_indices_global(self, rng):
        q = rng.normal(size=(16, 3)).astype(np.float32)
        r = rng.normal(size=(256, 3)).astype(np.float32)
        d1, i1 = knn_mod.knn(jnp.asarray(q), jnp.asarray(r), jnp.ones(256, bool), k=4, query_tile=64)
        d2, i2 = knn_mod.knn(jnp.asarray(q), jnp.asarray(r), jnp.ones(256, bool), k=4, query_tile=256)
        np.testing.assert_allclose(d1, d2, atol=1e-4)
        np.testing.assert_array_equal(i1, i2)


class TestVoxel:
    def test_centroids(self):
        pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.3, 0.3],   # same voxel @ leaf 0.5
                        [1.1, 0.0, 0.0]], np.float32)        # another voxel
        b = PointBatch.from_xyz(jnp.asarray(pts),
                                time=jnp.array([0.0, 1.0, 2.0]))
        out = voxel_downsample(b, leaf=0.5)
        got = np.asarray(out.xyz)[np.asarray(out.mask)]
        assert got.shape[0] == 2
        got = got[np.argsort(got[:, 0])]
        np.testing.assert_allclose(got[0], [0.2, 0.2, 0.2], atol=1e-5)
        np.testing.assert_allclose(got[1], [1.1, 0.0, 0.0], atol=1e-5)
        # time channel averaged within the merged voxel
        times = sorted(np.asarray(out.time)[np.asarray(out.mask)])
        assert times == [0.5, 2.0]

    def test_matches_grid_partition(self, rng):
        pts = (rng.normal(size=(500, 3)) * 10).astype(np.float32)
        b = PointBatch.from_xyz(jnp.asarray(pts))
        out = voxel_downsample(b, leaf=1.0)
        n_vox = len({tuple(c) for c in np.floor(pts / 1.0).astype(int)})
        assert int(out.count()) == n_vox
        # each output point's voxel must be occupied & centroids exact
        groups = {}
        for p in pts:
            groups.setdefault(tuple(np.floor(p).astype(int)), []).append(p)
        got = np.asarray(out.xyz)[np.asarray(out.mask)]
        want = np.stack([np.mean(v, axis=0) for v in groups.values()])
        got_sorted = got[np.lexsort(got.T)]
        want_sorted = want[np.lexsort(want.T)]
        np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-4)

    def test_negative_coords(self):
        pts = np.array([[-0.1, -0.1, -0.1], [-0.3, -0.2, -0.4]], np.float32)
        b = PointBatch.from_xyz(jnp.asarray(pts))
        out = voxel_downsample(b, leaf=0.5)
        assert int(out.count()) == 1  # both in voxel (-1,-1,-1)

    def test_masked_points_ignored(self, rng):
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        mask = np.zeros(64, bool)
        mask[:10] = True
        b = PointBatch(jnp.asarray(pts), jnp.zeros(64), jnp.asarray(mask))
        out = voxel_downsample(b, leaf=0.01)
        assert int(out.count()) == 10

    def test_capacity_truncation(self, rng):
        pts = (rng.normal(size=(128, 3)) * 50).astype(np.float32)
        b = PointBatch.from_xyz(jnp.asarray(pts))
        out = voxel_downsample(b, leaf=0.1, capacity=16)
        assert out.capacity == 16
        assert int(out.count()) == 16

    def test_all_masked(self):
        b = PointBatch.empty(32)
        out = voxel_downsample(b, leaf=0.5)
        assert int(out.count()) == 0


class TestMasked:
    def test_quantile_matches_reference_semantics(self, rng):
        vals = jnp.asarray(rng.uniform(size=100).astype(np.float32))
        mask = jnp.ones(100, bool)
        got = masked.masked_quantile_l1(vals, mask, 0.8)
        want = np.sort(np.asarray(vals))[80]
        np.testing.assert_allclose(got, want)

    def test_quantile_with_padding(self, rng):
        vals = np.full(64, 100.0, np.float32)
        vals[:10] = np.arange(10)
        mask = np.zeros(64, bool)
        mask[:10] = True
        got = masked.masked_quantile_l1(jnp.asarray(vals), jnp.asarray(mask), 0.8)
        assert float(got) == 8.0

    def test_compact(self):
        mask = jnp.array([False, True, False, True, True])
        vals = jnp.arange(5.0)
        m2, v2 = masked.compact(mask, vals)
        np.testing.assert_array_equal(np.asarray(m2), [1, 1, 1, 0, 0])
        np.testing.assert_array_equal(np.asarray(v2)[:3], [1.0, 3.0, 4.0])

    def test_compact_capacity(self):
        mask = jnp.array([True] * 5)
        vals = jnp.arange(5.0)
        m2, v2 = masked.compact(mask, vals, capacity=3)
        assert v2.shape == (3,)
        m3, v3 = masked.compact(mask, vals, capacity=8)
        assert v3.shape == (8,)
        assert int(jnp.sum(m3)) == 5

    def test_random_keep_mask(self):
        import jax

        key = jax.random.PRNGKey(0)
        mask = jnp.ones(10000, bool)
        kept = masked.random_keep_mask(key, mask, 2000)
        frac = float(jnp.mean(kept))
        assert 0.15 < frac < 0.25
        # under budget: untouched
        small = jnp.ones(100, bool)
        np.testing.assert_array_equal(
            np.asarray(masked.random_keep_mask(key, small, 2000)), np.ones(100, bool))


class TestVoxelNoTime:
    def test_with_time_false_matches(self):
        """The rebuild fast path (no time payload) is bit-identical to
        the full path on xyz/mask and returns zeroed time."""
        import jax

        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(-5, 5, (512, 3)), jnp.float32)
        mask = jnp.asarray(rng.uniform(size=512) > 0.3)
        b = PointBatch(xyz=pts, time=jnp.zeros(512, jnp.float32), mask=mask)
        a = voxel_downsample(b, leaf=0.7, capacity=256)
        c = voxel_downsample(b, leaf=0.7, capacity=256, with_time=False)
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(c.mask))
        np.testing.assert_array_equal(np.asarray(a.xyz), np.asarray(c.xyz))
        assert float(jnp.abs(c.time).max()) == 0.0


class TestDenseModeGridGate:
    def test_rebuild_keeps_grids_in_dense_mode(self):
        """With the dense correspondence engine the matching-buffer
        rebuild must not rebuild the (unused) bucket grids — they are
        returned unchanged from the state."""
        import jax

        from loam_livox_tpu.core.config import SlamConfig
        from loam_livox_tpu.runtime.odometry import (
            _rebuild_matching_buffer, init_state)

        cfg = SlamConfig().replace(
            capacity={"max_raw_points": 2048, "map_surf_capacity": 4096,
                      "map_corner_capacity": 1024,
                      "hist_corner_capacity": 128,
                      "hist_surf_capacity": 512, "history_window": 4},
        )
        # non-grid engines ("auto" resolves to pallas/dense) never read
        # the bucket grids
        assert cfg.optimization.correspondence == "auto"
        st = init_state(cfg)
        c, s, gc, gs = _rebuild_matching_buffer(st, cfg)
        assert gc is st.grid_corners and gs is st.grid_surface
