"""Fused Pallas kNN kernel (`ops.pallas.knn_fused`) — correctness vs the
exact dense search, recall on voxel-sort-ordered references (the real
matching-buffer layout), and the `ops.knn` contract (BIG padding,
masking).  Runs in interpret mode on CPU; the compiled kernel is
benchmarked on the chip by scripts/bench_kernels.py."""
import jax.numpy as jnp
import numpy as np
import pytest

from loam_livox_tpu.ops.knn import BIG, knn
from loam_livox_tpu.ops.pallas.knn_fused import knn_fused


def exact(q, ref, mask, k=5):
    d = ((np.asarray(q)[:, None, :] - np.asarray(ref)[None, :, :]) ** 2
         ).sum(-1)
    d[:, ~np.asarray(mask)] = np.inf
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


class TestFusedKnn:
    def test_matches_exact_on_random(self):
        rng = np.random.default_rng(0)
        q = rng.uniform(-10, 10, (64, 3)).astype(np.float32)
        ref = rng.uniform(-10, 10, (512, 3)).astype(np.float32)
        mask = np.ones(512, bool)
        d, i = knn_fused(jnp.asarray(q), jnp.asarray(ref),
                         jnp.asarray(mask), k=5, query_tile=64,
                         ref_tile=256, bins=128, interpret=True)
        de, ie = exact(q, ref, mask, k=5)
        # random refs: bin collisions possible — require ≥ 0.98 recall
        # and exact distances wherever the index agrees
        agree = (np.asarray(i) == ie)
        assert agree.mean() > 0.98
        np.testing.assert_allclose(np.asarray(d)[agree], de[agree],
                                   rtol=1e-4, atol=1e-4)

    def test_recall_on_voxel_sorted_refs(self):
        # the real layout: matching-buffer points are voxel-sort ordered,
        # so spatial neighbors have consecutive indices → mod-L binning
        # separates them (module docstring)
        from loam_livox_tpu.core.types import PointBatch
        from loam_livox_tpu.ops.voxel import voxel_downsample

        rng = np.random.default_rng(1)
        raw = rng.uniform(-20, 20, (4096, 3)).astype(np.float32)
        batch = PointBatch(xyz=jnp.asarray(raw),
                           time=jnp.zeros(4096), mask=jnp.ones(4096, bool))
        ds = voxel_downsample(batch, 0.4, capacity=2048)
        ref = np.asarray(ds.xyz)
        mask = np.asarray(ds.mask)
        q = ref[mask][:256] + rng.normal(0, 0.05, (256, 3)).astype(np.float32)
        d, i = knn_fused(jnp.asarray(q), jnp.asarray(ref),
                         jnp.asarray(mask), k=5, query_tile=128,
                         ref_tile=512, bins=256, interpret=True)
        de, ie = exact(q, ref, mask, k=5)
        recall = np.mean([
            len(set(np.asarray(i)[r]) & set(ie[r])) / 5.0
            for r in range(len(q))])
        assert recall >= 0.99, f"recall {recall}"

    def test_mask_and_padding_contract(self):
        rng = np.random.default_rng(2)
        q = rng.uniform(-5, 5, (16, 3)).astype(np.float32)
        ref = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
        mask = np.zeros(64, bool)
        mask[:3] = True          # fewer valid refs than k
        d, i = knn_fused(jnp.asarray(q), jnp.asarray(ref),
                         jnp.asarray(mask), k=5, query_tile=16,
                         ref_tile=64, bins=32, interpret=True)
        d = np.asarray(d)
        i = np.asarray(i)
        assert np.all(d[:, 3:] > BIG * 0.4), "missing neighbors read BIG"
        assert np.all(i[:, :3] < 3), "valid neighbors index valid refs"
        de, ie = exact(q, ref, mask, k=3)
        np.testing.assert_array_equal(np.sort(i[:, :3]), np.sort(ie))

    def test_tile_skipping_prefix_fill(self):
        # the production case: a mostly-empty buffer (valid prefix ≪
        # capacity) — skipped tiles must not change results
        rng = np.random.default_rng(4)
        ref = np.zeros((1024, 3), np.float32)
        n_valid = 100
        ref[:n_valid] = rng.uniform(-10, 10, (n_valid, 3))
        mask = np.zeros(1024, bool)
        mask[:n_valid] = True
        q = ref[:32] + rng.normal(0, 0.05, (32, 3)).astype(np.float32)
        # bins == ref_tile → one ref per bin → the search is exact
        d, i = knn_fused(jnp.asarray(q), jnp.asarray(ref),
                         jnp.asarray(mask), k=5, query_tile=16,
                         ref_tile=128, bins=128, interpret=True)
        de, ie = exact(q, ref, mask, k=5)
        np.testing.assert_allclose(np.asarray(d), de, rtol=1e-4, atol=1e-5)
        assert np.all(np.asarray(i) < n_valid)

    def test_query_count_skips_tail_tiles(self):
        rng = np.random.default_rng(5)
        ref = rng.uniform(-10, 10, (256, 3)).astype(np.float32)
        mask = np.ones(256, bool)
        q = rng.uniform(-10, 10, (64, 3)).astype(np.float32)
        d_all, i_all = knn_fused(jnp.asarray(q), jnp.asarray(ref),
                                 jnp.asarray(mask), k=5, query_tile=16,
                                 ref_tile=128, bins=64, interpret=True)
        d_cnt, i_cnt = knn_fused(jnp.asarray(q), jnp.asarray(ref),
                                 jnp.asarray(mask), k=5, query_tile=16,
                                 ref_tile=128, bins=64, interpret=True,
                                 query_count=jnp.int32(20))
        # first 20 queries (plus the rest of their 16-wide tiles, up to
        # 32) match; tiles fully beyond the count read BIG
        np.testing.assert_allclose(np.asarray(d_cnt)[:20],
                                   np.asarray(d_all)[:20],
                                   rtol=1e-5, atol=1e-6)
        from loam_livox_tpu.ops.pallas.knn_fused import BIG

        assert np.all(np.asarray(d_cnt)[32:] > BIG * 0.4)

    def test_agrees_with_dense_engine(self):
        rng = np.random.default_rng(3)
        q = rng.uniform(-10, 10, (128, 3)).astype(np.float32)
        ref = rng.uniform(-10, 10, (1024, 3)).astype(np.float32)
        mask = np.ones(1024, bool)
        df, _ = knn_fused(jnp.asarray(q), jnp.asarray(ref),
                          jnp.asarray(mask), k=5, query_tile=128,
                          ref_tile=512, bins=256, interpret=True)
        dd, _ = knn(jnp.asarray(q), jnp.asarray(ref), jnp.asarray(mask),
                    k=5, exact=True)
        # distances of the top-k sets match within bin-collision noise
        close = np.isclose(np.asarray(df), np.asarray(dd),
                           rtol=1e-4, atol=1e-4)
        assert close.mean() > 0.98
