"""Sharded-primitive tests on the 8-device virtual CPU mesh: sharded
kNN must match single-device kNN; psum'd normal equations must match
the dense einsum."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loam_livox_tpu.ops.knn import knn
from loam_livox_tpu.parallel import knn_sharded, make_mesh, normal_system_psum


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return make_mesh(8)


class TestShardedKnn:
    def test_matches_single_device(self, mesh):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.uniform(-5, 5, (64, 3)).astype(np.float32))
        ref = jnp.asarray(rng.uniform(-5, 5, (1024, 3)).astype(np.float32))
        mask = jnp.asarray(rng.uniform(size=1024) > 0.1)
        d0, i0 = knn(q, ref, mask, k=5, exact=True)
        d1, i1 = knn_sharded(q, ref, mask, mesh, k=5)
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                                   rtol=1e-5, atol=1e-5)
        # indices can differ only at exact-tie distances; distances match
        same = np.asarray(i0) == np.asarray(i1)
        assert same.mean() > 0.99

    def test_all_invalid_refs(self, mesh):
        q = jnp.zeros((8, 3))
        ref = jnp.zeros((64, 3))
        mask = jnp.zeros((64,), bool)
        d, i = knn_sharded(q, ref, mask, mesh, k=3)
        assert float(d.min()) > 1e29


class TestNormalSystemPsum:
    def test_matches_dense(self, mesh):
        rng = np.random.default_rng(1)
        N = 256
        r_all = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
        J_all = jnp.asarray(rng.normal(size=(N, 3, 6)).astype(np.float32))
        w_all = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))

        def rj(ids):
            return r_all[ids], J_all[ids], w_all[ids]

        ids = jnp.arange(N)
        H, g, c = normal_system_psum(rj, ids, mesh)

        sw = np.sqrt(np.asarray(w_all))
        rw = np.asarray(r_all) * sw[:, None]
        Jw = np.asarray(J_all) * sw[:, None, None]
        H0 = np.einsum("nij,nik->jk", Jw, Jw)
        g0 = np.einsum("nij,ni->j", Jw, rw)
        np.testing.assert_allclose(np.asarray(H), H0, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g), g0, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(c), np.sum(rw * rw), rtol=1e-4)
