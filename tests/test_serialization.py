"""Round-trip tests for the reference-compatible persistence formats
(cell-map JSON, g2o, pose text, PCD) — SURVEY.md §5.4."""
import numpy as np
import jax.numpy as jnp
import pytest

from loam_livox_tpu.core.types import PointBatch
from loam_livox_tpu.io.serialization import (
    load_cell_map_json,
    load_g2o,
    load_pcd,
    load_poses_txt,
    save_cell_map_json,
    save_g2o,
    save_pcd,
    save_poses_txt,
)
from loam_livox_tpu.map.cell_map import append_cloud, cell_features, empty_cell_map


def make_map():
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.normal(scale=0.1, size=(60, 3)) + [2.2, 2.2, 2.2],
        rng.normal(scale=0.1, size=(40, 3)) + [5.3, 1.2, 0.2],
        rng.normal(scale=0.05, size=(3, 3)) + [8.0, 8.0, 8.0],  # few-pt cell
    ]).astype(np.float32)
    cap = 256
    padded = np.zeros((cap, 3), np.float32)
    mask = np.zeros((cap,), bool)
    padded[: len(pts)] = pts
    mask[: len(pts)] = True
    b = PointBatch(xyz=jnp.asarray(padded), time=jnp.zeros(cap),
                   mask=jnp.asarray(mask))
    m = empty_cell_map(1.0, capacity=64, pool_size=64)
    m, _ = append_cloud(m, b, 10**9, max_new=32)
    return m


class TestCellMapJson:
    def test_round_trip(self, tmp_path):
        m = make_map()
        p = str(tmp_path / "mapping.json")
        n = save_cell_map_json(m, p)
        assert n == int(m.n_cells())
        m2 = load_cell_map_json(p, capacity=64, pool_size=64)
        assert int(m2.n_cells()) == n
        f1 = cell_features(m)
        f2 = cell_features(m2)
        v1 = np.asarray(m.valid())
        # same directory keys
        np.testing.assert_array_equal(
            np.sort(np.asarray(m.keys)[v1]),
            np.sort(np.asarray(m2.keys)[np.asarray(m2.valid())]))
        # statistics survive (match slots via keys)
        k1 = np.asarray(m.keys)
        k2 = np.asarray(m2.keys)
        for i in np.nonzero(v1)[0]:
            j = int(np.searchsorted(k2, k1[i]))
            np.testing.assert_allclose(np.asarray(f1.mean)[i],
                                       np.asarray(f2.mean)[j], atol=1e-3)
            np.testing.assert_allclose(np.asarray(m.count)[i],
                                       np.asarray(m2.count)[j])

    def test_schema_matches_reference(self, tmp_path):
        import json
        m = make_map()
        p = str(tmp_path / "mapping.json")
        save_cell_map_json(m, p)
        cells = json.load(open(p))
        for c in cells:
            for key in ("Pt_num", "Res", "Center", "Mean", "Cov", "Icov",
                        "Eig_vec", "Eig_val", "Pt_vec"):
                assert key in c
            assert len(c["Center"]) == 3 and len(c["Cov"]) == 9


class TestG2o:
    def test_round_trip(self, tmp_path):
        rng = np.random.default_rng(1)
        n = 5
        t = rng.normal(size=(n, 3))
        q = rng.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        edges = [{"id_begin": i, "id_end": i + 1,
                  "t": rng.normal(size=3),
                  "q_wxyz": q[i]} for i in range(n - 1)]
        p = str(tmp_path / "loop.g2o")
        save_g2o(p, t, q, edges)
        t2, q2, e2 = load_g2o(p)
        np.testing.assert_allclose(t2, t, atol=1e-5)
        np.testing.assert_allclose(np.abs(np.sum(q2 * q, axis=1)), 1.0,
                                   atol=1e-5)
        assert len(e2) == n - 1
        np.testing.assert_allclose(e2[0]["info"], np.eye(6))


class TestPosesTxt:
    def test_round_trip(self, tmp_path):
        rng = np.random.default_rng(2)
        t = rng.normal(size=(4, 3))
        q = rng.normal(size=(4, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        p = str(tmp_path / "poses.txt")
        save_poses_txt(p, t, q)
        t2, q2 = load_poses_txt(p)
        np.testing.assert_allclose(t2, t, atol=1e-9)
        np.testing.assert_allclose(q2, q, atol=1e-9)


class TestPcd:
    @pytest.mark.parametrize("binary", [True, False])
    def test_round_trip(self, tmp_path, binary):
        rng = np.random.default_rng(3)
        xyz = rng.normal(size=(100, 3)).astype(np.float32)
        inten = rng.uniform(size=100).astype(np.float32)
        p = str(tmp_path / "cloud.pcd")
        save_pcd(p, xyz, inten, binary=binary)
        xyz2, inten2 = load_pcd(p)
        atol = 1e-6 if binary else 1e-5
        np.testing.assert_allclose(xyz2, xyz, atol=atol)
        np.testing.assert_allclose(inten2, inten, atol=atol)

    def test_no_intensity(self, tmp_path):
        xyz = np.zeros((5, 3), np.float32)
        p = str(tmp_path / "c.pcd")
        save_pcd(p, xyz)
        xyz2, inten2 = load_pcd(p)
        assert inten2 is None and xyz2.shape == (5, 3)
