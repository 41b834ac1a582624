"""Distributed registration on the 8-device virtual mesh: the sharded
GN must recover a known transform and agree with a single-device GN."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loam_livox_tpu.core import se3
from loam_livox_tpu.core.types import PointBatch
from loam_livox_tpu.parallel import make_mesh
from loam_livox_tpu.parallel.sharded_registration import sharded_registration


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return make_mesh(8)


def plane_world(rng, n=2048):
    """Points on three non-parallel planes (full 6-DoF constraint)."""
    ns = [np.array([1.0, 0, 0]), np.array([0.2, 1.0, 0]),
          np.array([0.1, -0.2, 1.0])]
    pts = []
    for nv in ns:
        nv = nv / np.linalg.norm(nv)
        u = np.cross(nv, [0, 0.3, 1.1])
        u /= np.linalg.norm(u)
        v = np.cross(nv, u)
        c = nv * rng.uniform(3, 6)
        ab = rng.uniform(-4, 4, (n // 3 + 1, 2))
        pts.append(c + ab[:, :1] * u + ab[:, 1:] * v)
    return np.concatenate(pts)[:n].astype(np.float32)


class TestShardedRegistration:
    def test_recovers_known_increment(self, mesh):
        rng = np.random.default_rng(0)
        world = plane_world(rng)
        map_b = PointBatch.from_xyz(jnp.asarray(world))
        ang = 0.02
        q_true = np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)], np.float32)
        t_true = np.array([0.05, -0.03, 0.02], np.float32)
        R = np.asarray(se3.quat_to_matrix(jnp.asarray(q_true)))
        # frame points = world seen after the inverse increment so the
        # solver must recover (q_true, t_true)
        frame_pts = ((world - t_true) @ R).astype(np.float32)
        frame = PointBatch.from_xyz(jnp.asarray(frame_pts))

        q, t, costs = sharded_registration(
            frame, map_b, jnp.asarray([1.0, 0, 0, 0], jnp.float32),
            jnp.zeros(3, jnp.float32), mesh, iterations=6)
        ang_err = float(se3.quat_angular_distance(q, jnp.asarray(q_true)))
        t_err = float(jnp.linalg.norm(t - jnp.asarray(t_true)))
        assert ang_err < 1e-3, f"angular error {ang_err}"
        assert t_err < 5e-3, f"translation error {t_err}"
        assert float(costs[-1]) < float(costs[0])

    def test_mesh_sizes_agree(self, mesh):
        rng = np.random.default_rng(1)
        world = plane_world(rng, n=1024)
        map_b = PointBatch.from_xyz(jnp.asarray(world))
        frame_pts = (world + np.array([0.03, 0.01, -0.02],
                                      np.float32)).astype(np.float32)
        frame = PointBatch.from_xyz(jnp.asarray(frame_pts))
        outs = []
        for nd in (1, 4, 8):
            m = make_mesh(nd)
            q, t, _ = sharded_registration(
                frame, map_b, jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                jnp.zeros(3, jnp.float32), m, iterations=4)
            outs.append((np.asarray(q), np.asarray(t)))
        for q, t in outs[1:]:
            np.testing.assert_allclose(q, outs[0][0], atol=1e-5)
            np.testing.assert_allclose(t, outs[0][1], atol=1e-5)
