"""Mid-100 multi-LiDAR front-end tests: vmapped extraction, merge,
extrinsics (reference: laser_feature_extractor.hpp:85,173-180,305-389)."""
import jax.numpy as jnp
import numpy as np
import pytest

from loam_livox_tpu.core import se3
from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.frontend.multi import extract_multi_lidar
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig

CFG = SlamConfig().replace(capacity={"max_raw_points": 4096})
FE = CFG.feature_extraction
CAPS = CFG.capacity


def three_sensor_frame():
    sims = [LivoxSimulator(SimConfig(points_per_frame=4096, seed=s))
            for s in range(3)]
    xyz = np.zeros((3, 4096, 3), np.float32)
    inten = np.zeros((3, 4096), np.float32)
    mask = np.ones((3, 4096), bool)
    for s, sim in enumerate(sims):
        x, i, _ = sim.frame(0)
        xyz[s] = x
        inten[s] = i
    return jnp.asarray(xyz), jnp.asarray(inten), jnp.asarray(mask)


class TestMultiLidar:
    def test_merged_capacities_and_counts(self):
        xyz, inten, mask = three_sensor_frame()
        frames = extract_multi_lidar(xyz, inten, mask, 0.0, FE, CAPS)
        assert len(frames) == 1
        f = frames[0]
        assert f.full.capacity == 3 * CAPS.max_raw_points
        # each sensor contributes features
        per = f.full.mask.reshape(3, -1).sum(axis=1)
        assert all(int(c) > 1000 for c in per)

    def test_piecewise(self):
        xyz, inten, mask = three_sensor_frame()
        frames = extract_multi_lidar(xyz, inten, mask, 0.0, FE, CAPS,
                                     piecewise_number=2)
        assert len(frames) == 2
        t0 = np.asarray(frames[0].full.time)[np.asarray(frames[0].full.mask)]
        t1 = np.asarray(frames[1].full.time)[np.asarray(frames[1].full.mask)]
        assert t0.max() <= t1.min() + 1e-6

    def test_extrinsics_rotate_points(self):
        xyz, inten, mask = three_sensor_frame()
        qz = jnp.asarray(np.tile(
            se3.quat_exp(jnp.asarray([0.0, 0.0, np.pi / 2])), (3, 1)))
        t = jnp.zeros((3, 3))
        f0 = extract_multi_lidar(xyz, inten, mask, 0.0, FE, CAPS)[0]
        f1 = extract_multi_lidar(xyz, inten, mask, 0.0, FE, CAPS,
                                 extrinsic_q=qz, extrinsic_t=t)[0]
        a = np.asarray(f0.full.xyz)[np.asarray(f0.full.mask)]
        b = np.asarray(f1.full.xyz)[np.asarray(f1.full.mask)]
        # 90° about z: (x, y) → (−y, x)
        np.testing.assert_allclose(b[:, 0], -a[:, 1], atol=1e-4)
        np.testing.assert_allclose(b[:, 1], a[:, 0], atol=1e-4)
