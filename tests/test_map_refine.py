"""Post-loop map refinement tests: correction math, corrected-map
rebuild, and the offline-from-disk `refine_mapping` round trip
(reference `Mapping_refine`, ceres_pose_graph_3d.hpp:367-583)."""
import json
import os

import numpy as np
import jax.numpy as jnp

from loam_livox_tpu.core import se3
from loam_livox_tpu.loop.map_refine import (
    rebuild_corrected_map,
    refine_mapping,
    refine_points,
)
from loam_livox_tpu.io.serialization import save_poses_txt


def _rot_z(a):
    q = np.array([np.cos(a / 2), 0, 0, np.sin(a / 2)], np.float32)
    R = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
    return q, R


def _make_keyframes(n=6, drift=0.5, seed=0):
    """Local structure seen from poses along a line; clouds are mapped
    into the world with DRIFTED poses (what a drifted run accumulates);
    the optimizer output is the true poses."""
    rng = np.random.default_rng(seed)
    local = rng.uniform(-2, 2, (200, 3)).astype(np.float32)
    q_gt, t_gt, q_dr, t_dr, clouds, gt_clouds = [], [], [], [], [], []
    for i in range(n):
        qg, Rg = _rot_z(0.15 * i)
        tg = np.array([2.0 * i, 0.0, 0.0], np.float32)
        qd, Rd = _rot_z(0.15 * i + drift * 0.05 * i)
        td = tg + drift * np.array([0.2 * i, 0.1 * i, 0.0], np.float32)
        q_gt.append(qg); t_gt.append(tg)
        q_dr.append(qd); t_dr.append(td)
        clouds.append(local @ Rd.T + td)       # mapped with drift
        gt_clouds.append(local @ Rg.T + tg)    # where they belong
    return (np.stack(q_gt), np.stack(t_gt), np.stack(q_dr),
            np.stack(t_dr), clouds, gt_clouds)


class TestRefinePoints:
    def test_correction_moves_drifted_points_home(self):
        q_gt, t_gt, q_dr, t_dr, clouds, gt_clouds = _make_keyframes()
        for i in range(len(clouds)):
            fixed = refine_points(clouds[i], q_dr[i], t_dr[i],
                                  q_gt[i], t_gt[i])
            assert np.allclose(fixed, gt_clouds[i], atol=1e-4), i

    def test_identity_correction_is_noop(self):
        q_gt, t_gt, *_ = _make_keyframes(n=2)
        pts = np.random.default_rng(1).uniform(-5, 5, (50, 3)).astype(
            np.float32)
        out = refine_points(pts, q_gt[0], t_gt[0], q_gt[0], t_gt[0])
        assert np.allclose(out, pts, atol=1e-5)


class TestRebuildCorrectedMap:
    def test_full_rebuild_beats_drifted_map(self):
        q_gt, t_gt, q_dr, t_dr, clouds, gt_clouds = _make_keyframes()
        refined = rebuild_corrected_map(
            clouds, (t_dr, q_dr), (t_gt, q_gt), stride=1)
        want = np.concatenate(gt_clouds)
        assert refined.shape == want.shape
        assert np.abs(refined - want).max() < 1e-3
        # pre-refine drift error was macroscopic
        assert np.abs(np.concatenate(clouds) - want).max() > 0.1

    def test_stride_matches_reference_republish(self):
        q_gt, t_gt, q_dr, t_dr, clouds, _ = _make_keyframes(n=6)
        refined = rebuild_corrected_map(
            clouds, (t_dr, q_dr), (t_gt, q_gt), stride=2)
        assert len(refined) == 3 * len(clouds[0])

    def test_voxel_resolution_reduces_points(self):
        q_gt, t_gt, q_dr, t_dr, clouds, _ = _make_keyframes(n=3)
        fine = rebuild_corrected_map(clouds, (t_dr, q_dr), (t_gt, q_gt),
                                     stride=1, resolution=0.0)
        coarse = rebuild_corrected_map(clouds, (t_dr, q_dr),
                                       (t_gt, q_gt), stride=1,
                                       resolution=2.0)
        assert 0 < len(coarse) < len(fine)


class TestOfflineRefineMapping:
    def test_round_trip_from_disk(self, tmp_path):
        """Dump artifacts → refine purely from disk → identical to the
        in-memory rebuild (the reference's `refine_mapping(path)`
        resume path, ceres_pose_graph_3d.hpp:502-583)."""
        q_gt, t_gt, q_dr, t_dr, clouds, gt_clouds = _make_keyframes(n=4)
        d = str(tmp_path)
        for i, c in enumerate(clouds):
            # minimal reference-schema keyframe dump: cells w/ Pt_vec
            half = len(c) // 2
            cells = [{"Pt_num": half, "Pt_vec":
                      c[:half].flatten().tolist()},
                     {"Pt_num": len(c) - half, "Pt_vec":
                      c[half:].flatten().tolist()}]
            with open(os.path.join(d, f"keyframe_{10 * (i + 1)}.json"),
                      "w") as f:
                json.dump(cells, f)
        save_poses_txt(os.path.join(d, "poses_ori.txt"), t_dr, q_dr)
        save_poses_txt(os.path.join(d, "poses_opm.txt"), t_gt, q_gt)

        out_pcd = os.path.join(d, "refined.pcd")
        refined = refine_mapping(d, out_pcd=out_pcd, stride=1)
        want = np.concatenate(gt_clouds)
        assert refined.shape == want.shape
        assert np.abs(refined - want).max() < 1e-3
        assert os.path.exists(out_pcd)

        from loam_livox_tpu.io.serialization import load_pcd

        back = load_pcd(out_pcd)
        xyz = back[0] if isinstance(back, tuple) else back
        assert np.allclose(np.asarray(xyz)[:, :3], refined, atol=1e-4)

    def test_missing_dumps_raise(self, tmp_path):
        save_poses_txt(os.path.join(tmp_path, "poses_ori.txt"),
                       np.zeros((1, 3)), np.array([[1.0, 0, 0, 0]]))
        save_poses_txt(os.path.join(tmp_path, "poses_opm.txt"),
                       np.zeros((1, 3)), np.array([[1.0, 0, 0, 0]]))
        import pytest

        with pytest.raises(FileNotFoundError):
            refine_mapping(str(tmp_path))
