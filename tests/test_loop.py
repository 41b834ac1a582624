"""Loop-closure component tests: keyframe descriptors (rotation
invariance, similarity discrimination) and pose-graph optimization
(drift correction with a loop edge)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loam_livox_tpu.core import se3
from loam_livox_tpu.core.types import PointBatch
from loam_livox_tpu.loop.keyframe import describe_keyframe, max_similarity
from loam_livox_tpu.loop.pose_graph import (
    add_loop_edge,
    build_odometry_chain,
    edge_residuals,
    optimize_pose_graph,
)
from loam_livox_tpu.map.cell_map import append_cloud, empty_cell_map

BIG = 10**9


def structured_world(rng, n_planes=8, n_lines=6, pts_per=250, rot=None):
    """Points forming several multi-cell planes and lines with distinct
    orientations (each plane spans ~4×4 cells at the 0.5 m cell size, so
    keyframes have realistic cell counts); optionally rotated by
    quaternion `rot`."""
    pts = []
    for i in range(n_planes):
        normal = rng.normal(size=3)
        normal /= np.linalg.norm(normal)
        u = np.cross(normal, [1, 0.3, 0.2])
        u /= np.linalg.norm(u)
        v = np.cross(normal, u)
        c = rng.uniform(-6, 6, 3)
        ab = rng.uniform(-1.1, 1.1, (pts_per, 2))
        pts.append(c + ab[:, :1] * u + ab[:, 1:] * v
                   + rng.normal(scale=1e-3, size=(pts_per, 3)))
    for i in range(n_lines):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        c = rng.uniform(-6, 6, 3)
        s = rng.uniform(-1.2, 1.2, (pts_per, 1))
        pts.append(c + s * d + rng.normal(scale=2e-3, size=(pts_per, 3)))
    out = np.concatenate(pts).astype(np.float32)
    if rot is not None:
        R = np.asarray(se3.quat_to_matrix(jnp.asarray(rot, jnp.float32)))
        out = out @ R.T
    return out


def map_of(pts, cap=2048, pool=64):
    m = empty_cell_map(0.5, capacity=cap, pool_size=pool)
    n = len(pts)
    padded = np.zeros((4096, 3), np.float32)
    mask = np.zeros((4096,), bool)
    padded[:n] = pts[:4096]
    mask[:n] = True
    b = PointBatch(xyz=jnp.asarray(padded), time=jnp.zeros(4096),
                   mask=jnp.asarray(mask))
    return append_cloud(m, b, BIG, max_new=2048)[0]


class TestKeyframeDescriptor:
    def test_classifies_members(self):
        rng = np.random.default_rng(0)
        m = map_of(structured_world(rng))
        d = describe_keyframe(m, m.valid())
        assert int(d.n_plane) > 0
        assert int(d.n_line) > 0
        assert float(d.ratio_nonzero_plane) > 0

    def test_self_similarity_is_high(self):
        rng = np.random.default_rng(1)
        m = map_of(structured_world(rng))
        d = describe_keyframe(m, m.valid())
        s = float(max_similarity(d.img_plane, d.img_plane))
        assert s > 0.99

    def test_rotation_invariance(self):
        """The same world seen under a different orientation must score
        high plane similarity (the rotation alignment + max-NCC design
        goal, reference :1385-1427, 1157-1229)."""
        rng = np.random.default_rng(2)
        world = structured_world(rng)
        rot = np.asarray(se3.quat_exp(jnp.asarray([0.3, 0.2, 1.2])))
        d0 = describe_keyframe(map_of(world), map_of(world).valid())
        m_rot = map_of(structured_world(np.random.default_rng(2), rot=rot))
        d1 = describe_keyframe(m_rot, m_rot.valid())
        s_same = float(max_similarity(d0.img_plane, d1.img_plane))
        # different worlds must score clearly lower
        s_diffs = []
        for seed in (99, 7, 13):
            m_other = map_of(structured_world(np.random.default_rng(seed)))
            d2 = describe_keyframe(m_other, m_other.valid())
            s_diffs.append(float(max_similarity(d0.img_plane, d2.img_plane)))
        # The eigen alignment leaves residual ambiguity (sign flips,
        # near-degenerate moment spectra), so rotated-same is not ~1.0 —
        # the reference shares this (it compensates with a very high
        # 0.94 accept gate and tolerates misses).  What matters is
        # discrimination.
        assert s_same > 0.65, f"rotated-same similarity {s_same}"
        assert s_same > max(s_diffs) + 0.05, (s_same, s_diffs)


class TestSceneAlignment:
    def test_recovers_known_offset(self):
        """Two keyframes of the same world, B shifted/rotated — the
        coarse-to-fine plane-only ICP must recover the B→A transform
        (reference scene_alignment.hpp:261-391)."""
        from loam_livox_tpu.core.config import SlamConfig
        from loam_livox_tpu.loop.scene_alignment import (
            align_keyframes, extract_cells_of_type)
        from loam_livox_tpu.map.cell_map import FEATURE_LINE, FEATURE_PLANE

        rng = np.random.default_rng(4)
        world = structured_world(rng)
        m_a = map_of(world)

        ang = 0.06
        q_off = np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)], np.float32)
        t_off = np.array([0.4, -0.25, 0.1], np.float32)
        R = np.asarray(se3.quat_to_matrix(jnp.asarray(q_off)))
        world_b = (world @ R.T) + t_off   # B sees the world moved
        m_b = map_of(world_b)

        src_line = extract_cells_of_type(m_a, m_a.valid(), FEATURE_LINE)
        src_plane = extract_cells_of_type(m_a, m_a.valid(), FEATURE_PLANE)
        tgt_line = extract_cells_of_type(m_b, m_b.valid(), FEATURE_LINE)
        tgt_plane = extract_cells_of_type(m_b, m_b.valid(), FEATURE_PLANE)

        ca = jnp.asarray(world.mean(0).astype(np.float32))
        cb = jnp.asarray(world_b.mean(0).astype(np.float32))
        cfg = SlamConfig()
        res = align_keyframes(src_line, src_plane, tgt_line, tgt_plane,
                              ca, cb, cfg, work_capacity=2048)
        # B→A should invert the offset: q ≈ q_off⁻¹? B points = R w + t;
        # aligning B onto A: p_a = R_ba p_b + t_ba with R_ba = R⁻¹.
        q_ba = np.asarray(se3.quat_conjugate(jnp.asarray(q_off)))
        ang_err = float(se3.quat_angular_distance(
            jnp.asarray(q_ba), res.q)) * 57.3
        t_ba = -(R.T @ t_off)
        t_err = np.linalg.norm(np.asarray(res.t) - t_ba)
        assert ang_err < 1.0, f"angular error {ang_err} deg"
        assert t_err < 0.1, f"translation error {t_err}"
        assert float(res.inlier_threshold) < 0.2


class TestPoseGraph:
    def make_drifted_loop(self, n=12, drift=0.3):
        """Ground truth: a closed square loop; estimates accumulate
        drift; one loop edge ties the last pose back to the first."""
        qs = [np.array([1.0, 0, 0, 0])]
        ts = [np.zeros(3)]
        for i in range(1, n):
            ang = 2 * np.pi * i / n
            qs.append(np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)]))
            ts.append(np.array([np.cos(ang) - 1, np.sin(ang), 0.0]) * 3)
        gt_q = np.stack(qs).astype(np.float32)
        gt_t = np.stack(ts).astype(np.float32)
        # drifted estimate: linear error ramp
        est_t = gt_t + np.linspace(0, drift, n)[:, None] * np.array([1, 0.5, 0.2])
        return jnp.asarray(gt_q), jnp.asarray(gt_t), jnp.asarray(est_t.astype(np.float32))

    def test_residuals_zero_at_consistent_poses(self):
        gt_q, gt_t, _ = self.make_drifted_loop()
        g = build_odometry_chain(gt_q, gt_t)
        r = edge_residuals(g, g.q, g.t)
        assert float(jnp.abs(r).max()) < 1e-5

    def test_loop_edge_corrects_drift(self):
        gt_q, gt_t, est_t = self.make_drifted_loop()
        n = gt_q.shape[0]
        # odometry edges measured from the TRUE relative motions, node
        # values initialized at the drifted estimate
        g_true = build_odometry_chain(gt_q, gt_t, capacity_edges=n)
        g = g_true._replace(t=est_t)
        # loop edge: last → first with the true relative pose
        rel_q = se3.quat_multiply(se3.quat_conjugate(gt_q[-1]), gt_q[0])
        rel_t = se3.quat_rotate(se3.quat_conjugate(gt_q[-1]),
                                gt_t[0] - gt_t[-1])
        g = add_loop_edge(g, n - 1, n - 1, 0, rel_q, rel_t)
        q_opt, t_opt, cost = optimize_pose_graph(g, iterations=25)
        err = np.linalg.norm(np.asarray(t_opt) - np.asarray(gt_t), axis=1)
        assert err.max() < 0.02, f"max err {err.max()}"
        assert float(cost) < 1e-6


class TestPoseGraphCG:
    """Matrix-free CG solver and its edge-sharded variant agree with the
    dense reference solver (VERDICT round-1 item 6: distributed pose
    graph — analytic per-edge Jacobians, psum-reduced assembly)."""

    def _drifted_loop_graph(self, n=12, drift=0.3, pad_to=None):
        helper = TestPoseGraph()
        gt_q, gt_t, est_t = helper.make_drifted_loop(n=n, drift=drift)
        cap = pad_to or n
        g = build_odometry_chain(gt_q, gt_t, capacity_edges=cap)
        g = g._replace(t=est_t)
        rel_q = se3.quat_multiply(se3.quat_conjugate(gt_q[-1]), gt_q[0])
        rel_t = se3.quat_rotate(se3.quat_conjugate(gt_q[-1]),
                                gt_t[0] - gt_t[-1])
        g = add_loop_edge(g, n - 1, n - 1, 0, rel_q, rel_t)
        return g, np.asarray(gt_t)

    def test_cg_matches_dense(self):
        from loam_livox_tpu.loop.pose_graph import optimize_pose_graph_cg

        g, gt_t = self._drifted_loop_graph()
        q_d, t_d, cost_d = optimize_pose_graph(g, iterations=25)
        q_c, t_c, cost_c = optimize_pose_graph_cg(g, iterations=25,
                                                  cg_iterations=60)
        err = np.linalg.norm(np.asarray(t_c) - gt_t, axis=1)
        assert err.max() < 0.02, f"CG max err {err.max()}"
        assert float(cost_c) < 1e-6
        # both solvers land on the same (gauge-fixed) optimum
        assert np.allclose(np.asarray(t_c), np.asarray(t_d), atol=1e-3)

    def test_sharded_matches_cg(self):
        from loam_livox_tpu.loop.pose_graph import (
            optimize_pose_graph_cg, optimize_pose_graph_sharded)

        n_dev = len(jax.devices())
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("shard",))
        # pad edge capacity to a multiple of the mesh size
        n = 12
        cap = ((n + n_dev - 1) // n_dev) * n_dev
        g, gt_t = self._drifted_loop_graph(pad_to=cap)
        q_c, t_c, _ = optimize_pose_graph_cg(g, iterations=20,
                                             cg_iterations=60)
        q_s, t_s, cost_s = optimize_pose_graph_sharded(
            g, mesh, iterations=20, cg_iterations=60)
        err = np.linalg.norm(np.asarray(t_s) - gt_t, axis=1)
        assert err.max() < 0.02, f"sharded max err {err.max()}"
        assert np.allclose(np.asarray(t_s), np.asarray(t_c), atol=1e-3)

    def _big_drifted_graph(self, n, n_loops):
        """Two-pass circle with drift and revisit loop closures."""
        rng = np.random.default_rng(0)
        ang = np.linspace(0, 4 * np.pi, n)
        gt_t = np.stack([10 * np.cos(ang), 10 * np.sin(ang),
                         0.01 * np.arange(n)], 1).astype(np.float32)
        gt_q = np.stack([np.cos(ang / 2), np.zeros(n), np.zeros(n),
                         np.sin(ang / 2)], 1).astype(np.float32)
        gt_q_j = jnp.asarray(gt_q)
        gt_t_j = jnp.asarray(gt_t)
        est_t = gt_t + (np.linspace(0, 1.0, n)[:, None]
                        * rng.normal(size=3)).astype(np.float32)
        pairs = [(i, i + n // 2)
                 for i in range(0, n // 2, (n // 2) // n_loops)][:n_loops]
        g = build_odometry_chain(gt_q_j, gt_t_j,
                                 capacity_edges=n - 1 + len(pairs))
        g = g._replace(t=jnp.asarray(est_t))
        for s, (i, j) in enumerate(pairs):
            rel_q = se3.quat_multiply(se3.quat_conjugate(gt_q_j[i]),
                                      gt_q_j[j])
            rel_t = se3.quat_rotate(se3.quat_conjugate(gt_q_j[i]),
                                    gt_t_j[j] - gt_t_j[i])
            g = add_loop_edge(g, n - 1 + s, i, j, rel_q, rel_t)
        return g, gt_t

    def test_chain_matches_dense(self):
        """Exact block-Thomas+Woodbury solver lands on the dense
        solver's optimum on the reference-scale problem."""
        from loam_livox_tpu.loop.pose_graph import optimize_pose_graph_chain

        g, gt_t = self._drifted_loop_graph()
        q_d, t_d, _ = optimize_pose_graph(g, iterations=25)
        q_c, t_c, cost = optimize_pose_graph_chain(g, iterations=10)
        assert float(cost) < 1e-6
        assert np.allclose(np.asarray(t_c), np.asarray(t_d), atol=1e-3)

    def test_chain_scales_to_10k_nodes(self):
        """10,000-node drifted two-pass loop with 20 closures: the
        direct solver recovers ground truth to the f32 round-off floor
        in 10 GN iterations — the dense path would need a (60k, 60k)
        materialized H, truncated CG stalls in the chain's soft bending
        modes."""
        from loam_livox_tpu.loop.pose_graph import optimize_pose_graph_chain

        n = 10_000
        g, gt_t = self._big_drifted_graph(n, n_loops=20)
        drift0 = np.linalg.norm(
            np.asarray(g.t) - gt_t, axis=1).max()
        q_o, t_o, cost = optimize_pose_graph_chain(g, iterations=10)
        err = np.linalg.norm(np.asarray(t_o) - gt_t, axis=1)
        assert err.max() < 0.2, f"10k-node max err {err.max()}"
        assert err.max() < 0.25 * drift0
        assert float(cost) < 1e-5
