import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loam_livox_tpu.core import se3
from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.core.types import PointBatch
from loam_livox_tpu.registration import gauss_newton as gn
from loam_livox_tpu.registration import residuals as res
from loam_livox_tpu.registration.icp import refine_blur, register_frame

IDENT = jnp.array([1.0, 0, 0, 0])
ZERO3 = jnp.zeros(3)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestResiduals:
    def test_line_residual_is_point_line_distance(self, rng):
        a = jnp.array([[0.0, 0, 0]])
        u = jnp.array([[1.0, 0, 0]])
        tgt = res.LineTargets(a=a, unit_ab=u, valid=jnp.array([True]))
        pt = jnp.array([[3.0, 2.0, 1.0]])
        r = res.line_residuals(IDENT, ZERO3, pt, jnp.ones(1), tgt,
                               IDENT, ZERO3, deblur=False)
        np.testing.assert_allclose(np.asarray(r)[0], [0, 2, 1], atol=1e-6)

    def test_plane_residual_is_point_plane_distance(self):
        a = jnp.array([[0.0, 0, 0]])
        n = jnp.array([[0.0, 0, 1.0]])
        tgt = res.PlaneTargets(a=a, normal=n, valid=jnp.array([True]))
        pt = jnp.array([[5.0, -2.0, 0.7]])
        r = res.plane_residuals(IDENT, ZERO3, pt, jnp.ones(1), tgt,
                                IDENT, ZERO3, deblur=False)
        np.testing.assert_allclose(np.asarray(r)[0], [0, 0, 0.7], atol=1e-6)

    def test_analytic_jacobian_matches_jacfwd(self, rng):
        """residuals.point_world_jacobian + line/plane_jacobian must
        equal the 6-JVP forward-mode Jacobian the solver otherwise
        computes."""
        import jax

        n = 17
        pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 3)
        q_incre = se3.quat_normalize(jnp.asarray(
            rng.normal(size=4).astype(np.float32)))
        t_incre = jnp.asarray(rng.normal(size=3).astype(np.float32))
        q_last = se3.quat_normalize(jnp.asarray(
            rng.normal(size=4).astype(np.float32)))
        t_last = jnp.asarray(rng.normal(size=3).astype(np.float32))
        a = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        u = rng.normal(size=(n, 3)).astype(np.float32)
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        ltgt = res.LineTargets(a=a, unit_ab=jnp.asarray(u),
                               valid=jnp.ones(n, bool))
        nrm = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        ptgt = res.PlaneTargets(a=a, normal=nrm, valid=jnp.ones(n, bool))
        s = jnp.ones(n)

        def r_line(dd):
            qq = se3.quat_normalize(
                se3.quat_multiply(se3.quat_exp(dd[:3]), q_incre))
            return res.line_residuals(qq, t_incre + dd[3:], pts, s, ltgt,
                                      q_last, t_last, deblur=False)

        def r_plane(dd):
            qq = se3.quat_normalize(
                se3.quat_multiply(se3.quat_exp(dd[:3]), q_incre))
            return res.plane_residuals(qq, t_incre + dd[3:], pts, s, ptgt,
                                       q_last, t_last, deblur=False)

        zero = jnp.zeros(6)
        J_line_ad = jax.jacfwd(r_line)(zero)
        J_plane_ad = jax.jacfwd(r_plane)(zero)
        pw_jac = res.point_world_jacobian(q_incre, t_incre, pts, q_last)
        np.testing.assert_allclose(np.asarray(res.line_jacobian(pw_jac, ltgt)),
                                   np.asarray(J_line_ad), atol=2e-4)
        np.testing.assert_allclose(np.asarray(res.plane_jacobian(pw_jac, ptgt)),
                                   np.asarray(J_plane_ad), atol=2e-4)

    @pytest.mark.parametrize("rotvec", [
        (0.01, -0.02, 0.03),        # ~2°/frame, the realistic case
        (0.2, -0.15, 0.3),          # large increment (stress the K² terms)
        (1e-6, -2e-6, 1e-6),        # near-identity (Taylor branches)
    ])
    def test_deblur_jacobian_matches_jacfwd_exactly(self, rng, rotvec):
        """The closed-form deblur Jacobian is EXACT (the left-Jacobian
        ratio in closed form), so it must agree with forward-mode to
        f32 round-off at any increment — including s → 0/1 endpoints
        and near-identity increments."""
        import jax

        n = 13
        pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 4)
        s = jnp.asarray(
            np.concatenate([[0.0, 1.0, 1e-4],
                            rng.uniform(0.05, 1.0, n - 3)]).astype(
                np.float32))
        q_incre = se3.quat_exp(jnp.asarray(rotvec))
        t_incre = jnp.asarray([0.05, -0.02, 0.01])
        q_last = se3.quat_normalize(jnp.asarray(
            rng.normal(size=4).astype(np.float32)))

        def pw(dd):
            qq = se3.quat_normalize(
                se3.quat_multiply(se3.quat_exp(dd[:3]), q_incre))
            return res.transform_points_incre(
                qq, t_incre + dd[3:], pts, s, q_last, jnp.zeros(3),
                deblur=True)

        J_ad = jax.jacfwd(pw)(jnp.zeros(6))
        J_an = res.point_world_jacobian_deblur(q_incre, t_incre, pts, s,
                                               q_last)
        scale = max(np.abs(np.asarray(J_ad)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad),
                                   atol=3e-4 * scale)

    def test_deblur_interpolation(self):
        # s=0 → untransformed; s=1 → full increment
        q = se3.quat_exp(jnp.array([0.0, 0.0, 0.3]))
        t = jnp.array([1.0, 0.0, 0.0])
        pts = jnp.array([[2.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
        s = jnp.array([0.0, 1.0])
        out = res.transform_points_incre(q, t, pts, s, IDENT, ZERO3, deblur=True)
        np.testing.assert_allclose(out[0], [2.0, 0, 0], atol=1e-6)
        want = se3.quat_rotate(q, pts[1]) + t
        np.testing.assert_allclose(out[1], want, atol=1e-6)

    def test_build_line_targets_gates(self):
        map_xyz = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [0, 1.0, 0], [5, 5, 5]])
        idx = jnp.array([[0, 1, 2], [0, 0, 0]])
        sq = jnp.array([[0.1, 0.2, 0.5], [0.1, 0.2, 0.5]])
        tgt = res.build_line_targets(sq, idx, map_xyz,
                                     jnp.array([True, True]), 2.0)
        assert bool(tgt.valid[0])
        assert not bool(tgt.valid[1])  # degenerate: both nearest identical
        far = res.build_line_targets(jnp.array([[0.1, 0.2, 3.0]]),
                                     idx[:1], map_xyz, jnp.array([True]), 2.0)
        assert not bool(far.valid[0])  # 5th-NN beyond squared gate

    def test_jacobian_matches_finite_difference(self, rng):
        pts = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32) * 3
        a = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        u = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        tgt = res.LineTargets(a=a, unit_ab=u, valid=jnp.ones(8, bool))
        q0 = se3.quat_exp(jnp.array([0.05, -0.02, 0.1]))
        t0 = jnp.array([0.1, 0.2, -0.3])
        s = jnp.asarray(rng.uniform(size=8), jnp.float32)

        def f(dd):
            q = se3.quat_multiply(se3.quat_exp(dd[:3]), q0)
            t = t0 + dd[3:]
            return res.line_residuals(q, t, pts, s, tgt, IDENT, ZERO3,
                                      deblur=True).ravel()

        J = jax.jacfwd(f)(jnp.zeros(6))
        eps = 1e-3
        for j in range(6):
            dd = np.zeros(6, np.float32)
            dd[j] = eps
            fd = (np.asarray(f(jnp.asarray(dd))) - np.asarray(f(jnp.asarray(-dd)))) / (2 * eps)
            np.testing.assert_allclose(J[:, j], fd, atol=2e-3)

    def test_refine_blur(self):
        t = jnp.array([0.0, 0.05, 0.1, jnp.nan])
        s = refine_blur(t, 0.0, 0.1, deblur=True)
        np.testing.assert_allclose(np.asarray(s)[:3], [0, 0.5, 1.0], atol=1e-6)
        assert float(s[3]) == 1.0
        np.testing.assert_allclose(
            refine_blur(t[:3], 0.0, 0.1, deblur=False), 1.0)


def make_plane_problem(rng, n=256, rot=(0.02, -0.03, 0.05), trans=(0.1, -0.2, 0.15)):
    """Points on 3 orthogonal planes; source = inverse-transformed."""
    pts = []
    normals = []
    for axis in range(3):
        p = rng.uniform(-3, 3, size=(n // 3 + 1, 3))
        p[:, axis] = 2.0
        pts.append(p)
        nvec = np.zeros(3)
        nvec[axis] = 1.0
        normals.append(np.tile(nvec, (len(p), 1)))
    world = jnp.asarray(np.concatenate(pts)[:n], jnp.float32)
    nrm = jnp.asarray(np.concatenate(normals)[:n], jnp.float32)
    q_gt = se3.quat_exp(jnp.asarray(rot, jnp.float32))
    t_gt = jnp.asarray(trans, jnp.float32)
    # source points such that q_gt * src + t_gt lies on the planes
    qi, ti = se3.pose_inverse(q_gt, t_gt)
    src = se3.pose_transform(qi, ti, world)
    tgt = res.PlaneTargets(a=world, normal=nrm, valid=jnp.ones(n, bool))
    return src, tgt, q_gt, t_gt


class TestSolver:
    def test_lm_recovers_transform(self, rng):
        src, tgt, q_gt, t_gt = make_plane_problem(rng)
        n = src.shape[0]
        s = jnp.ones(n)

        def f_with_mask(extra):
            def f(q, t):
                return res.plane_residuals(q, t, src, s, tgt, IDENT, ZERO3,
                                           deblur=False), extra
            return f

        opt = SlamConfig().optimization
        q, t, info = gn.solve_two_phase(
            f_with_mask, jnp.ones(n, bool), IDENT, ZERO3, opt)
        assert float(se3.quat_angular_distance(q, q_gt)) < 1e-3
        np.testing.assert_allclose(t, t_gt, atol=2e-3)
        assert float(info.final_cost) < 1e-4

    def test_outlier_pruning(self, rng):
        src, tgt, q_gt, t_gt = make_plane_problem(rng)
        n = src.shape[0]
        # corrupt 15% of targets with bogus anchors
        bad = rng.uniform(size=n) < 0.15
        a = np.array(tgt.a)
        a[bad] += rng.normal(scale=3.0, size=(bad.sum(), 3))
        tgt = res.PlaneTargets(a=jnp.asarray(a), normal=tgt.normal, valid=tgt.valid)
        s = jnp.ones(n)

        def f_with_mask(extra):
            def f(q, t):
                return res.plane_residuals(q, t, src, s, tgt, IDENT, ZERO3,
                                           deblur=False), extra
            return f

        opt = SlamConfig().optimization
        q, t, info = gn.solve_two_phase(
            f_with_mask, jnp.ones(n, bool), IDENT, ZERO3, opt)
        assert float(se3.quat_angular_distance(q, q_gt)) < 5e-3
        np.testing.assert_allclose(t, t_gt, atol=1e-2)
        # pruning actually removed blocks
        assert int(info.n_blocks) < n

    def test_translation_bounds(self, rng):
        src, tgt, q_gt, t_gt = make_plane_problem(
            rng, rot=(0, 0, 0), trans=(5.0, 0, 0))  # beyond the ±2 bound
        n = src.shape[0]
        s = jnp.ones(n)

        def f_with_mask(extra):
            def f(q, t):
                return res.plane_residuals(q, t, src, s, tgt, IDENT, ZERO3,
                                           deblur=False), extra
            return f

        opt = SlamConfig().optimization
        q, t, info = gn.solve_two_phase(
            f_with_mask, jnp.ones(n, bool), IDENT, ZERO3, opt)
        assert float(jnp.max(jnp.abs(t))) <= opt.max_allow_incre_T + 1e-5

    def test_no_valid_blocks_is_safe(self):
        n = 16
        tgt = res.PlaneTargets(a=jnp.zeros((n, 3)), normal=jnp.zeros((n, 3)),
                               valid=jnp.zeros(n, bool))
        src = jnp.ones((n, 3))
        s = jnp.ones(n)

        def f_with_mask(extra):
            def f(q, t):
                return res.plane_residuals(q, t, src, s, tgt, IDENT, ZERO3,
                                           deblur=False), extra
            return f

        opt = SlamConfig().optimization
        q, t, info = gn.solve_two_phase(
            f_with_mask, jnp.zeros(n, bool), IDENT, ZERO3, opt)
        assert np.all(np.isfinite(np.asarray(q)))
        assert np.all(np.isfinite(np.asarray(t)))


def make_scene_maps(rng, n_surf=2048, n_corner=256):
    """Dense map: three orthogonal walls + a vertical edge line."""
    surf = []
    for axis, off in [(0, 8.0), (1, 6.0), (2, 3.0)]:
        p = rng.uniform(-6, 6, size=(n_surf // 3 + 1, 3))
        p[:, axis] = off
        surf.append(p)
    surf = np.concatenate(surf)[:n_surf].astype(np.float32)
    corner = np.zeros((n_corner, 3), np.float32)
    corner[:, 0] = 8.0
    corner[:, 1] = 6.0
    corner[:, 2] = np.linspace(-3, 3, n_corner)
    return surf, corner


class TestRegisterFrame:
    def _run(self, rng, rot, trans, cfg=None, deblur_gen=False):
        cfg = cfg or SlamConfig().replace(
            optimization={"icp_maximum_iteration": 8, "full_iterations": 6})
        surf_map, corner_map = make_scene_maps(rng)
        q_gt = se3.quat_exp(jnp.asarray(rot, jnp.float32))
        t_gt = jnp.asarray(trans, jnp.float32)
        qi, ti = se3.pose_inverse(q_gt, t_gt)

        idx_s = rng.choice(len(surf_map), 512, replace=False)
        idx_c = rng.choice(len(corner_map), 128, replace=False)
        src_s = se3.pose_transform(qi, ti, jnp.asarray(surf_map[idx_s]))
        src_c = se3.pose_transform(qi, ti, jnp.asarray(corner_map[idx_c]))

        frame_s = PointBatch.from_xyz(src_s, time=jnp.ones(512))
        frame_c = PointBatch.from_xyz(src_c, time=jnp.ones(128))
        map_s = PointBatch.from_xyz(jnp.asarray(surf_map))
        map_c = PointBatch.from_xyz(jnp.asarray(corner_map))

        return register_frame(
            frame_c, frame_s, map_c, map_s,
            IDENT, ZERO3, jnp.float32(0.0), jnp.float32(1.0),
            jnp.array(True), jax.random.PRNGKey(0), cfg), q_gt, t_gt

    def test_recovers_small_motion(self, rng):
        out, q_gt, t_gt = self._run(rng, (0.01, -0.02, 0.03), (0.08, -0.05, 0.02))
        assert bool(out.accepted)
        assert float(se3.quat_angular_distance(out.q_w, q_gt)) < 2e-3
        np.testing.assert_allclose(out.t_w, t_gt, atol=1e-2)

    def test_rejects_excessive_rotation(self, rng):
        # 12° frame-to-frame rotation exceeds the 4°/frame gate: the
        # solver recovers it, then the degeneracy check rolls back.
        out, q_gt, t_gt = self._run(rng, (0.0, 0.0, 0.21), (0.0, 0.0, 0.0))
        assert not bool(out.accepted)
        np.testing.assert_allclose(out.q_w, IDENT, atol=1e-6)
        np.testing.assert_allclose(out.t_w, ZERO3, atol=1e-6)

    def test_disabled_keeps_last_pose(self, rng):
        cfg = SlamConfig()
        surf_map, corner_map = make_scene_maps(rng)
        frame_s = PointBatch.from_xyz(jnp.asarray(surf_map[:128]))
        frame_c = PointBatch.from_xyz(jnp.asarray(corner_map[:64]))
        q_last = se3.quat_exp(jnp.array([0.0, 0.0, 0.5]))
        t_last = jnp.array([1.0, 2.0, 3.0])
        out = register_frame(
            frame_c, frame_s,
            PointBatch.from_xyz(jnp.asarray(corner_map)),
            PointBatch.from_xyz(jnp.asarray(surf_map)),
            q_last, t_last, jnp.float32(0.0), jnp.float32(1.0),
            jnp.array(False), jax.random.PRNGKey(0), cfg)
        assert not bool(out.enabled)
        np.testing.assert_allclose(out.q_w, q_last)
        np.testing.assert_allclose(out.t_w, t_last)

    def test_empty_map_safe(self, rng):
        cfg = SlamConfig()
        frame = PointBatch.from_xyz(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
        empty = PointBatch.empty(128)
        out = register_frame(
            frame, frame, empty, empty, IDENT, ZERO3,
            jnp.float32(0.0), jnp.float32(1.0),
            jnp.array(True), jax.random.PRNGKey(0), cfg)
        assert not bool(out.enabled)
        assert np.all(np.isfinite(np.asarray(out.q_w)))

    def test_motion_deblur_fits_blurred_frame(self, rng):
        # Generate a frame whose points are each transformed by a
        # time-interpolated pose; the deblur solver should recover the
        # full increment.
        cfg = SlamConfig().replace(
            common={"if_motion_deblur": 1},
            optimization={"icp_maximum_iteration": 10, "full_iterations": 6})
        surf_map, corner_map = make_scene_maps(rng)
        q_gt = se3.quat_exp(jnp.array([0.0, 0.0, 0.04]))
        t_gt = jnp.array([0.1, -0.06, 0.0])

        idx_s = rng.choice(len(surf_map), 512, replace=False)
        world_s = jnp.asarray(surf_map[idx_s])
        times = jnp.asarray(rng.uniform(size=512), jnp.float32)
        # src = interp(T, s)^[-1] world  (each point sees partial motion)
        q_s = se3.quat_slerp_identity(q_gt, times)
        t_s = t_gt[None, :] * times[:, None]
        src_s = se3.quat_rotate(se3.quat_conjugate(q_s), world_s - t_s)

        frame_s = PointBatch(xyz=src_s, time=times, mask=jnp.ones(512, bool))
        frame_c = PointBatch.empty(64)
        out = register_frame(
            frame_c, frame_s,
            PointBatch.from_xyz(jnp.asarray(corner_map)),
            PointBatch.from_xyz(jnp.asarray(surf_map)),
            IDENT, ZERO3, jnp.float32(0.0), jnp.float32(1.0),
            jnp.array(True), jax.random.PRNGKey(0), cfg)
        assert bool(out.accepted)
        assert float(se3.quat_angular_distance(out.q_w, q_gt)) < 5e-3
        np.testing.assert_allclose(out.t_w, t_gt, atol=2e-2)
