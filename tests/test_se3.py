import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from loam_livox_tpu.core import se3


def random_quat(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return jnp.asarray(q, jnp.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_multiply_matches_scipy(rng):
    for _ in range(10):
        a, b = random_quat(rng), random_quat(rng)
        got = se3.quat_multiply(a, b)
        # scipy uses xyzw
        ra = Rotation.from_quat(np.roll(np.asarray(a), -1))
        rb = Rotation.from_quat(np.roll(np.asarray(b), -1))
        want = np.roll((ra * rb).as_quat(), 1)
        # sign ambiguity
        if np.dot(want, np.asarray(got)) < 0:
            want = -want
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_quat_rotate_matches_matrix(rng):
    q = random_quat(rng)
    v = jnp.asarray(rng.normal(size=(17, 3)), jnp.float32)
    got = se3.quat_rotate(q, v)
    want = v @ se3.quat_to_matrix(q).T
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_matrix_quat_roundtrip(rng):
    for _ in range(20):
        q = random_quat(rng)
        q = q * jnp.sign(q[0])
        m = se3.quat_to_matrix(q)
        q2 = se3.matrix_to_quat(m)
        np.testing.assert_allclose(q, q2, atol=1e-5)


def test_exp_log_roundtrip(rng):
    phi = jnp.asarray(rng.normal(size=(8, 3)) * 0.5, jnp.float32)
    q = se3.quat_exp(phi)
    phi2 = se3.quat_log(q)
    np.testing.assert_allclose(phi, phi2, atol=1e-5)


def test_exp_at_zero_is_identity_and_differentiable():
    q = se3.quat_exp(jnp.zeros(3))
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-7)
    J = jax.jacfwd(se3.quat_exp)(jnp.zeros(3))
    assert np.all(np.isfinite(J))
    # d(exp)/dphi at 0: vector part gradient = 0.5*I
    np.testing.assert_allclose(J[1:4, :], 0.5 * np.eye(3), atol=1e-5)


def test_slerp_identity_endpoints(rng):
    q = random_quat(rng)
    q = q * jnp.sign(q[0])
    np.testing.assert_allclose(
        se3.quat_slerp_identity(q, jnp.array(1.0)), q, atol=1e-5)
    np.testing.assert_allclose(
        se3.quat_slerp_identity(q, jnp.array(0.0)), [1, 0, 0, 0], atol=1e-6)


def test_slerp_matches_scipy(rng):
    from scipy.spatial.transform import Slerp

    q = random_quat(rng)
    q = q * jnp.sign(q[0])
    key_rots = Rotation.from_quat(
        np.stack([[0, 0, 0, 1], np.roll(np.asarray(q), -1)]))
    sl = Slerp([0.0, 1.0], key_rots)
    for s in [0.25, 0.5, 0.75]:
        got = se3.quat_slerp_identity(q, jnp.array(s))
        want = np.roll(sl([s]).as_quat()[0], 1)
        if np.dot(want, np.asarray(got)) < 0:
            want = -want
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_angular_distance(rng):
    q1 = random_quat(rng)
    phi = jnp.asarray([0.3, 0, 0], jnp.float32)
    q2 = se3.quat_multiply(q1, se3.quat_exp(phi))
    np.testing.assert_allclose(se3.quat_angular_distance(q1, q2), 0.3, atol=1e-5)
    np.testing.assert_allclose(se3.quat_angular_distance(q1, q1), 0.0, atol=1e-5)
    # sign-flip invariance
    np.testing.assert_allclose(se3.quat_angular_distance(q1, -q1), 0.0, atol=1e-3)


def test_pose_compose_inverse(rng):
    qa, ta = random_quat(rng), jnp.asarray(rng.normal(size=3), jnp.float32)
    qb, tb = random_quat(rng), jnp.asarray(rng.normal(size=3), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    qc, tc = se3.pose_compose(qa, ta, qb, tb)
    lhs = se3.pose_transform(qc, tc, pts)
    rhs = se3.pose_transform(qa, ta, se3.pose_transform(qb, tb, pts))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    qi, ti = se3.pose_inverse(qa, ta)
    back = se3.pose_transform(qi, ti, se3.pose_transform(qa, ta, pts))
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_rodrigues_matches_quat(rng):
    q = random_quat(rng)
    q = q * jnp.sign(q[0])
    axis, theta = se3.quat_to_axis_angle(q)
    R = se3.rodrigues_matrix(axis, theta)
    np.testing.assert_allclose(R, se3.quat_to_matrix(q), atol=1e-5)


def test_rodrigues_broadcast(rng):
    q = random_quat(rng)
    axis, theta = se3.quat_to_axis_angle(q)
    s = jnp.linspace(0, 1, 7)
    R = se3.rodrigues_matrix(axis, theta * s)
    assert R.shape == (7, 3, 3)
    # s-interpolated rotation equals slerp from identity
    for i, si in enumerate(np.linspace(0, 1, 7)):
        want = se3.quat_to_matrix(se3.quat_slerp_identity(q, jnp.array(si)))
        np.testing.assert_allclose(R[i], want, atol=1e-5)
