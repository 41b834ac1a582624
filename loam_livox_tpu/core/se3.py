"""SE(3) / quaternion math for the TPU-native LiDAR SLAM engine.

Conventions
-----------
* Quaternions are stored ``(w, x, y, z)`` (Hamilton convention) as shape
  ``(..., 4)`` float arrays.  This mirrors the reference's use of
  ``Eigen::Quaterniond(w, x, y, z)`` semantics (reference:
  ``source/point_cloud_registration.hpp:55-56``) while avoiding Eigen's
  xyzw *storage* quirk entirely.
* A rigid pose is the pair ``(q, t)`` acting as ``x_w = R(q) x + t``.
* Everything is pure jax, float32 by default, jit/vmap/grad-safe
  (including ``quat_exp``/``slerp`` at the identity, which are guarded
  with Taylor-safe branches so autodiff through a GN step never sees a
  0/0).

The reference composes poses as ``q_w_curr = q_w_last * q_incre`` and
``t_w_curr = q_w_last * t_incre + t_w_last``
(``source/point_cloud_registration.hpp:514-515``); `pose_compose` matches
that convention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b for (..., 4) arrays."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by quaternions q (..., 4).

    Uses the expanded 15-multiply form (no intermediate quaternion),
    broadcast-friendly so one quaternion can rotate a whole point batch.
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) quaternion -> (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branch-free Shepperd's method: compute all four candidate
    parameterizations and pick the best-conditioned one with `where`,
    so it is jit/vmap safe.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates (un-normalized), one per dominant diagonal term.
    qw0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx0 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy0 = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz0 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(scores, axis=-1)[..., None]
    q = jnp.where(best == 0, qw0, jnp.where(best == 1, qx0, jnp.where(best == 2, qy0, qz0)))
    q = quat_normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_exp(phi: jax.Array) -> jax.Array:
    """Exponential map so(3) -> unit quaternion.

    phi is a rotation vector (..., 3); returns Exp(phi) with
    Taylor-guarded small-angle branch (autodiff-safe at phi = 0).
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS))
    half = 0.5 * theta
    small = theta_sq < 1e-8
    # sin(t/2)/t, guarded: Taylor 0.5 - t^2/48 near zero.
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * phi], axis=-1)


def quat_log(q: jax.Array) -> jax.Array:
    """Log map: unit quaternion -> rotation vector (..., 3)."""
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)  # shortest arc
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    v = q[..., 1:4]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), angle / jnp.maximum(vn, _EPS))
    return scale * v


def quat_slerp_identity(q: jax.Array, s: jax.Array) -> jax.Array:
    """slerp(I, q, s) — interpolate from identity toward q by fraction s.

    Matches the reference's motion-deblur interpolation
    ``Eigen::Quaternion::Identity().slerp(s, q_incre)``
    (reference: ``source/ceres_icp.hpp:54``).  Implemented as
    Exp(s · Log(q)), which equals slerp from the identity and is
    autodiff-safe at q = I.

    s broadcasts against q's batch dims: q (4,), s (N, 1) -> (N, 4).
    """
    s = jnp.asarray(s)
    if s.ndim and s.shape[-1] != 1:
        s = s[..., None]
    return quat_exp(s * quat_log(q))


def quat_angular_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """Angular distance in radians between two unit quaternions.

    Matches ``Eigen::Quaternion::angularDistance`` (used for ICP
    convergence and degeneracy checks,
    reference: ``source/point_cloud_registration.hpp:517,521``).
    """
    d = quat_multiply(quat_conjugate(a), b)
    vn = jnp.linalg.norm(d[..., 1:4], axis=-1)
    return 2.0 * jnp.arctan2(vn, jnp.abs(d[..., 0]))


def pose_compose(q_a: jax.Array, t_a: jax.Array, q_b: jax.Array, t_b: jax.Array):
    """(q_a, t_a) ∘ (q_b, t_b): first apply b, then a."""
    return quat_multiply(q_a, q_b), quat_rotate(q_a, t_b) + t_a


def pose_inverse(q: jax.Array, t: jax.Array):
    qi = quat_conjugate(q)
    return qi, -quat_rotate(qi, t)


def pose_transform(q: jax.Array, t: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply pose to points (..., 3)."""
    return quat_rotate(q, pts) + t


def pose_relative(q_a: jax.Array, t_a: jax.Array, q_b: jax.Array, t_b: jax.Array):
    """T_a^{-1} ∘ T_b — the relative pose taking frame b into frame a."""
    qi, ti = pose_inverse(q_a, t_a)
    return pose_compose(qi, ti, q_b, t_b)


def rodrigues_matrix(axis: jax.Array, theta: jax.Array) -> jax.Array:
    """R = I + sin(θ)·[ω]ₓ + (1-cos(θ))·[ω]ₓ² for a unit axis.

    The reference uses this closed form to interpolate the incremental
    rotation per point during motion deblur
    (reference: ``source/point_cloud_registration.hpp:638-646``).
    Broadcasts over leading dims of theta.
    """
    wx, wy, wz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(wx)
    hat = jnp.stack(
        [zeros, -wz, wy, wz, zeros, -wx, -wy, wx, zeros], axis=-1
    ).reshape(axis.shape[:-1] + (3, 3))
    hat2 = hat @ hat
    th = theta[..., None, None]
    eye = jnp.eye(3, dtype=axis.dtype)
    return eye + jnp.sin(th) * hat + (1.0 - jnp.cos(th)) * hat2


def quat_to_axis_angle(q: jax.Array):
    """Unit quaternion -> (unit axis, angle). Safe at the identity."""
    phi = quat_log(q)
    theta = jnp.linalg.norm(phi, axis=-1)
    axis = phi / jnp.maximum(theta[..., None], _EPS)
    # At the identity pick an arbitrary fixed axis (theta = 0 anyway).
    axis = jnp.where(theta[..., None] < 1e-9, jnp.array([1.0, 0.0, 0.0], dtype=q.dtype), axis)
    return axis, theta
