"""Point-to-line / point-to-plane ICP residuals with motion deblur.

Batched, fixed-shape re-implementations of the reference's Ceres
autodiff cost functors (``source/ceres_icp.hpp``):

* `line_residuals`  ↔ ceres_icp_point2line[_mb]   (reference :80-148, 237-301)
* `plane_residuals` ↔ ceres_icp_point2plane[_mb]  (reference :151-233, 305-380)

Each residual is the full 3-vector (not its norm), exactly like the
reference: the line residual is the rejection of (pt−a) from the line
direction, the plane residual is the projection of (pt−a) onto the
(cross-product, NOT re-normalized) plane normal — so degenerate
neighbor triples give ‖n‖→0 and quietly contribute nothing, matching
the reference's behavior.

Motion deblur: each point's transform is slerp(I, q_incre, s),
t_incre·s with s the normalized per-point time (reference
ceres_icp.hpp:54-59, 116-121, 197-202).

Target construction from kNN results mirrors
``point_cloud_registration.hpp:249-332`` (lines: nearest two points,
degenerate below 0.1 mm; squared-distance gate on the k-th neighbor)
and ``:351-424`` (planes: neighbors [0, k/2, k-1], gate 50 m²).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3


class LineTargets(NamedTuple):
    a: jax.Array        # (N, 3) line anchor
    unit_ab: jax.Array  # (N, 3) unit direction
    valid: jax.Array    # (N,) bool


class PlaneTargets(NamedTuple):
    a: jax.Array        # (N, 3) plane anchor
    normal: jax.Array   # (N, 3) un-normalized cross-product normal
    valid: jax.Array    # (N,) bool


def build_line_targets(
    sq_dists: jax.Array,
    idx: jax.Array,
    map_xyz: jax.Array,
    query_mask: jax.Array,
    max_dis_sq: float,
) -> LineTargets:
    """From 5-NN results: target line through the two nearest map points
    (reference: point_cloud_registration.hpp:300-303)."""
    from ..parallel.mesh import pin_replicated

    # pin the gathered neighbors replicated under a product mesh: the
    # target math below must lower whole-array in every layout (the
    # shard-invariance contract; parallel/mesh.py)
    a, b = pin_replicated((map_xyz[idx[:, 0]], map_xyz[idx[:, 1]]))
    ab = b - a
    norm = jnp.linalg.norm(ab, axis=-1, keepdims=True)
    valid = (
        query_mask
        & (sq_dists[:, -1] < max_dis_sq)
        & (norm[:, 0] >= 1e-4)
    )
    unit = ab / jnp.maximum(norm, 1e-12)
    return LineTargets(a=a, unit_ab=unit, valid=valid)


def build_plane_targets(
    sq_dists: jax.Array,
    idx: jax.Array,
    map_xyz: jax.Array,
    query_mask: jax.Array,
    max_dis_sq: float,
) -> PlaneTargets:
    """From k-NN results: plane through neighbors [0, k//2, k-1]
    (reference: point_cloud_registration.hpp:401-420)."""
    from ..parallel.mesh import pin_replicated

    k = idx.shape[1]
    # see build_line_targets: replicated neighbor gathers under a mesh
    a, b, c = pin_replicated((map_xyz[idx[:, 0]], map_xyz[idx[:, k // 2]],
                              map_xyz[idx[:, k - 1]]))
    uab = (b - a) / jnp.maximum(jnp.linalg.norm(b - a, axis=-1, keepdims=True), 1e-12)
    uac = (c - a) / jnp.maximum(jnp.linalg.norm(c - a, axis=-1, keepdims=True), 1e-12)
    n = jnp.cross(uab, uac)  # deliberately NOT re-normalized (see module doc)
    valid = query_mask & (sq_dists[:, -1] < max_dis_sq)
    return PlaneTargets(a=a, normal=n, valid=valid)


def transform_points_incre(
    q_incre: jax.Array,
    t_incre: jax.Array,
    pts: jax.Array,
    s: jax.Array,
    q_last: jax.Array,
    t_last: jax.Array,
    deblur: bool,
) -> jax.Array:
    """pt_w = q_last ⊗ (interp(q_incre, s) · pt + t_incre · s) + t_last.

    With deblur off, s is ignored and the full increment applies
    (reference ceres_icp.hpp:275, 350)."""
    from ..parallel.mesh import det_barrier, pin_replicated

    if deblur:
        q_s = se3.quat_slerp_identity(q_incre, s)          # (N, 4)
        t_s = t_incre[None, :] * s[:, None]
        q_s = det_barrier(pin_replicated(q_s))
    else:
        q_s = q_incre
        t_s = t_incre
    local = det_barrier(pin_replicated(se3.quat_rotate(q_s, pts) + t_s))
    # Materialize (and pin replicated) under the product mesh mode: the
    # transformed points feed every residual/Jacobian consumer; one set
    # of bits for all of them in every layout (the shard-invariance
    # contract — the fused producer chain otherwise lowers with
    # layout-dependent FMA contraction; docs/multichip.md)
    return det_barrier(
        pin_replicated(se3.quat_rotate(q_last, local) + t_last))


def _dot3(a: jax.Array, b: jax.Array) -> jax.Array:
    """Keep-dims dot over the last (3-wide) axis.  In
    layout-deterministic mode (parallel/mesh.py::det_active): products
    materialized behind a barrier, explicit add chain — no FMA
    contraction for the compiler to choose differently per layout (the
    shard-invariance contract; see gauss_newton._sq_norm)."""
    from ..parallel.mesh import det_solver_active

    if not det_solver_active():
        return jnp.sum(a * b, axis=-1, keepdims=True)
    from jax import lax

    p = lax.optimization_barrier(a * b)
    return (p[..., 0:1] + p[..., 1:2]) + p[..., 2:3]


def line_residuals(
    q_incre, t_incre, pts, s, tgt: LineTargets, q_last, t_last, deblur: bool
) -> jax.Array:
    """(N, 3) rejection of (pt_w − a) from the line direction
    (reference ceres_icp.hpp:126-131)."""
    from ..parallel.mesh import det_barrier

    pw = transform_points_incre(q_incre, t_incre, pts, s, q_last, t_last, deblur)
    ac = pw - tgt.a
    # barrier the projection in deterministic mode: `ac - proj` would
    # otherwise fuse the mul into the sub (FMA) with a
    # layout-dependent contraction choice
    proj = det_barrier(_dot3(ac, tgt.unit_ab) * tgt.unit_ab)
    return ac - proj


def plane_residuals(
    q_incre, t_incre, pts, s, tgt: PlaneTargets, q_last, t_last, deblur: bool
) -> jax.Array:
    """(N, 3) projection of (pt_w − a) onto the plane normal
    (reference ceres_icp.hpp:207-212)."""
    pw = transform_points_incre(q_incre, t_incre, pts, s, q_last, t_last, deblur)
    ad = pw - tgt.a
    return _dot3(ad, tgt.normal) * tgt.normal


def _skew(v: jax.Array) -> jax.Array:
    """(N, 3) → (N, 3, 3) cross-product matrices."""
    z = jnp.zeros_like(v[:, 0])
    return jnp.stack([
        jnp.stack([z, -v[:, 2], v[:, 1]], axis=-1),
        jnp.stack([v[:, 2], z, -v[:, 0]], axis=-1),
        jnp.stack([-v[:, 1], v[:, 0], z], axis=-1),
    ], axis=-2)


def point_world_jacobian(q_incre, t_incre, pts, q_last) -> jax.Array:
    """Analytic ∂p_w/∂[δr, δt] (N, 3, 6) for the no-deblur transform
    ``p_w = R_last (Exp(δr) R_incre p + t_incre + δt) + t_last`` at
    δ = 0 — the closed form of what `gauss_newton` otherwise gets from
    6 forward-mode passes."""
    v = se3.quat_rotate(q_incre, pts)                 # R_incre p
    r_last = se3.quat_to_matrix(q_last)               # (3, 3)
    j_rot = -jnp.einsum("ij,njk->nik", r_last, _skew(v))
    j_tr = jnp.broadcast_to(r_last[None], (pts.shape[0], 3, 3))
    return jnp.concatenate([j_rot, j_tr], axis=-1)


def _f1(u: jax.Array) -> jax.Array:
    """(1 − cos u) / u², Taylor-guarded (→ 1/2 − u²/24)."""
    small = jnp.abs(u) < 1e-3
    us = jnp.where(small, 1.0, u)
    return jnp.where(small, 0.5 - u * u / 24.0,
                     (1.0 - jnp.cos(us)) / (us * us))


def _f2(u: jax.Array) -> jax.Array:
    """(u − sin u) / u³, Taylor-guarded (→ 1/6 − u²/120)."""
    small = jnp.abs(u) < 1e-3
    us = jnp.where(small, 1.0, u)
    return jnp.where(small, 1.0 / 6.0 - u * u / 120.0,
                     (us - jnp.sin(us)) / (us ** 3))


def point_world_jacobian_deblur(q_incre, t_incre, pts, s, q_last) -> jax.Array:
    """EXACT analytic ∂p_w/∂[δr, δt] (N, 3, 6) for the deblur transform
    ``p_w = R_last (Exp(s·Log(Exp(δr) R_incre)) p + s(t_incre + δt)) + t_last``
    at δ = 0 — equal to forward-mode autodiff to f32 round-off, at
    closed-form cost (the 6-tangent jacfwd path measured 3.5 ms/frame):

        ∂p_w/∂δr = −s · R_last [R_incre^s p]× · M(s)
        ∂p_w/∂δt =  s · R_last
        M(s)     = J_l(sφ) J_l(φ)⁻¹,   φ = Log(q_incre)

    Both SO(3) left-Jacobian factors are quadratics in K = [φ]×
    (J_l(sφ) = I + s·f1(sθ)·K + s²·f2(sθ)·K²;
    J_l(φ)⁻¹ = I − ½K + b₂K² with b₂ = 1/θ² − (1+cosθ)/(2θ sinθ)), so
    with K³ = −θ²K, K⁴ = −θ²K² the product collapses to
    ``M = I + c₁K + c₂K²`` with per-point scalar coefficients:

        c₁ = a₁ − ½ − θ²(a₁b₂ − a₂/2)
        c₂ = a₂ + b₂ − a₁/2 − θ²a₂b₂,  a₁ = s f1(sθ), a₂ = s² f2(sθ).

    A first-order truncation of M (round-2's analytic path,
    ``I + ((s−1)/2)K``) biased the step direction enough to cost deblur
    acceptance 56/60 → 40/60; the exact form restores jacfwd-identical
    steps (tests/test_registration.py pins the agreement)."""
    q_s = se3.quat_slerp_identity(q_incre, s)           # (N, 4)
    v = se3.quat_rotate(q_s, pts)                        # R^s p
    r_last = se3.quat_to_matrix(q_last)
    phi = se3.quat_log(q_incre)                          # (3,)
    theta2 = jnp.sum(phi * phi)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    K = _skew(phi[None, :])[0]                           # (3, 3)
    K2 = K @ K

    # J_l(φ)⁻¹ quadratic coefficient, Taylor-guarded (→ 1/12 + θ²/720)
    small = theta < 1e-3
    ts = jnp.where(small, 1.0, theta)
    b2 = jnp.where(
        small, 1.0 / 12.0 + theta2 / 720.0,
        1.0 / (ts * ts) - (1.0 + jnp.cos(ts)) / (2.0 * ts * jnp.sin(ts)))

    u = s * theta                                        # (N,)
    a1 = s * _f1(u)
    a2 = s * s * _f2(u)
    c1 = a1 - 0.5 - theta2 * (a1 * b2 - 0.5 * a2)
    c2 = a2 + b2 - 0.5 * a1 - theta2 * a2 * b2

    eye = jnp.eye(3)
    M = (eye[None] + c1[:, None, None] * K[None]
         + c2[:, None, None] * K2[None])                 # (N, 3, 3)
    skew_v = _skew(v)                                    # (N, 3, 3)
    j_rot = -jnp.einsum("ij,njk,nkl->nil", r_last, skew_v, M) \
        * s[:, None, None]
    j_tr = jnp.broadcast_to(r_last[None], (pts.shape[0], 3, 3)) \
        * s[:, None, None]
    return jnp.concatenate([j_rot, j_tr], axis=-1)


def line_jacobian(pw_jac: jax.Array, tgt: LineTargets) -> jax.Array:
    """J of the line rejection residual: (I − u uᵀ) ∂p_w/∂δ."""
    u = tgt.unit_ab
    proj = jnp.einsum("ni,nj,njk->nik", u, u, pw_jac)
    return pw_jac - proj


def plane_jacobian(pw_jac: jax.Array, tgt: PlaneTargets) -> jax.Array:
    """J of the plane projection residual: n nᵀ ∂p_w/∂δ."""
    nvec = tgt.normal
    return jnp.einsum("ni,nj,njk->nik", nvec, nvec, pw_jac)


def huber_rho(s: jax.Array, delta: float) -> jax.Array:
    """Ceres HuberLoss on squared residual norms s = ‖r‖²:
    ρ(s) = s for s ≤ δ², else 2δ√s − δ²."""
    d2 = delta * delta
    return jnp.where(s <= d2, s, 2.0 * delta * jnp.sqrt(jnp.maximum(s, 1e-20)) - d2)


def huber_weight(s: jax.Array, delta: float) -> jax.Array:
    """IRLS weight ρ'(s) = min(1, δ/√s); residuals are scaled by √ρ'."""
    d2 = delta * delta
    return jnp.where(s <= d2, 1.0, delta / jnp.sqrt(jnp.maximum(s, 1e-20)))
