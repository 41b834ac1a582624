"""Levenberg–Marquardt solver on SE(3) — the Ceres replacement.

The reference solves each ICP iteration with Ceres autodiff + Huber loss
+ EigenQuaternionParameterization + translation box bounds, in a
two-phase schedule: a 2-iteration "prerun", an inlier-quantile outlier
prune, then the full solve
(reference: ``source/point_cloud_registration.hpp:460-508``).

TPU-native equivalent: residuals and their 3×6 Jacobians w.r.t. the
SE(3) tangent increment are evaluated for the whole batch with
``jax.jacfwd`` (6 JVPs of one fused XLA program), reduced to a 6×6
normal system (a psum-reducible reduction — see
``loam_livox_tpu.parallel``), Jacobi-preconditioned and solved in
float32.  The quaternion update is left-multiplicative
(q ← Exp(δ) ⊗ q), matching Ceres' quaternion manifold; translation is
box-clipped to ±max_allow_incre_T like Ceres' parameter bounds
(reference :143-151).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core import se3
from ..core.config import OptimizationConfig
from ..ops.masked import masked_quantile_l1
from .residuals import huber_rho, huber_weight

# f(q, t) -> (residuals (N, 3), block_mask (N,))
ResidualFn = Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]
# fj(q, t) -> (residuals (N, 3), jacobian (N, 3, 6), block_mask (N,))
# Optional analytic-Jacobian variant; when provided the solver skips
# the 6 forward-mode passes of `jax.jacfwd` (the deblur-off transform
# has a closed form — residuals.point_world_jacobian).
ResidualJacFn = Callable[
    [jax.Array, jax.Array], Tuple[jax.Array, jax.Array, jax.Array]]


class SolveInfo(NamedTuple):
    initial_cost: jax.Array
    final_cost: jax.Array
    inlier_threshold: jax.Array
    n_blocks: jax.Array


# SHARD-INVARIANCE of the residual-axis sums.  The contract of the
# product multi-chip mode (parallel/mesh_devices —
# tests/test_parallel_mode.py asserts the sharded trajectory EQUALS
# the 1-device one) requires the solver's float reductions to produce
# bit-identical results however the residual axis is laid out: under
# GSPMD a plain `jnp.sum`/einsum over a sharded axis becomes per-shard
# partials + an all-reduce, a DIFFERENT float summation order than the
# single-device reduce — enough noise (~1e-7 relative) to flip accept
# gates on marginal frames and cascade through the freeze-on-reject
# policy (measured: 9.5 cm trajectory divergence by frame 15 of the
# equivalence test).  `shard_invariant_sum` below reduces by explicit
# pairwise halving of barrier-materialized halves — pure elementwise
# adds with fixed operand pairing, bit-identical under any layout
# (full forensics: docs/multichip.md).


def shard_invariant_sum(x: jax.Array) -> jax.Array:
    """Sum over the leading axis.  In layout-deterministic mode
    (parallel/mesh.py::det_active — the product mesh mode), reduce by
    explicit pairwise halving of barrier-materialized halves: pure
    adds cannot be FMA-contracted and pair the SAME operands in every
    layout, so the result is bit-identical under any GSPMD
    partitioning.  Reduce ops and einsums are NOT: XLA picks a
    layout-dependent accumulation structure (fixed-block sliced
    einsums with operand barriers still differed by ~4e-9 on a 6×6
    system between the partitioned and whole-array programs — enough
    to flip acceptance gates through the iteration-capped ICP's
    chaotic amplification; forensics in docs/multichip.md).

    In the single-chip default, a plain reduce — fully fusable."""
    from ..parallel.mesh import det_solver_active

    if not det_solver_active():
        return jnp.sum(x, axis=0)
    n = x.shape[0]
    p = 1 << max(n - 1, 0).bit_length()
    if p != n:
        x = jnp.pad(x, ((0, p - n),) + ((0, 0),) * (x.ndim - 1))
    while x.shape[0] > 1:
        h = x.shape[0] // 2
        x = lax.optimization_barrier(x[:h] + x[h:])
    return x[0]


def _sq_norm(r: jax.Array) -> jax.Array:
    """‖r‖² over the last axis.  In layout-deterministic mode the
    products are materialized behind a barrier and summed by an
    explicit add chain, so LLVM cannot FMA-contract the mul into the
    adds — the contraction choice was measured to DIFFER between the
    partitioned and whole-array elementwise loops on XLA:CPU (a noise
    leak into the Huber weights; docs/multichip.md)."""
    from ..parallel.mesh import det_solver_active

    if not det_solver_active():
        return jnp.sum(r * r, axis=-1)
    rr = lax.optimization_barrier(r * r)
    s = rr[..., 0]
    for i in range(1, r.shape[-1]):
        s = s + rr[..., i]
    return s


def _cost(r: jax.Array, mask: jax.Array, delta: float) -> jax.Array:
    """Ceres-style total cost: 0.5 Σ ρ(‖r_block‖²) over valid blocks."""
    from ..parallel.mesh import det_barrier, pin_replicated

    s = _sq_norm(r)
    terms = det_barrier(jnp.where(mask, huber_rho(s, delta), 0.0))
    return pin_replicated(0.5 * shard_invariant_sum(terms))


def _system_from_rJ(r0: jax.Array, J: jax.Array, mask: jax.Array,
                    delta: float):
    """Huber-weighted J^T J (6×6) and J^T r (6,) from evaluated
    residuals/Jacobians — separated out so a caller holding (r, J) from
    a previous pass can re-reduce under a different block mask (the
    inlier prune changes only the mask, not the evaluation point).
    Reductions over the residual axis use the fixed-block scheme (see
    shard_invariant_sum) so the result is independent of the axis
    sharding."""
    from ..parallel.mesh import det_solver_active, pin_replicated

    s = _sq_norm(r0)
    w = jnp.where(mask, huber_weight(s, delta), 0.0)
    sw = jnp.sqrt(w)
    if not det_solver_active():
        # single-chip fast path: one fused einsum pair on the MXU
        rw = r0 * sw[:, None]
        Jw = J * sw[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, Jw,
                       precision=lax.Precision.HIGHEST)
        g = jnp.einsum("nij,ni->j", Jw, rw,
                       precision=lax.Precision.HIGHEST)
        return H, g
    # Layout-deterministic mode: no einsum/reduce on this path —
    # materialize the weighted operands and per-block outer products,
    # collapse the 3 residual components by explicit adds, then
    # tree-sum over blocks — every step is an elementwise op that
    # lowers bit-identically under any layout (see shard_invariant_sum).
    rw, Jw = lax.optimization_barrier(
        (r0 * sw[:, None], J * sw[:, None, None]))
    P = lax.optimization_barrier(
        Jw[:, :, :, None] * Jw[:, :, None, :])      # (N, 3, 6, 6)
    G = lax.optimization_barrier(Jw * rw[:, :, None])  # (N, 3, 6)
    Pn = (P[:, 0] + P[:, 1]) + P[:, 2]
    Gn = (G[:, 0] + G[:, 1]) + G[:, 2]
    H = shard_invariant_sum(Pn)
    g = shard_invariant_sum(Gn)
    return pin_replicated((H, g))


def _normal_system(f: ResidualFn, q: jax.Array, t: jax.Array, delta: float,
                   fj: ResidualJacFn | None = None):
    """Huber-weighted J^T J (6×6) and J^T r (6,) at the current point."""
    if fj is not None:
        r0, J, mask = fj(q, t)
    else:
        def res_of_delta(dd):
            q_new = se3.quat_normalize(
                se3.quat_multiply(se3.quat_exp(dd[:3]), q))
            t_new = t + dd[3:]
            return f(q_new, t_new)[0]

        zero = jnp.zeros(6, q.dtype)
        r0, mask = f(q, t)
        J = jax.jacfwd(res_of_delta)(zero)          # (N, 3, 6)
    # Materialize the residuals/Jacobian ONCE here: without the
    # barrier, XLA clones the producer chain into each consumer fusion
    # (the H/g reduction, the cost sum), where the partitioned and
    # whole-array lowerings contract FMA chains differently — measured
    # as a ~1e-8 H/g divergence between the sharded and unsharded
    # programs from bit-identical inputs.  One materialization = one
    # set of bits for every consumer in both layouts (the
    # shard-invariance contract of the product mesh mode).
    # under a product mesh, materialize and pin the residual/Jacobian
    # replicated so the solver chain lowers whole-array in every layout
    # (GSPMD may otherwise shard intermediate elementwise chains even
    # when their inputs are replicated — parallel/mesh.py)
    from ..parallel.mesh import det_barrier, pin_replicated

    r0, J = det_barrier((r0, J))
    r0, J, mask = pin_replicated((r0, J, mask))
    H, g = _system_from_rJ(r0, J, mask, delta)
    return H, g, r0, J, mask


def _solve_damped(H: jax.Array, g: jax.Array, lam: jax.Array) -> jax.Array:
    """Jacobi-preconditioned damped solve: (H + λ·diag(H) + εI) δ = −g."""
    damped = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6, dtype=H.dtype)
    d = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(damped), 1e-12))
    Hs = damped * d[:, None] * d[None, :]
    gs = g * d
    y = jnp.linalg.solve(Hs, -gs)
    from ..parallel.mesh import pin_replicated

    return pin_replicated(y * d)


class LMState(NamedTuple):
    q: jax.Array
    t: jax.Array
    lam: jax.Array
    cost: jax.Array
    H: jax.Array               # normal system at (q, t) — reused across
    g: jax.Array               # rejected steps instead of re-deriving it
    r: jax.Array               # residuals / Jacobian at (q, t) — lets the
    J: jax.Array               # caller re-reduce under a pruned mask


def lm_solve(
    f: ResidualFn,
    q0: jax.Array,
    t0: jax.Array,
    iterations: int,
    opt: OptimizationConfig,
    fj: ResidualJacFn | None = None,
    init_sys=None,
) -> LMState:
    """Fixed-iteration LM with accept/reject damping adaptation.

    The loop state carries the normal system of the CURRENT point: each
    step builds (H, g, residuals) at the trial point in one pass (the
    Jacobian pass yields the primal residuals anyway), compares costs,
    and on acceptance adopts that system for the next step, with
    identical accept/reject decisions (a rejected step previously
    rebuilt the same system at the unchanged point).  Cost model: on
    the analytic-Jacobian (fj) path this halves the residual
    evaluations per step; on the jacfwd path the saving is one primal
    evaluation out of ~8 per step, and a rejected step now computes a
    full Jacobian at the discarded trial point.

    ``init_sys`` — optional (H, g, cost, r, J) already evaluated at
    (q0, t0); skips the initial evaluation pass entirely (used by the
    two-phase schedule, whose prune step re-masks the prerun's final
    system instead of re-evaluating it)."""
    delta = opt.huber_delta
    tmax = opt.max_allow_incre_T

    def step(state: LMState, _):
        from ..parallel.mesh import pin_replicated

        dd = _solve_damped(state.H, state.g, state.lam)
        q_new = se3.quat_normalize(
            se3.quat_multiply(se3.quat_exp(dd[:3]), state.q))
        t_new = jnp.clip(state.t + dd[3:], -tmax, tmax)
        q_new, t_new = pin_replicated((q_new, t_new))
        H_new, g_new, r_new, J_new, m_new = _normal_system(
            f, q_new, t_new, delta, fj)
        c_new = _cost(r_new, m_new, delta)
        accept = c_new < state.cost
        new_state = LMState(
            q=jnp.where(accept, q_new, state.q),
            t=jnp.where(accept, t_new, state.t),
            lam=jnp.where(accept, state.lam * 0.3, state.lam * 5.0),
            cost=jnp.minimum(c_new, state.cost),
            H=jnp.where(accept, H_new, state.H),
            g=jnp.where(accept, g_new, state.g),
            r=jnp.where(accept, r_new, state.r),
            J=jnp.where(accept, J_new, state.J),
        )
        return new_state, None

    if init_sys is not None:
        H0, g0, c0, r0, J0 = init_sys
    else:
        H0, g0, r0, J0, m0 = _normal_system(f, q0, t0, delta, fj)
        c0 = _cost(r0, m0, delta)
    init = LMState(q=q0, t=t0, lam=jnp.float32(opt.lm_init_lambda),
                   cost=c0, H=H0, g=g0, r=r0, J=J0)
    out, _ = lax.scan(step, init, None, length=iterations)
    return out


def solve_two_phase(
    f_with_mask: Callable[[jax.Array], ResidualFn],
    base_mask: jax.Array,
    q0: jax.Array,
    t0: jax.Array,
    opt: OptimizationConfig,
    fj_with_mask: Callable[[jax.Array], ResidualJacFn] | None = None,
):
    """The reference's prerun → prune → full-solve schedule.

    ``f_with_mask(extra_mask)`` must return a ResidualFn whose returned
    block mask EQUALS ``extra_mask`` — i.e. ``base_mask`` must already
    include every built-in validity gate (the icp.py caller folds
    target validity into ``base_mask``).  The prune quantile, the full
    solve's initial cost, and its initial H/g all reduce under masks
    derived from ``base_mask`` directly; a residual fn that tightened
    the mask internally would have its built-in-invalid blocks included
    in those reductions.  ``fj_with_mask`` is the optional
    analytic-Jacobian counterpart under the same contract.

    Returns (q, t, SolveInfo).  The exported inlier threshold is scaled
    by final/initial cost of the full solve, matching
    ``point_cloud_registration.hpp:559``.
    """
    f_all = f_with_mask(base_mask)
    fj_all = fj_with_mask(base_mask) if fj_with_mask is not None else None
    pre = lm_solve(f_all, q0, t0, opt.prerun_iterations, opt, fj_all)

    # Inlier pruning on loss-corrected residuals: threshold =
    # max(inlier_dis, ratio-quantile of per-block |r|₁)
    # (reference :484-499).  The prerun's final state already holds the
    # residuals/Jacobian at (pre.q, pre.t) — the prune only changes the
    # block MASK, so the full solve's initial system is a re-reduction
    # of the carried (r, J), not a new evaluation pass.
    r = pre.r
    s = _sq_norm(r)   # layout-deterministic: the prune MASK is decision
    rc = r * jnp.sqrt(huber_weight(s, opt.huber_delta))[:, None]
    l1 = jnp.sum(jnp.abs(rc), axis=-1)
    thr = jnp.maximum(
        jnp.float32(opt.inlier_dis),
        masked_quantile_l1(l1, base_mask, opt.inlier_ratio),
    )
    keep = jnp.logical_and(base_mask, l1 <= thr)

    f_in = f_with_mask(keep)
    fj_in = fj_with_mask(keep) if fj_with_mask is not None else None
    initial_cost = _cost(r, keep, opt.huber_delta)
    H_i, g_i = _system_from_rJ(r, pre.J, keep, opt.huber_delta)
    full = lm_solve(f_in, pre.q, pre.t, opt.full_iterations, opt, fj_in,
                    init_sys=(H_i, g_i, initial_cost, r, pre.J))

    n_blocks = jnp.sum(keep.astype(jnp.int32))
    inlier_threshold = thr * full.cost / jnp.maximum(initial_cost, 1e-12)
    info = SolveInfo(
        initial_cost=initial_cost,
        final_cost=full.cost,
        inlier_threshold=inlier_threshold,
        n_blocks=n_blocks,
    )
    return full.q, full.t, info
