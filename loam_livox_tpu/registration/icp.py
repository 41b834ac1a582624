"""Scan-to-map ICP — the TPU re-design of `Point_cloud_registration`
(reference: ``source/point_cloud_registration.hpp:163-583``).

One jitted program runs the whole registration of a feature frame
against the map feature clouds:

    for iter < icp_maximum_iteration (lax.scan, convergence-frozen):
        transform features by the current estimate (+ per-point deblur)
        5-NN correspondence in the corner / surface maps  (ops.knn)
        build point-to-line / point-to-plane targets + validity gates
        two-phase robust LM solve for the increment (gauss_newton)
        compose pose, check convergence

    degeneracy check → accept / roll back to the previous pose

Differences from the reference, by design:
* KD-tree kNN → batched MXU kNN over the padded map arrays.
* Ceres → the LM solver in `gauss_newton` (same Huber / prune / bound
  schedule).
* Residual subsampling (reference caps at maximum_residual_blocks for
  CPU real-time, :434-458) defaults to OFF — the batched solver uses
  every residual; the acceptance-gate cost is normalized to the
  reference's block budget so the max_allow_final_cost threshold keeps
  its meaning.  Set ``optimization.subsample_residuals`` to restore the
  reference behavior.
* The reference's convergence test compares a radian angular distance
  against ``57.3 * minimum_icp_R_diff`` (:521) — a unit mixup that makes
  the rotation criterion almost always true; reproduced faithfully so
  iteration counts match.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core import se3
from ..core.config import SlamConfig
from ..core.types import PointBatch
from ..ops.bucket_grid import BucketGrid, grid_knn
from ..ops.knn import knn
from ..ops.masked import random_keep_mask
from . import residuals as res
from .gauss_newton import solve_two_phase

# Map-size gates (reference: point_cloud_registration.hpp:29-30)
CORNER_MIN_MAP_NUM = 0
SURFACE_MIN_MAP_NUM = 50


def resolve_correspondence_engine(opt) -> str:
    """'auto' → the fused Pallas kernel on TPU, the dense XLA engine
    elsewhere (Mosaic kernels have no compiled CPU path; the
    interpreter would crawl)."""
    if opt.correspondence == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "dense"
    return opt.correspondence


class RegistrationResult(NamedTuple):
    q_w: jax.Array            # accepted world pose (rolled back if rejected)
    t_w: jax.Array
    q_incre: jax.Array
    t_incre: jax.Array
    accepted: jax.Array       # bool — degeneracy gate (reference :561-573)
    enabled: jax.Array        # bool — whether ICP actually ran
    final_cost: jax.Array
    gate_cost: jax.Array      # budget-normalized cost used for the gate
    inlier_threshold: jax.Array
    angular_diff_deg: jax.Array
    t_diff: jax.Array
    n_blocks: jax.Array
    iterations: jax.Array


def refine_blur(time: jax.Array, tmin, tmax, deblur: bool) -> jax.Array:
    """Normalized per-point interpolation fraction s ∈ [0, 1]
    (reference: point_cloud_registration.hpp:128-141: non-finite or >1
    clamps to 1; deblur off → 1)."""
    if not deblur:
        return jnp.ones_like(time)
    s = (time - tmin) / jnp.maximum(tmax - tmin, 1e-12)
    s = jnp.where(jnp.isfinite(s), s, 1.0)
    return jnp.clip(s, 0.0, 1.0)


class ICPState(NamedTuple):
    q_incre: jax.Array
    t_incre: jax.Array
    q_last_opt: jax.Array      # previous iteration's increment (for convergence)
    t_last_opt: jax.Array
    active: jax.Array          # bool — iteration freeze flag
    final_cost: jax.Array
    initial_cost: jax.Array
    inlier_threshold: jax.Array
    n_blocks: jax.Array
    iterations: jax.Array
    rng: jax.Array


@partial(jax.jit, static_argnames=("cfg",))
def register_frame(
    frame_corners: PointBatch,
    frame_surface: PointBatch,
    map_corners: PointBatch,
    map_surface: PointBatch,
    q_last: jax.Array,
    t_last: jax.Array,
    time_min: jax.Array,
    time_max: jax.Array,
    enabled: jax.Array,
    rng_key: jax.Array,
    cfg: SlamConfig,
    grid_corners: BucketGrid | None = None,
    grid_surface: BucketGrid | None = None,
    q_incre_init: jax.Array | None = None,
    t_incre_init: jax.Array | None = None,
) -> RegistrationResult:
    """Register one feature frame against the map; returns the composed
    world pose and quality metrics.

    `enabled` should be False during the init-accumulation window or
    when the map is too small (reference :199); the frame is then kept
    at the previous pose with an identity increment, exactly like the
    reference's early frames.

    When bucket grids over the map batches are provided (and
    ``cfg.optimization.correspondence == "grid"``), the correspondence
    search uses the 27-bucket grid-hash kNN instead of the dense scan.
    """
    opt = cfg.optimization
    engine = resolve_correspondence_engine(opt)
    deblur = bool(cfg.common.if_motion_deblur)
    corner_k = opt.line_search_num
    plane_k = opt.plane_search_num

    s_corner = refine_blur(frame_corners.time, time_min, time_max, deblur)
    s_surf = refine_blur(frame_surface.time, time_min, time_max, deblur)

    map_c_ok = jnp.sum(map_corners.mask.astype(jnp.int32)) > CORNER_MIN_MAP_NUM
    map_s_ok = jnp.sum(map_surface.mask.astype(jnp.int32)) > SURFACE_MIN_MAP_NUM
    run = jnp.logical_and(enabled, jnp.logical_and(map_c_ok, map_s_ok))

    if engine == "pallas":
        # the matching buffer is fixed across ICP iterations — build the
        # kernel's transposed reference operand ONCE per frame (the
        # relayout costs more than the fused search itself); the query
        # sets are voxel-filter outputs (compact valid prefixes), so
        # their fill counts bound the kernel's query-tile work
        from ..ops.pallas.knn_fused import build_ref_operand

        ref4_c = build_ref_operand(map_corners.xyz, map_corners.mask)
        ref4_s = build_ref_operand(map_surface.xyz, map_surface.mask)
        n_q_corner = jnp.sum(frame_corners.mask.astype(jnp.int32))
        n_q_surf = jnp.sum(frame_surface.mask.astype(jnp.int32))
        # Geometric group skipping radii = the correspondence gates
        # (maximum_dis_*_for_match are SQUARED gates): a reference
        # beyond the gate can never yield a valid target, so the
        # skipped kernel builds IDENTICAL targets (knn_fused module
        # doc) while pruning the far map like the reference's KD-tree
        # branch-and-bound did.
        radius_c = float(opt.maximum_dis_line_for_match) ** 0.5
        radius_s = float(opt.maximum_dis_plane_for_match) ** 0.5

    def icp_iteration(state: ICPState) -> ICPState:
        # --- correspondence search at the current estimate ------------
        # (pointAssociateToMap with if_undistore=1, reference :247,349)
        qc = res.transform_points_incre(
            state.q_incre, state.t_incre, frame_corners.xyz, s_corner,
            q_last, t_last, deblur)
        qs = res.transform_points_incre(
            state.q_incre, state.t_incre, frame_surface.xyz, s_surf,
            q_last, t_last, deblur)

        if (grid_corners is not None and grid_surface is not None
                and engine == "grid"):
            cd, ci = grid_knn(qc, grid_corners, k=corner_k)
            sd, si = grid_knn(qs, grid_surface, k=plane_k)
        elif engine == "pallas":
            from ..ops.pallas import knn_fused

            cd, ci = knn_fused(qc, map_corners.xyz, map_corners.mask,
                               k=corner_k, ref4=ref4_c,
                               query_count=n_q_corner,
                               max_radius=radius_c)
            sd, si = knn_fused(qs, map_surface.xyz, map_surface.mask,
                               k=plane_k, ref4=ref4_s,
                               query_count=n_q_surf,
                               max_radius=radius_s)
        else:
            from ..parallel.mesh import det_active

            qt = cfg.capacity.knn_query_tile
            # AUTO: exact top_k everywhere except single-chip TPU —
            # approx_min_k's GSPMD-partitioned lowering (per-shard
            # approx + merge) drops a different ~1% candidate set than
            # the single-device reduction, so the shard-invariance
            # contract REQUIRES exact selection whenever the mesh /
            # deterministic hardening is active, on any backend.
            exact = (det_active() or jax.default_backend() != "tpu"
                     if opt.knn_exact < 0 else bool(opt.knn_exact))
            cd, ci = knn(qc, map_corners.xyz, map_corners.mask, k=corner_k,
                         precision=opt.knn_precision, query_tile=qt,
                         exact=exact, deterministic=det_active())
            sd, si = knn(qs, map_surface.xyz, map_surface.mask, k=plane_k,
                         precision=opt.knn_precision, query_tile=qt,
                         exact=exact, deterministic=det_active())

        # Product mesh mode: the map search above runs over the SHARDED
        # reference axis; everything downstream (targets → residuals →
        # solve → gates) is small per-frame work that must be pinned
        # REPLICATED so both the sharded and 1-device programs run
        # whole-array elementwise code — partitioned loops FMA-contract
        # differently on XLA:CPU, and the rare 1-ulp flips amplify
        # through the iteration-capped ICP into acceptance-gate flips
        # (the shard-invariance contract; parallel/mesh.py,
        # docs/multichip.md).
        from ..parallel.mesh import pin_replicated

        cd, ci, sd, si = pin_replicated((cd, ci, sd, si))

        line_tgt = res.build_line_targets(
            cd, ci, map_corners.xyz, frame_corners.mask,
            opt.maximum_dis_line_for_match)
        plane_tgt = res.build_plane_targets(
            sd, si, map_surface.xyz, frame_surface.mask,
            opt.maximum_dis_plane_for_match)
        line_tgt, plane_tgt = pin_replicated((line_tgt, plane_tgt))

        base_mask = jnp.concatenate([line_tgt.valid, plane_tgt.valid])

        rng, sub = jax.random.split(state.rng)
        if opt.subsample_residuals > 0:
            base_mask = random_keep_mask(sub, base_mask, opt.subsample_residuals)

        def f_with_mask(extra_mask):
            def f(q, t):
                rl = res.line_residuals(
                    q, t, frame_corners.xyz, s_corner, line_tgt,
                    q_last, t_last, deblur)
                rp = res.plane_residuals(
                    q, t, frame_surface.xyz, s_surf, plane_tgt,
                    q_last, t_last, deblur)
                r = jnp.concatenate([rl, rp], axis=0)
                return r, extra_mask

            return f

        if deblur and not opt.deblur_analytic_jacobian:
            fj_with_mask = None
        else:
          def fj_with_mask(extra_mask):
            def fj(q, t):
                r, _ = f_with_mask(extra_mask)(q, t)
                if deblur:
                    jc = res.point_world_jacobian_deblur(
                        q, t, frame_corners.xyz, s_corner, q_last)
                    js = res.point_world_jacobian_deblur(
                        q, t, frame_surface.xyz, s_surf, q_last)
                else:
                    jc = res.point_world_jacobian(
                        q, t, frame_corners.xyz, q_last)
                    js = res.point_world_jacobian(
                        q, t, frame_surface.xyz, q_last)
                J = jnp.concatenate([
                    res.line_jacobian(jc, line_tgt),
                    res.plane_jacobian(js, plane_tgt),
                ], axis=0)
                return r, J, extra_mask

            return fj

        q_new, t_new, info = solve_two_phase(
            f_with_mask, base_mask, state.q_incre, state.t_incre, opt,
            fj_with_mask)

        # --- convergence (reference :521-531, units quirk preserved) --
        ang = se3.quat_angular_distance(state.q_last_opt, q_new)
        converged = jnp.logical_and(
            ang < 57.3 * opt.minimum_icp_R_diff,
            jnp.linalg.norm(state.t_last_opt - t_new) < opt.minimum_icp_T_diff,
        )

        return ICPState(
            q_incre=q_new,
            t_incre=t_new,
            q_last_opt=q_new,
            t_last_opt=t_new,
            active=jnp.logical_not(converged),
            final_cost=info.final_cost,
            initial_cost=info.initial_cost,
            inlier_threshold=info.inlier_threshold,
            n_blocks=info.n_blocks,
            iterations=state.iterations + 1,
            rng=rng,
        )

    # Increment seed: identity (the reference's per-frame zero start,
    # :205-208) or the caller-provided constant-velocity prediction
    # (optimization.increment_init=1) — the first correspondence search
    # then runs near the answer, cutting outer iterations.
    if (cfg.optimization.increment_init == 1
            and q_incre_init is not None and t_incre_init is not None):
        q0_incre, t0_incre = q_incre_init, t_incre_init
    else:
        q0_incre = se3.quat_identity()
        t0_incre = jnp.zeros(3, jnp.float32)
    init = ICPState(
        q_incre=q0_incre,
        t_incre=t0_incre,
        q_last_opt=q0_incre,
        t_last_opt=t0_incre,
        active=run,
        final_cost=jnp.float32(0.0),
        initial_cost=jnp.float32(0.0),
        inlier_threshold=jnp.float32(0.0),
        n_blocks=jnp.int32(0),
        iterations=jnp.int32(0),
        rng=rng_key,
    )
    # Early-exit outer loop (reference :521-531 `break`s on
    # convergence): a while_loop does no work on converged/frozen
    # iterations, unlike a scan that computes all 15 and masks.
    state = lax.while_loop(
        lambda s: jnp.logical_and(s.active,
                                  s.iterations < opt.icp_maximum_iteration),
        icp_iteration,
        init,
    )

    q_w = se3.quat_multiply(q_last, state.q_incre)
    t_w = se3.quat_rotate(q_last, state.t_incre) + t_last

    angular_diff = se3.quat_angular_distance(q_w, q_last) * 57.3
    t_diff = jnp.linalg.norm(t_w - t_last)

    # Budget normalization of the gate cost (see module docstring): the
    # reference's max_allow_final_cost was tuned for ≤ budget blocks.
    budget = jnp.float32(max(opt.maximum_residual_blocks, 1))
    nb = jnp.maximum(state.n_blocks.astype(jnp.float32), 1.0)
    gate_cost = state.final_cost * jnp.minimum(1.0, budget / nb)

    reject = jnp.logical_and(
        run,
        jnp.logical_or(
            angular_diff > opt.max_allow_incre_R,
            gate_cost > opt.max_allow_final_cost,
        ),
    )
    accepted = jnp.logical_not(reject)

    q_out = jnp.where(accepted, q_w, q_last)
    t_out = jnp.where(accepted, t_w, t_last)
    ident_q = se3.quat_identity()
    zero_t = jnp.zeros(3, jnp.float32)
    return RegistrationResult(
        q_w=jnp.where(run, q_out, q_last),
        t_w=jnp.where(run, t_out, t_last),
        q_incre=jnp.where(jnp.logical_and(run, accepted), state.q_incre, ident_q),
        t_incre=jnp.where(jnp.logical_and(run, accepted), state.t_incre, zero_t),
        accepted=accepted,
        enabled=run,
        final_cost=state.final_cost,
        gate_cost=gate_cost,
        # A registration that never ran must read as a REJECTION to the
        # loop gate (score < threshold accepts): report +inf-ish, not
        # the 0.0 init, or an empty keyframe pair would be accepted as a
        # perfect loop with the raw center-difference transform.
        inlier_threshold=jnp.where(run, state.inlier_threshold,
                                   jnp.float32(1e9)),
        angular_diff_deg=angular_diff,
        t_diff=t_diff,
        n_blocks=state.n_blocks,
        iterations=state.iterations,
    )
