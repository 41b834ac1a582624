"""Batched k-nearest-neighbour search on the MXU.

Replaces the reference's per-point ``pcl::KdTreeFLANN::nearestKSearch``
hot loop (reference: ``source/point_cloud_registration.hpp:249,351``)
with a dense, fixed-shape formulation: squared distances
``‖q‖² + ‖r‖² − 2 q·rᵀ`` computed tile-by-tile as matmuls, with a
running top-k merged across reference tiles via ``lax.scan`` — no
(Q × M) matrix ever materializes in HBM.

This is the XLA baseline (and the CPU path); `ops.pallas.knn_fused`
provides the hand-tiled fused kernel with the same contract — the TPU
production engine (`optimization.correspondence = "auto"`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

BIG = jnp.float32(1e30)


@partial(jax.jit, static_argnames=("k", "query_tile", "exact", "recall",
                                   "precision", "deterministic"))
def knn(
    query_xyz: jax.Array,
    ref_xyz: jax.Array,
    ref_mask: jax.Array,
    k: int = 5,
    query_tile: int = 1024,
    exact: bool = False,
    recall: float = 0.99,
    precision: str = "highest",
    deterministic: bool = False,
):
    """k smallest squared distances from each query to the masked refs.

    Layout: scan over QUERY chunks; each step materializes one
    (query_tile, M) distance block (a single MXU matmul) and reduces it
    with ONE ``lax.approx_min_k`` over the full reference axis — no
    per-reference-tile top-k merge chain, which was the dominant cost
    of the tiled formulation.  Peak extra memory is
    ``query_tile × M × 4`` bytes (0.5 GB at 1024 × 131k).

    Args:
      query_xyz: (Q, 3) float32; Q padded to a multiple of query_tile.
      ref_xyz:   (M, 3) float32.
      ref_mask:  (M,) bool — invalid refs never match.
      k:         neighbours per query.
      exact:     exact ``top_k`` instead of ``approx_min_k`` (default
                 recall 0.99 — an approximation in the same spirit as
                 the reference's approximate FLANN KD-tree searches;
                 0.95, XLA's own default, flips ~5% of correspondences
                 per call and was measured to degrade ATE).
      precision: MXU passes for the distance matmul: "highest" = 6-pass
                 f32 (bit-faithful), "high" = 3-pass (~2× faster on the
                 dominant matmul; cross-term error ~|q||r|·2⁻¹⁷ ≈
                 0.02 m² at 50 m range — an order below the match gates,
                 and only reorders near-ties that `approx_min_k`'s 0.99
                 recall already treats as interchangeable).
      deterministic: harden the distance chain against layout-dependent
                 FMA contraction (barriered squared norms, unfused
                 cross term) — required by the multi-chip equivalence
                 contract when the reference axis is sharded
                 (docs/multichip.md); off by default for fusion-free
                 speed.

    Returns:
      sq_dists: (Q, k) float32, ascending; BIG where fewer than k valid refs.
      indices:  (Q, k) int32 into ref_xyz; arbitrary where sq_dists==BIG.
    """
    q = query_xyz.astype(jnp.float32)
    nq = q.shape[0]
    m = ref_xyz.shape[0]
    if nq <= query_tile:
        query_tile = nq
        padq = 0
    else:
        padq = (-nq) % query_tile
        if padq:
            q = jnp.pad(q, ((0, padq), (0, 0)))
    n_chunks = q.shape[0] // query_tile
    qs = q.reshape(n_chunks, query_tile, 3)

    ref = ref_xyz.astype(jnp.float32)

    def _sq3(x):
        # deterministic=True: ‖·‖² with materialized products +
        # explicit adds — bit-identical under any sharding of the
        # leading axis (FMA contraction in a fused mul+reduce differs
        # between partitioned and whole-array loops on XLA:CPU —
        # ulp-level d noise flips near-tie neighbor selections,
        # breaking the multi-chip equivalence contract;
        # docs/multichip.md)
        if not deterministic:
            return jnp.sum(x * x, axis=-1)
        p = lax.optimization_barrier(x * x)
        return (p[..., 0] + p[..., 1]) + p[..., 2]

    ref2 = _sq3(ref) + jnp.where(ref_mask, 0.0, BIG)  # (M,)

    def step(_, qc):
        q2 = _sq3(qc)[:, None]                             # (qt, 1)
        cross = lax.dot_general(
            qc, ref,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=(lax.Precision.HIGHEST if precision == "highest"
                       else lax.Precision.HIGH),
        )                                                   # (qt, M)
        if deterministic:
            # barrier the scaled cross term: `a - 2c` would otherwise
            # fuse mul+sub into an FMA with a layout-dependent
            # contraction choice
            cross2 = lax.optimization_barrier(2.0 * cross)
            d = (q2 + ref2[None, :]) - cross2
        else:
            d = q2 + ref2[None, :] - 2.0 * cross
        if exact or m <= 2 * k:
            neg, idx = lax.top_k(-d, k)
            vals = -neg
        else:
            # High recall matters beyond match quality: ICP convergence
            # checks successive solutions, and correspondence sets that
            # flap between iterations (5% at the 0.95 default) keep the
            # outer loop from ever meeting its tolerance.
            vals, idx = lax.approx_min_k(d, k, recall_target=recall)
        return None, (vals, idx.astype(jnp.int32))

    _, (best_d, best_i) = lax.scan(step, None, qs)
    best_d = best_d.reshape(n_chunks * query_tile, k)[:nq]
    best_i = best_i.reshape(n_chunks * query_tile, k)[:nq]
    best_d = jnp.maximum(best_d, 0.0)  # numerical floor: ‖·‖² ≥ 0
    return best_d, best_i
