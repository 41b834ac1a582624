"""Batched k-nearest-neighbour search on the MXU.

Replaces the reference's per-point ``pcl::KdTreeFLANN::nearestKSearch``
hot loop (reference: ``source/point_cloud_registration.hpp:249,351``)
with a dense, fixed-shape formulation: squared distances
``‖q‖² + ‖r‖² − 2 q·rᵀ`` computed tile-by-tile as matmuls, with a
running top-k merged across reference tiles via ``lax.scan`` — no
(Q × M) matrix ever materializes in HBM.

This is the XLA baseline; `loam_livox_tpu.ops.pallas.knn` provides the
hand-tiled Pallas kernel for the same contract.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

BIG = jnp.float32(1e30)


@partial(jax.jit, static_argnames=("k", "ref_tile", "exact"))
def knn(
    query_xyz: jax.Array,
    ref_xyz: jax.Array,
    ref_mask: jax.Array,
    k: int = 5,
    ref_tile: int = 4096,
    exact: bool = False,
):
    """k smallest squared distances from each query to the masked refs.

    Args:
      query_xyz: (Q, 3) float32.
      ref_xyz:   (M, 3) float32; M must be a multiple of ref_tile (pad).
      ref_mask:  (M,) bool — invalid refs never match.
      k:         neighbours per query.
      ref_tile:  reference tile width per scan step.
      exact:     use exact per-tile top-k.  The default uses
                 ``lax.approx_min_k`` (the TPU-optimized partial
                 reduction; ~10× faster than exact top-k at tile width
                 4096) with its default 0.95 recall — an approximation
                 in the same spirit as the reference's approximate
                 FLANN KD-tree searches.

    Returns:
      sq_dists: (Q, k) float32, ascending; BIG where fewer than k valid refs.
      indices:  (Q, k) int32 into ref_xyz; arbitrary where sq_dists==BIG.
    """
    q = query_xyz.astype(jnp.float32)
    m = ref_xyz.shape[0]
    if m <= ref_tile:
        ref_tile = m
    elif m % ref_tile != 0:
        pad = ref_tile - m % ref_tile
        ref_xyz = jnp.pad(ref_xyz, ((0, pad), (0, 0)))
        ref_mask = jnp.pad(ref_mask, (0, pad))
        m += pad
    n_tiles = m // ref_tile
    nq = q.shape[0]

    q2 = jnp.sum(q * q, axis=-1, keepdims=True)  # (Q, 1)
    ref = ref_xyz.astype(jnp.float32).reshape(n_tiles, ref_tile, 3)
    ref2 = jnp.sum(ref * ref, axis=-1) + jnp.where(
        ref_mask.reshape(n_tiles, ref_tile), 0.0, BIG
    )  # (T, tile)

    init = (
        jnp.full((nq, k), BIG, jnp.float32),
        jnp.zeros((nq, k), jnp.int32),
    )

    def step(carry, inp):
        best_d, best_i = carry
        tile_idx, ref_t, ref2_t = inp
        # (Q, tile) distance block — MXU matmul with f32 accumulation.
        cross = lax.dot_general(
            q, ref_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=lax.Precision.HIGHEST,
        )
        d = q2 + ref2_t[None, :] - 2.0 * cross
        # Per-tile k smallest, then an exact merge with the carry over
        # just 2k candidates.
        if exact or ref_tile <= 2 * k:
            neg_tile, pos = lax.top_k(-d, k)
            tile_d = -neg_tile
        else:
            tile_d, pos = lax.approx_min_k(d, k)
        tile_i = tile_idx * ref_tile + pos.astype(jnp.int32)
        cand_d = jnp.concatenate([best_d, tile_d], axis=1)
        cand_i = jnp.concatenate([best_i, tile_i], axis=1)
        neg_top, top_pos = lax.top_k(-cand_d, k)
        new_i = jnp.take_along_axis(cand_i, top_pos, axis=1)
        return (-neg_top, new_i), None

    (best_d, best_i), _ = lax.scan(
        step, init, (jnp.arange(n_tiles, dtype=jnp.int32), ref, ref2)
    )
    best_d = jnp.maximum(best_d, 0.0)  # numerical floor: ‖·‖² ≥ 0
    return best_d, best_i
