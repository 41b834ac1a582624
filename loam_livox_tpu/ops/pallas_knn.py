"""Fused kNN Pallas kernel — the hand-tiled version of `ops.knn.knn`.

The XLA formulation materializes a (query_tile × M) distance block in
HBM and reduces it with `approx_min_k`; at the odometry working set
(4096 × 131k) that is ~2 GB of HBM traffic per search and the searches
dominate the ICP iteration (SURVEY.md §3.2 hot loop).

This kernel never leaves VMEM: for each (query-tile, ref-tile) grid
cell it computes the distance block with one MXU matmul and folds it
into a per-query running top-k held in VMEM scratch, writing only the
final (Q, k) results to HBM.

Trick: with ``q4 = (−2x, −2y, −2z, 1)`` and ``ref4 = (x, y, z,
‖r‖² + mask_penalty)`` one matmul yields ``‖r‖² − 2⟨q, r⟩`` directly;
the query's own ‖q‖² is added outside the kernel (it shifts every
candidate of a row equally, so selection is unaffected).

Top-k inside the kernel is k iterative min-extractions (min → first
matching column → mask), then a 2k-candidate merge with the running
set — all VPU reductions on VMEM-resident blocks.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
INT_BIG = 2**31 - 1


def _extract_min(d, col, k):
    """k iterative min-extractions: returns ((R, k) vals, (R, k) cols);
    `d` is consumed (masked with BIG as extracted)."""
    vals, cols = [], []
    for _ in range(k):
        v = jnp.min(d, axis=1, keepdims=True)              # (R, 1)
        cand = jnp.where(d == v, col, INT_BIG)
        c = jnp.min(cand, axis=1, keepdims=True)           # first match
        d = jnp.where(col == c, BIG, d)
        vals.append(v)
        cols.append(c)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(cols, axis=1)


def _knn_kernel(q4_ref, ref4_ref, out_d_ref, out_i_ref, run_d, run_i, *,
                k: int, rt: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        run_d[:] = jnp.full(run_d.shape, BIG, jnp.float32)
        run_i[:] = jnp.zeros(run_i.shape, jnp.int32)

    d = lax.dot_general(
        q4_ref[:], ref4_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (QT, RT)
    qt = d.shape[0]
    col_local = lax.broadcasted_iota(jnp.int32, (qt, rt), 1)
    block_d, block_c = _extract_min(d, col_local, k)
    block_c = block_c + j * rt                              # global ref ids

    # merge running k with block k
    cd = jnp.concatenate([run_d[:], block_d], axis=1)       # (QT, 2k)
    ci = jnp.concatenate([run_i[:], block_c], axis=1)
    mcol = lax.broadcasted_iota(jnp.int32, (qt, 2 * k), 1)
    new_d, new_c = _extract_min(cd, mcol, k)
    # gather merged ids: exactly one slot per selected column
    picks = []
    for p in range(k):
        sel = mcol == new_c[:, p:p + 1]
        picks.append(jnp.sum(jnp.where(sel, ci, 0), axis=1, keepdims=True))
    run_d[:] = new_d
    run_i[:] = jnp.concatenate(picks, axis=1)

    @pl.when(j == nj - 1)
    def _():
        out_d_ref[:] = run_d[:]
        out_i_ref[:] = run_i[:]


@partial(jax.jit, static_argnames=("k", "query_tile", "ref_tile", "interpret"))
def knn_pallas(
    query_xyz: jax.Array,
    ref_xyz: jax.Array,
    ref_mask: jax.Array,
    k: int = 5,
    query_tile: int = 256,
    ref_tile: int = 512,
    interpret: bool = False,
):
    """Same contract as `ops.knn.knn` (exact k smallest, BIG-padded)."""
    q = query_xyz.astype(jnp.float32)
    nq = q.shape[0]
    m = ref_xyz.shape[0]
    padq = (-nq) % query_tile
    padm = (-m) % ref_tile
    if padq:
        q = jnp.pad(q, ((0, padq), (0, 0)))
    ref = ref_xyz.astype(jnp.float32)
    mask = ref_mask
    if padm:
        ref = jnp.pad(ref, ((0, padm), (0, 0)))
        mask = jnp.pad(mask, (0, padm))

    q4 = jnp.concatenate([-2.0 * q, jnp.ones((q.shape[0], 1), jnp.float32)],
                         axis=1)                            # (Qp, 4)
    r2 = jnp.sum(ref * ref, axis=-1) + jnp.where(mask, 0.0, BIG)
    ref4 = jnp.concatenate([ref, r2[:, None]], axis=1).T    # (4, Mp)

    qp, mp = q4.shape[0], ref4.shape[1]
    grid = (qp // query_tile, mp // ref_tile)

    out_d, out_i = pl.pallas_call(
        partial(_knn_kernel, k=k, rt=ref_tile),
        out_shape=(
            jax.ShapeDtypeStruct((qp, k), jnp.float32),
            jax.ShapeDtypeStruct((qp, k), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((query_tile, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, ref_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((query_tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((query_tile, k), jnp.float32),
            pltpu.VMEM((query_tile, k), jnp.int32),
        ],
        interpret=interpret,
    )(q4, ref4)

    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    out_d = jnp.where(out_d < BIG * 0.5, out_d + q2, out_d)
    out_d = jnp.maximum(out_d[:nq], 0.0)
    return out_d, jnp.clip(out_i[:nq], 0, m - 1)
