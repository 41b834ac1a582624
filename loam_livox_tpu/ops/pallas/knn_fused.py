"""Fused kNN Pallas kernel: distance computation + binned-min reduction
in one pass over VMEM-resident tiles — the hand-tiled fast path for the
reference's per-point KD-tree hot loop
(``source/point_cloud_registration.hpp:249,351``).

Why the previous Pallas attempt (`ops.pallas_knn`, round 1) lost to the
dense XLA path everywhere: it ran k iterative min-extractions per
(query, ref-tile) block plus a 2k merge — ~20 VPU passes over every
distance block.  The dense path's real cost is HBM: it materializes the
(Q, M) distance matrix and `approx_min_k` reads it back (2 × Q·M·4
bytes ≈ 1 GB at the odometry working set).

This kernel keeps the dense path's cheap reduction and removes the HBM
traffic:

* one MXU matmul per (query tile, ref tile) produces the distance block
  in VMEM (``q4 = (−2x, −2y, −2z, 1)``, ``ref4 = (x, y, z, ‖r‖² +
  mask_penalty)`` ⇒ ``‖r‖² − 2⟨q, r⟩``; the query's ‖q‖² shifts every
  candidate of a row equally and is added outside),
* the block folds into a per-query RUNNING BINNED MIN held in VMEM
  scratch: bin = ref_index mod L.  That is `approx_min_k`'s own
  reduction strategy (partial reduce into L bins, ~3 VPU passes per
  block) — fused with the distance computation instead of run over a
  materialized matrix,
* only the (Q, L) bin minima + argmin indices leave the kernel; an
  exact `top_k` over the L bins finishes the job outside (Q × L is
  ~500× smaller than Q × M).

Recall: identical in structure to `approx_min_k` with L bins — a true
neighbor is lost only when two of the k nearest collide in the same
index-mod-L bin.  The matching buffer is voxel-sort ordered, so spatial
neighbors tend to have nearby indices, which mod-L separates; measured
recall vs exact on voxel-sorted references is 0.9992 at the default
L = 256 (0.977 at L = 128 — see tests/test_pallas_knn.py; the dense
engine's `approx_min_k` at recall_target 0.99 is the accepted
baseline).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30


def _kernel(counts_ref, q4_ref, ref4_ref, out_d_ref, out_i_ref,
            run_d, run_i, *, qt: int, rt: int, bins: int, engine: str):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        run_d[:] = jnp.full(run_d.shape, BIG, jnp.float32)
        run_i[:] = jnp.zeros(run_i.shape, jnp.int32)

    # Tile skipping (the structural advantage over the dense engine):
    # XLA's static shapes force the dense matmul to crunch the FULL
    # padded capacity every call, but the matching buffer is typically
    # a small valid prefix of it (measured ~1-5% full on bounded
    # scenes).  The prefetched counts bound the valid prefix of each
    # axis; tiles entirely beyond them contribute nothing (their mask
    # penalty is BIG) and are skipped outright.
    active = jnp.logical_and(j * rt < counts_ref[0],
                             i * qt < counts_ref[1])

    @pl.when(active)
    def _():
        # (QT, RT) distance block: ‖r‖² − 2⟨q, r⟩ (+ mask penalty).
        # Selection precision matters: single-pass bf16 has absolute
        # error ~|q||r|·2⁻⁸ (≈ 1-3 m² at ±20 m coordinates), larger
        # than the near-neighbor distance gaps ICP correspondence rides
        # on — measured selection recall collapses to 0.46.  Mosaic
        # lowers only DEFAULT/HIGHEST dot precision, so the two
        # exact-enough paths are a 6-pass f32 MXU contraction ('mxu')
        # or K=3 explicit VPU broadcast multiply-adds in f32 ('vpu') —
        # the contraction depth is 4, so the VPU formulation costs ~6
        # elementwise passes and no MXU padding waste.  The returned
        # DISTANCES are additionally rescored in exact f32 outside the
        # kernel (O(Q·k)).
        if engine == "mxu":
            d = lax.dot_general(
                q4_ref[:], ref4_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)
        else:
            d = ref4_ref[3:4, :]                # ‖r‖² + mask penalty
            for c in range(3):
                d = d + q4_ref[:, c:c + 1] * ref4_ref[c:c + 1, :]
        n_groups = rt // bins

        # Binned min + argmin over lane-aligned (QT, L) column groups.
        # NOTE: a (QT, RT) → (QT, G, L) reshape would express this in
        # two reductions, but that shape cast splits the lane dimension
        # — Mosaic either rejects it or mis-lowers it; the unrolled
        # static-slice min-tree lowers cleanly at the same ~2 VPU
        # passes.
        tile_min = d[:, :bins]
        for g in range(1, n_groups):
            tile_min = jnp.minimum(tile_min, d[:, g * bins:(g + 1) * bins])
        g_best = jnp.full((qt, bins), 2**30, jnp.int32)
        for g in range(n_groups):
            blk = d[:, g * bins:(g + 1) * bins]
            g_best = jnp.minimum(
                g_best, jnp.where(blk == tile_min, g, 2**30))
        b_iota = lax.broadcasted_iota(jnp.int32, (qt, bins), 1)
        tile_idx = j * rt + g_best * bins + b_iota           # global ref ids

        better = tile_min < run_d[:]
        run_d[:] = jnp.where(better, tile_min, run_d[:])
        run_i[:] = jnp.where(better, tile_idx, run_i[:])

    @pl.when(j == nj - 1)
    def _():
        out_d_ref[:] = run_d[:]
        out_i_ref[:] = run_i[:]


def build_ref4(ref_xyz: jax.Array, ref_mask: jax.Array,
               ref_tile: int = 2048) -> jax.Array:
    """Precompute the kernel's reference operand: a (4, Mp) array of
    (x, y, z, ‖r‖² + mask_penalty), padded to a `ref_tile` multiple.

    The transpose is a real relayout of the whole map — hoist it out of
    any loop whose reference set is fixed (the ICP outer loop searches
    the SAME matching buffer every iteration; rebuilding ref4 per
    iteration measurably costs more than the kernel itself)."""
    m = ref_xyz.shape[0]
    padm = (-m) % ref_tile
    ref = ref_xyz.astype(jnp.float32)
    mask = ref_mask
    if padm:
        ref = jnp.pad(ref, ((0, padm), (0, 0)))
        mask = jnp.pad(mask, (0, padm))
    r2 = jnp.sum(ref * ref, axis=-1) + jnp.where(mask, 0.0, BIG)
    return jnp.concatenate([ref, r2[:, None]], axis=1).T     # (4, Mp)


@partial(jax.jit,
         static_argnames=("k", "query_tile", "ref_tile", "bins", "engine",
                          "interpret"))
def knn_fused(
    query_xyz: jax.Array,
    ref_xyz: jax.Array,
    ref_mask: jax.Array,
    k: int = 5,
    query_tile: int = 256,
    ref_tile: int = 2048,
    bins: int = 256,
    engine: str = "vpu",
    interpret: bool | None = None,
    ref4: jax.Array | None = None,
    query_count: jax.Array | None = None,
):
    """Same contract as `ops.knn.knn`: (Q, k) ascending squared
    distances (BIG where fewer than k valid refs) + int32 indices.

    `bins` is the approx-min bin count (recall knob — see module doc);
    must divide `ref_tile` and satisfy bins ≥ k.  `engine` picks the
    distance-block formulation: 'vpu' (f32 broadcast multiply-adds) or
    'mxu' (6-pass f32 contraction) — see the kernel comment.
    `interpret=None` auto-selects: compiled on TPU, interpreter
    elsewhere (Mosaic kernels have no compiled CPU path).
    Pass a precomputed `ref4` (`build_ref4`) when searching the same
    reference set repeatedly.  `query_count` (traced int scalar) bounds
    the valid-query prefix — query tiles beyond it are skipped and
    return BIG (callers that compact their queries, e.g. voxel-filter
    outputs, get the win for free; None = all queries valid).
    """
    assert ref_tile % bins == 0 and bins >= k
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q = query_xyz.astype(jnp.float32)
    nq = q.shape[0]
    m = ref_xyz.shape[0]
    padq = (-nq) % query_tile
    if padq:
        q = jnp.pad(q, ((0, padq), (0, 0)))
    if ref4 is None:
        ref4 = build_ref4(ref_xyz, ref_mask, ref_tile)

    q4 = jnp.concatenate(
        [-2.0 * q, jnp.ones((q.shape[0], 1), jnp.float32)], axis=1)

    qp, mp = q4.shape[0], ref4.shape[1]
    grid = (qp // query_tile, mp // ref_tile)

    # valid-prefix bounds for tile skipping: every tile fully beyond
    # the LAST valid reference (exact for arbitrary masks) or beyond
    # the caller's query count contributes nothing
    iot = jnp.arange(ref_mask.shape[0], dtype=jnp.int32)
    n_ref = jnp.max(jnp.where(ref_mask, iot + 1, 0)).astype(jnp.int32)
    n_q = (jnp.int32(qp) if query_count is None
           else jnp.asarray(query_count, jnp.int32))
    counts = jnp.stack([n_ref, n_q])

    # beyond-prefix grid steps re-fetch tile 0 (skipped anyway — no DMA
    # of dead padding)
    def q_map(i, j, cnt):
        return (lax.min(i, lax.max(cnt[1] - 1, 0) // query_tile), 0)

    def r_map(i, j, cnt):
        return (0, lax.min(j, lax.max(cnt[0] - 1, 0) // ref_tile))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((query_tile, 4), q_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, ref_tile), r_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((query_tile, bins), lambda i, j, cnt: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, bins), lambda i, j, cnt: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((query_tile, bins), jnp.float32),
            pltpu.VMEM((query_tile, bins), jnp.int32),
        ],
    )
    out_d, out_i = pl.pallas_call(
        partial(_kernel, qt=query_tile, rt=ref_tile, bins=bins,
                engine=engine),
        out_shape=(
            jax.ShapeDtypeStruct((qp, bins), jnp.float32),
            jax.ShapeDtypeStruct((qp, bins), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(counts, q4, ref4)

    # exact top-k over the L bin minima (Q × L, tiny)
    neg, pos = lax.top_k(-out_d, k)                          # (Qp, k)
    kvals = -neg
    idx = jnp.clip(jnp.take_along_axis(out_i, pos, axis=1), 0, m - 1)
    # exact f32 rescoring of the selected pairs (see kernel comment);
    # gather ROWS of the original (M, 3) array — a column gather from
    # the transposed ref4 would stride the lane axis (measured 6×
    # end-to-end slowdown)
    sel = ref_xyz.astype(jnp.float32)[idx]                   # (Qp, k, 3)
    d_exact = jnp.sum((q[:, None, :] - sel) ** 2, axis=-1)
    vals = jnp.where(kvals < BIG * 0.5, d_exact, BIG)
    order = jnp.argsort(vals, axis=1)                        # k=5: tiny
    vals = jnp.take_along_axis(vals, order, axis=1)
    idx = jnp.take_along_axis(idx, order, axis=1)
    return vals[:nq], idx[:nq].astype(jnp.int32)
