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

* the reference axis is processed in `bins`-wide column groups; each
  group's distance block (``q4 = (−2x, −2y, −2z, 1)``, ``ref4 = (x, y,
  z, ‖r‖² + mask_penalty)`` ⇒ ``‖r‖² − 2⟨q, r⟩``; the query's ‖q‖²
  shifts every candidate of a row equally and is added outside) folds
  into a per-query RUNNING BINNED MIN held in VMEM scratch: bin =
  ref_index mod L.  That is `approx_min_k`'s own reduction strategy
  (partial reduce into L bins) — fused with the distance computation
  instead of run over a materialized matrix,
* only the (Q, L) bin minima + argmin indices leave the kernel; an
  exact `top_k` over the L bins finishes the job outside (Q × L is
  ~500× smaller than Q × M).

GEOMETRIC GROUP SKIPPING (the KD-tree's pruning, recovered): the
matching buffer is voxel-sort ordered, so a contiguous run of reference
indices is spatially compact.  `build_ref_operand` precomputes each
`bins`-wide group's bounding box; the caller may pass ``max_radius``
(ICP passes its correspondence gate, ``maximum_dis_*_for_match``), and
any group whose box is farther than that radius from the query tile's
box is skipped outright — the KD-tree's branch-and-bound, re-expressed
at tile granularity.  Exactness: a skipped reference is > max_radius
from EVERY query in the tile, so it can never appear among neighbors
within the gate; ICP's target builders discard any block whose k-th
neighbor exceeds the gate, so the built targets are IDENTICAL to the
unskipped kernel's (a block whose true k-th neighbor lies beyond the
gate stays invalid either way).  Queries in a far tile simply get BIG
distances, exactly like the fewer-than-k-valid-refs case.

Recall: identical in structure to `approx_min_k` with L bins — a true
neighbor is lost only when two of the k nearest collide in the same
index-mod-L bin.  The voxel-sort order makes spatial neighbors
index-adjacent, which mod-L separates; measured recall vs exact on
voxel-sorted references is 0.9992 at the default L = 256 (0.977 at
L = 128 — see tests/test_pallas_knn.py; the dense engine's
`approx_min_k` at recall_target 0.99 is the accepted baseline).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30


class RefOperand(NamedTuple):
    """Precomputed kernel operands for a fixed reference set."""
    ref4: jax.Array     # (4, Mp) — (x, y, z, ‖r‖² + mask_penalty)
    boxes: jax.Array    # (Mp // bins, 8) — per-group [lo_xyz, _, hi_xyz, _]


def _kernel(counts_ref, q4_ref, ref4_ref, qbox_ref, rbox_ref,
            out_d_ref, out_i_ref, run_d, run_i,
            *, qt: int, rt: int, bins: int, engine: str,
            radius2: float | None):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        run_d[:] = jnp.full(run_d.shape, BIG, jnp.float32)
        run_i[:] = jnp.zeros(run_i.shape, jnp.int32)

    # Prefix tile skipping: tiles fully beyond the last valid reference
    # or beyond the caller's query count contribute nothing (their mask
    # penalty is BIG) and are skipped outright.
    active = jnp.logical_and(j * rt < counts_ref[0],
                             i * qt < counts_ref[1])

    @pl.when(active)
    def _():
        n_groups = rt // bins
        b_iota = lax.broadcasted_iota(jnp.int32, (qt, bins), 1)
        # Unrolled loop over `bins`-wide reference column groups; each
        # group is guarded by the box–box distance test when a radius
        # gate is set (geometric group skipping, see module doc).
        for g in range(n_groups):
            if radius2 is not None:
                # box–box squared distance (scalar, from SMEM boxes —
                # whole arrays, indexed by the grid position: Mosaic
                # rejects sub-(8, 128) VMEM/SMEM blocks)
                gg = j * n_groups + g
                d2 = jnp.float32(0.0)
                for c in range(3):
                    rlo = rbox_ref[gg, c]
                    rhi = rbox_ref[gg, 4 + c]
                    qlo = qbox_ref[i, c]
                    qhi = qbox_ref[i, 4 + c]
                    gap = jnp.maximum(jnp.maximum(rlo - qhi, qlo - rhi),
                                      0.0)
                    d2 = d2 + gap * gap
                near = d2 <= radius2
            else:
                near = jnp.bool_(True)

            @pl.when(near)
            def _(g=g):
                sl = slice(g * bins, (g + 1) * bins)
                # (QT, bins) distance block.  Selection precision
                # matters: single-pass bf16 has absolute error
                # ~|q||r|·2⁻⁸ (≈ 1-3 m² at ±20 m coordinates), larger
                # than the near-neighbor distance gaps ICP
                # correspondence rides on — measured selection recall
                # collapses to 0.46.  Mosaic lowers only
                # DEFAULT/HIGHEST dot precision, so the two
                # exact-enough paths are a 6-pass f32 MXU contraction
                # ('mxu') or K=3 explicit VPU broadcast multiply-adds
                # in f32 ('vpu') — the contraction depth is 4, so the
                # VPU formulation costs ~6 elementwise passes and no
                # MXU padding waste.  The returned DISTANCES are
                # additionally rescored in exact f32 outside the
                # kernel (O(Q·k)).
                if engine == "mxu":
                    d = lax.dot_general(
                        q4_ref[:], ref4_ref[:, sl],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
                else:
                    d = ref4_ref[3:4, sl]           # ‖r‖² + mask penalty
                    for c in range(3):
                        d = d + q4_ref[:, c:c + 1] * ref4_ref[c:c + 1, sl]
                idx = j * rt + g * bins + b_iota     # global ref ids
                better = d < run_d[:]
                run_d[:] = jnp.where(better, d, run_d[:])
                run_i[:] = jnp.where(better, idx, run_i[:])

    @pl.when(j == nj - 1)
    def _():
        out_d_ref[:] = run_d[:]
        out_i_ref[:] = run_i[:]


def build_ref_operand(ref_xyz: jax.Array, ref_mask: jax.Array,
                      ref_tile: int = 2048, bins: int = 256) -> RefOperand:
    """Precompute the kernel's reference operands: the (4, Mp) relayout
    of (x, y, z, ‖r‖² + mask_penalty), padded to a `ref_tile` multiple,
    plus per-`bins`-group bounding boxes for geometric skipping
    (invalid/padding points contribute ±inf, so an all-invalid group's
    box distance is +inf and the group always skips).

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
    ref4 = jnp.concatenate([ref, r2[:, None]], axis=1).T     # (4, Mp)

    mp = ref.shape[0]
    grp = ref.reshape(mp // bins, bins, 3)
    gmask = mask.reshape(mp // bins, bins, 1)
    lo = jnp.min(jnp.where(gmask, grp, jnp.inf), axis=1)     # (G, 3)
    hi = jnp.max(jnp.where(gmask, grp, -jnp.inf), axis=1)
    pad = jnp.zeros((mp // bins, 1), jnp.float32)
    boxes = jnp.concatenate([lo, pad, hi, pad], axis=1)      # (G, 8)
    return RefOperand(ref4=ref4, boxes=boxes)


def build_ref4(ref_xyz: jax.Array, ref_mask: jax.Array,
               ref_tile: int = 2048) -> jax.Array:
    """Back-compat wrapper: the (4, Mp) operand only."""
    return build_ref_operand(ref_xyz, ref_mask, ref_tile).ref4


@partial(jax.jit,
         static_argnames=("k", "query_tile", "ref_tile", "bins", "engine",
                          "interpret", "max_radius"))
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
    ref4: jax.Array | RefOperand | None = None,
    query_count: jax.Array | None = None,
    max_radius: float | None = None,
):
    """Same contract as `ops.knn.knn`: (Q, k) ascending squared
    distances (BIG where fewer than k valid refs) + int32 indices.

    `bins` is the approx-min bin count (recall knob — see module doc);
    must divide `ref_tile` and satisfy bins ≥ k.  `engine` picks the
    distance-block formulation: 'vpu' (f32 broadcast multiply-adds) or
    'mxu' (6-pass f32 contraction) — see the kernel comment.
    `interpret=None` auto-selects: compiled on TPU, interpreter
    elsewhere (Mosaic kernels have no compiled CPU path).
    Pass a precomputed `ref4` (`build_ref_operand`; a bare ref4 array
    from `build_ref4` is accepted when ``max_radius`` is None) when
    searching the same reference set repeatedly.  `query_count` (traced
    int scalar) bounds the valid-query prefix — query tiles beyond it
    are skipped and return BIG (callers that compact their queries,
    e.g. voxel-filter outputs, get the win for free; None = all queries
    valid).  ``max_radius``: when set, reference groups farther than
    this (meters, unsquared) from a query tile's bounding box are
    skipped — neighbors beyond it may be reported as BIG, so pass a
    radius no smaller than the caller's own correspondence gate.
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
        ref4 = build_ref_operand(ref_xyz, ref_mask, ref_tile, bins)
    if isinstance(ref4, RefOperand):
        rboxes = ref4.boxes
        ref4 = ref4.ref4
    else:
        assert max_radius is None, (
            "max_radius needs the group boxes — pass a RefOperand from "
            "build_ref_operand, not a bare ref4 array")
        rboxes = jnp.zeros((ref4.shape[1] // bins, 8), jnp.float32)

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

    # per-query-tile bounding boxes (rows beyond the valid prefix
    # contribute ±inf ⇒ an all-invalid tile's box never comes near)
    qv = (jnp.arange(qp, dtype=jnp.int32) < n_q)[:, None]
    qg = q.reshape(qp // query_tile, query_tile, 3)
    qgv = qv.reshape(qp // query_tile, query_tile, 1)
    qlo = jnp.min(jnp.where(qgv, qg, jnp.inf), axis=1)
    qhi = jnp.max(jnp.where(qgv, qg, -jnp.inf), axis=1)
    qpad = jnp.zeros((qp // query_tile, 1), jnp.float32)
    qboxes = jnp.concatenate([qlo, qpad, qhi, qpad], axis=1)  # (NI, 8)

    # beyond-prefix grid steps re-fetch tile 0 (skipped anyway — no DMA
    # of dead padding)
    def q_map(i, j, cnt):
        return (lax.min(i, lax.max(cnt[1] - 1, 0) // query_tile), 0)

    def r_map(i, j, cnt):
        return (0, lax.min(j, lax.max(cnt[0] - 1, 0) // ref_tile))

    groups_per_tile = ref_tile // bins
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((query_tile, 4), q_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, ref_tile), r_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # qboxes, whole
            pl.BlockSpec(memory_space=pltpu.SMEM),   # rboxes, whole
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
                engine=engine,
                radius2=(None if max_radius is None
                         else float(max_radius) ** 2)),
        out_shape=(
            jax.ShapeDtypeStruct((qp, bins), jnp.float32),
            jax.ShapeDtypeStruct((qp, bins), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(counts, q4, ref4, qboxes, rboxes)

    # exact top-k over the L bin minima (Q × L, tiny).  k iterative
    # min-extractions instead of `lax.top_k`: the generic top-k
    # lowering sorts each row — measured as the dominant POST-kernel
    # cost once geometric skipping shrank the kernel itself; k·3 VPU
    # passes over (Q, L) are ~free.
    bin_iota = lax.broadcasted_iota(jnp.int32, out_d.shape, 1)
    d_work = out_d
    kv, ki = [], []
    for _ in range(k):
        am = jnp.argmin(d_work, axis=1)                      # (Qp,)
        kv.append(jnp.min(d_work, axis=1))
        ki.append(jnp.take_along_axis(out_i, am[:, None], axis=1)[:, 0])
        d_work = jnp.where(bin_iota == am[:, None], BIG, d_work)
    kvals = jnp.stack(kv, axis=1)                            # (Qp, k)
    idx = jnp.clip(jnp.stack(ki, axis=1), 0, m - 1)
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
