"""Grid-hash bucketed kNN — the spatial-search structure that replaces
the reference's KD-trees (SURVEY.md §7.4 hard part 1).

The matching buffer's points are binned into a sorted directory of
voxel buckets (same sorted-integer-key design as `map.cell_map`); a
5-NN query then inspects only the 27 buckets around the query point —
a few hundred candidates instead of the full map, turning the
correspondence search from bandwidth-bound dense matmuls into small
gathers + one small top-k.

Correctness domain: neighbors are found only within ±1 bucket
(≥ bucket_size in every direction).  With ``bucket_size ≥ 2.5×`` the
voxel-filter leaf of the stored points, a bucket holds ≤ ~15 points and
the 27-neighborhood always contains the true 5-NN when the map is
locally dense; in sparse regions far matches are missed — the same
regime the reference discards via its match-distance gates
(``point_cloud_registration.hpp:64-65``).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

BIG = jnp.float32(1e30)

_AXIS_BITS = 10
_AXIS_RANGE = 1 << _AXIS_BITS
_AXIS_OFFSET = _AXIS_RANGE // 2
EMPTY_KEY = jnp.int32(2**31 - 1)


class BucketGrid(NamedTuple):
    """Sorted bucket directory over a fixed point set."""

    bucket_size: jax.Array    # () float32
    keys: jax.Array           # (B,) int32 ascending, EMPTY_KEY = free
    pts: jax.Array            # (B, P, 3) float32
    src_idx: jax.Array        # (B, P) int32 — index into the source batch
    slot_mask: jax.Array      # (B, P) bool

    @property
    def n_buckets(self) -> int:
        return self.keys.shape[0]

    @property
    def bucket_cap(self) -> int:
        return self.pts.shape[1]


def _coords(xyz, size):
    return jnp.floor(xyz / size).astype(jnp.int32)


def _pack(coords):
    c = jnp.clip(coords + _AXIS_OFFSET, 0, _AXIS_RANGE - 1)
    return (c[..., 0] << (2 * _AXIS_BITS)) | (c[..., 1] << _AXIS_BITS) | c[..., 2]


@partial(jax.jit, static_argnames=("n_buckets", "bucket_cap"))
def build_bucket_grid(xyz: jax.Array, mask: jax.Array, bucket_size,
                      n_buckets: int, bucket_cap: int) -> BucketGrid:
    """Bin a masked point batch into the bucket directory.

    Bucket overflow (> bucket_cap points in one bucket) drops the
    excess deterministically (later points in sort order)."""
    n = xyz.shape[0]
    keys = jnp.where(mask, _pack(_coords(xyz, bucket_size)), EMPTY_KEY)

    order = jnp.argsort(keys)
    ks = keys[order]
    first = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]])
    first = first & (ks != EMPTY_KEY)
    bucket_of = jnp.cumsum(first.astype(jnp.int32)) - 1   # (n,)
    idx_all = jnp.arange(n)
    seg_start = lax.associative_scan(
        jnp.maximum, jnp.where(first, idx_all, 0))
    rank = idx_all - seg_start

    valid = (ks != EMPTY_KEY) & (bucket_of < n_buckets) & (rank < bucket_cap)
    flat = jnp.where(valid, bucket_of * bucket_cap + rank,
                     n_buckets * bucket_cap)

    dir_keys = jnp.full((n_buckets,), EMPTY_KEY, jnp.int32)
    dir_keys = dir_keys.at[jnp.where(first & (bucket_of < n_buckets),
                                     bucket_of, n_buckets)].set(
        ks, mode="drop")
    pts = jnp.zeros((n_buckets * bucket_cap, 3), jnp.float32).at[flat].set(
        xyz[order], mode="drop").reshape(n_buckets, bucket_cap, 3)
    src = jnp.zeros((n_buckets * bucket_cap,), jnp.int32).at[flat].set(
        order, mode="drop").reshape(n_buckets, bucket_cap)
    smask = jnp.zeros((n_buckets * bucket_cap,), bool).at[flat].set(
        valid, mode="drop").reshape(n_buckets, bucket_cap)

    return BucketGrid(bucket_size=jnp.float32(bucket_size), keys=dir_keys,
                      pts=pts, src_idx=src, slot_mask=smask)


_NEIGHBOR_OFFSETS = jnp.asarray(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1)
     for dz in (-1, 0, 1)], jnp.int32)           # (27, 3)


@partial(jax.jit, static_argnames=("k",))
def grid_knn(query_xyz: jax.Array, grid: BucketGrid, k: int = 5):
    """k nearest neighbors of each query within the 27-bucket
    neighborhood.  Returns (sq_dists (Q, k) ascending — BIG where fewer
    than k candidates — and source indices (Q, k))."""
    q = query_xyz.astype(jnp.float32)
    nq = q.shape[0]
    P = grid.bucket_cap

    qc = _coords(q, grid.bucket_size)                       # (Q, 3)
    nbr = qc[:, None, :] + _NEIGHBOR_OFFSETS[None, :, :]    # (Q, 27, 3)
    nkeys = _pack(nbr)                                       # (Q, 27)

    slot = jnp.searchsorted(grid.keys, nkeys)                # (Q, 27)
    slot = jnp.clip(slot, 0, grid.n_buckets - 1)
    found = grid.keys[slot] == nkeys                         # (Q, 27)

    cand_pts = grid.pts[slot]                                # (Q, 27, P, 3)
    cand_idx = grid.src_idx[slot]                            # (Q, 27, P)
    cand_ok = grid.slot_mask[slot] & found[:, :, None]       # (Q, 27, P)

    diff = cand_pts - q[:, None, None, :]
    d = jnp.sum(diff * diff, axis=-1)                        # (Q, 27, P)
    d = jnp.where(cand_ok, d, BIG).reshape(nq, 27 * P)
    cand_idx = cand_idx.reshape(nq, 27 * P)

    neg, pos = lax.top_k(-d, k)
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    return jnp.maximum(-neg, 0.0), idx
