"""Sharded hot primitives: map-sharded kNN and psum-reduced normal
equations, written with `shard_map` so the collectives are explicit
(the scaling-book recipe: shard the big axis, reduce small results over
ICI).

These are the multi-chip versions of the two dominant costs in the
scan-to-map ICP (SURVEY.md §3.2 hot loops):

* `knn_sharded` — the reference's per-point KD-tree searches
  (``point_cloud_registration.hpp:249,351``) become: each device holds
  ``M/n`` map points, computes an exact/approx local top-k for ALL
  queries against its shard (MXU matmuls), then the ``(n, Q, k)``
  candidates are all-gathered (k ≪ tile, so the collective is tiny)
  and merged with one exact top-k over ``n·k`` candidates.
* `normal_system_psum` — per-shard Huber-weighted ``J^T J`` (6×6) and
  ``J^T r`` (6,) built from the local residual shard, `psum`-reduced —
  the "distributed Schur/Hessian reduction" of BASELINE.json.  The
  collective payload is 42 floats per solve iteration regardless of
  residual count — this is why residual sharding scales.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from .mesh import SHARD_AXIS
from ..ops.knn import knn as knn_local


def knn_sharded(
    query_xyz: jax.Array,
    ref_xyz: jax.Array,
    ref_mask: jax.Array,
    mesh: Mesh,
    k: int = 5,
    axis: str = SHARD_AXIS,
    ref_tile: int = 4096,
):
    """kNN with the reference points sharded over `mesh` along `axis`.

    ref_xyz (M, 3) must have M divisible by the mesh size.  Queries are
    replicated.  Returns replicated (sq_dists (Q, k), indices (Q, k))
    identical (up to approx_min_k recall) to the single-device `knn`.
    """
    n = mesh.shape[axis]
    m = ref_xyz.shape[0]
    assert m % n == 0, f"ref count {m} not divisible by mesh size {n}"
    shard_m = m // n

    def local(q, ref, mask):
        # q: (Q, 3) replicated; ref: (M/n, 3); mask: (M/n,)
        d, i = knn_local(q, ref, mask, k=k)
        base = lax.axis_index(axis) * shard_m
        cand_d = lax.all_gather(d, axis)            # (n, Q, k)
        cand_i = lax.all_gather(i + base, axis)     # (n, Q, k)
        nq = q.shape[0]
        cd = jnp.moveaxis(cand_d, 0, 1).reshape(nq, n * k)
        ci = jnp.moveaxis(cand_i, 0, 1).reshape(nq, n * k)
        neg, pos = lax.top_k(-cd, k)
        return -neg, jnp.take_along_axis(ci, pos, axis=1)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        # the local knn's scan carry starts replicated and becomes
        # device-varying; skip the varying-axes check
        check_vma=False,
    )
    return fn(query_xyz, ref_xyz, ref_mask)


def normal_system_psum(
    residual_jac_fn: Callable[[jax.Array], Tuple[jax.Array, jax.Array, jax.Array]],
    shard_ids: jax.Array,
    mesh: Mesh,
    axis: str = SHARD_AXIS,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """psum-reduced normal equations over a sharded residual set.

    `residual_jac_fn(idx_shard)` must return, for the residual-block
    ids it is given, ``(r (B, 3), J (B, 3, 6), w (B,))`` — weighted
    residuals, Jacobians, and (Huber × validity) weights.  `shard_ids`
    (N,) is the global residual index set, sharded along `axis`.

    Returns replicated ``(H (6, 6), g (6,), cost ())``.
    """

    def local(ids):
        r, J, w = residual_jac_fn(ids)
        sw = jnp.sqrt(w)
        rw = r * sw[:, None]
        Jw = J * sw[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, Jw,
                       precision=lax.Precision.HIGHEST)
        g = jnp.einsum("nij,ni->j", Jw, rw,
                       precision=lax.Precision.HIGHEST)
        c = jnp.sum(rw * rw)
        return (lax.psum(H, axis), lax.psum(g, axis), lax.psum(c, axis))

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),),
        out_specs=(P(), P(), P()),
    )
    return fn(shard_ids)
