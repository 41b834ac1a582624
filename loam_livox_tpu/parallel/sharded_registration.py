"""Distributed scan-to-map registration: one GN/LM iteration with the
frame's residual set sharded across the device mesh.

This is the multi-chip layout SURVEY.md §5.7 prescribes (and
BASELINE.json's "per-block Hessians reduced via psum"): each device
holds 1/n of the frame's feature points, searches correspondences
against the (replicated) matching buffer with its local MXU kNN, builds
its partial Huber-weighted J^T J / J^T r, and the 6×6 system crosses
the mesh as one `psum` (42 floats/iteration).  The pose update is
computed redundantly on every device — cheaper than broadcasting.

The single-chip `registration.icp.register_frame` remains the fast path
(a frame's ~5k residuals underfill one chip); this module is the
scale-out path for many-frame batches or very dense frames, and the
mechanism the driver's multichip dryrun validates.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..core import se3
from ..core.types import PointBatch
from ..ops.knn import knn
from ..registration import residuals as res
from .mesh import SHARD_AXIS

shard_map = jax.shard_map


def sharded_gn_iteration(
    frame_surface: PointBatch,
    map_surface: PointBatch,
    q_incre: jax.Array,
    t_incre: jax.Array,
    q_last: jax.Array,
    t_last: jax.Array,
    mesh: Mesh,
    huber_delta: float = 0.1,
    max_dis_sq: float = 50.0,
    k: int = 5,
    axis: str = SHARD_AXIS,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One sharded point-to-plane GN iteration.

    frame_surface is sharded along the point axis over `mesh`;
    map_surface is replicated.  Returns (q_new, t_new, cost) —
    replicated.
    """
    n = mesh.shape[axis]
    npts = frame_surface.xyz.shape[0]
    assert npts % n == 0, f"frame points {npts} not divisible by mesh {n}"

    def local(fx, fm, mx, mm):
        # fx: (N/n, 3) local frame shard; mx: (M, 3) replicated map
        pw = res.transform_points_incre(
            q_incre, t_incre, fx, jnp.ones(fx.shape[0]), q_last, t_last,
            deblur=False)
        sd, si = knn(pw, mx, mm, k=k,
                     exact=jax.default_backend() != "tpu")
        tgt = res.build_plane_targets(sd, si, mx, fm, max_dis_sq)
        r = res.plane_residuals(q_incre, t_incre, fx,
                                jnp.ones(fx.shape[0]), tgt,
                                q_last, t_last, deblur=False)
        pw_jac = res.point_world_jacobian(q_incre, t_incre, fx, q_last)
        J = res.plane_jacobian(pw_jac, tgt)
        s = jnp.sum(r * r, axis=-1)
        w = jnp.where(tgt.valid, res.huber_weight(s, huber_delta), 0.0)
        sw = jnp.sqrt(w)
        rw = r * sw[:, None]
        Jw = J * sw[:, None, None]
        H = lax.psum(jnp.einsum("nij,nik->jk", Jw, Jw,
                                precision=lax.Precision.HIGHEST), axis)
        g = lax.psum(jnp.einsum("nij,ni->j", Jw, rw,
                                precision=lax.Precision.HIGHEST), axis)
        c = lax.psum(jnp.sum(rw * rw), axis)
        return H, g, c

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    H, g, cost = fn(frame_surface.xyz, frame_surface.mask,
                    map_surface.xyz, map_surface.mask)

    damped = H + 1e-4 * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
    dd = jnp.linalg.solve(damped, -g)
    q_new = se3.quat_normalize(
        se3.quat_multiply(se3.quat_exp(dd[:3]), q_incre))
    t_new = t_incre + dd[3:]
    return q_new, t_new, cost


@partial(jax.jit, static_argnames=("mesh", "iterations", "axis"))
def sharded_registration(
    frame_surface: PointBatch,
    map_surface: PointBatch,
    q_last: jax.Array,
    t_last: jax.Array,
    mesh: Mesh,
    iterations: int = 5,
    axis: str = SHARD_AXIS,
):
    """Fixed-iteration sharded point-to-plane registration."""
    def body(carry, _):
        q, t = carry
        q2, t2, c = sharded_gn_iteration(
            frame_surface, map_surface, q, t, q_last, t_last, mesh,
            axis=axis)
        return (q2, t2), c

    (q, t), costs = lax.scan(
        body, (se3.quat_identity(), jnp.zeros(3, jnp.float32)), None,
        length=iterations)
    return q, t, costs
