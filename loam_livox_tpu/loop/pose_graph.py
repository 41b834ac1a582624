"""3D pose-graph optimization — TPU re-design of `Ceres_pose_graph_3d`
(reference: ``source/ceres_pose_graph_3d.hpp:198-352``).

Same problem: nodes are SE(3) poses, edges carry measured relative
poses; the residual per edge is the 6-vector

    [ q_a⁻¹(p_b − p_a) − t̂_ab ;  2 · vec(q̂_ab ⊗ (q_a⁻¹ q_b)⁻¹) ]

(reference `PoseGraph3dErrorTerm::operator()`, :216-242), the first
pose is gauge-fixed (:325-331), and the solve is damped Gauss–Newton.

TPU-native shape: all poses in two arrays (N, 4)/(N, 3), all edges
batched; the full Jacobian w.r.t. the stacked 6N tangent comes from
one `jacfwd` (6N forward passes of a single fused XLA program — at
keyframe counts, hundreds, this is a small dense problem and one
`jnp.linalg.solve` of (6N, 6N) beats any sparse machinery).  For
pod-scale graphs the edge set shards over the mesh and H reduces via
psum (`parallel.normal_system_psum` handles the same contraction).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core import se3


class PoseGraph(NamedTuple):
    q: jax.Array          # (N, 4) wxyz
    t: jax.Array          # (N, 3)
    node_mask: jax.Array  # (N,) bool
    edge_i: jax.Array     # (E,) int32 — begin node
    edge_j: jax.Array     # (E,) int32 — end node
    rel_q: jax.Array      # (E, 4) measured q_ab
    rel_t: jax.Array      # (E, 3) measured t_ab
    weight_t: jax.Array   # (E,) translation information weight (sqrt)
    weight_r: jax.Array   # (E,) rotation information weight (sqrt)
    edge_mask: jax.Array  # (E,) bool


def edge_residuals(g: PoseGraph, q: jax.Array, t: jax.Array) -> jax.Array:
    """(E, 6) weighted residuals (reference :216-242)."""
    qa = q[g.edge_i]
    qb = q[g.edge_j]
    ta = t[g.edge_i]
    tb = t[g.edge_j]
    qa_inv = se3.quat_conjugate(qa)
    p_ab = se3.quat_rotate(qa_inv, tb - ta)
    q_ab = se3.quat_multiply(qa_inv, qb)
    dq = se3.quat_multiply(g.rel_q, se3.quat_conjugate(q_ab))
    # canonicalize sign so the residual is continuous near identity
    dq = jnp.where(dq[:, :1] < 0, -dq, dq)
    r_t = (p_ab - g.rel_t) * g.weight_t[:, None]
    r_q = 2.0 * dq[:, 1:] * g.weight_r[:, None]
    r = jnp.concatenate([r_t, r_q], axis=-1)
    return jnp.where(g.edge_mask[:, None], r, 0.0)


@partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph(g: PoseGraph, iterations: int = 25):
    """Damped GN solve; pose 0 gauge-fixed (reference :325-331,
    ≤200 Ceres iterations of SPARSE_NORMAL_CHOLESKY — this dense GN
    converges in far fewer).

    Returns (q (N,4), t (N,3), final_cost)."""
    n = g.q.shape[0]

    def apply_delta(q0, t0, delta):
        d = delta.reshape(n, 6)
        q_new = se3.quat_normalize(
            se3.quat_multiply(se3.quat_exp(d[:, :3]), q0))
        return q_new, t0 + d[:, 3:]

    def res_of_delta(q0, t0, delta):
        q_new, t_new = apply_delta(q0, t0, delta)
        return edge_residuals(g, q_new, t_new).reshape(-1)

    def step(state, _):
        q0, t0, lam, cost0 = state
        zero = jnp.zeros(n * 6, jnp.float32)
        J = jax.jacfwd(lambda d: res_of_delta(q0, t0, d))(zero)  # (6E, 6N)
        r = res_of_delta(q0, t0, zero)
        H = J.T @ J   # (6N, 6N)
        gvec = J.T @ r
        # gauge fix node 0: unit diagonal rows/cols, zero gradient
        fix = jnp.arange(6)
        H = H.at[fix, :].set(0.0).at[:, fix].set(0.0)
        H = H.at[fix, fix].set(1.0)
        gvec = gvec.at[fix].set(0.0)
        damped = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(n * 6)
        delta = jnp.linalg.solve(damped, -gvec)
        q_new, t_new = apply_delta(q0, t0, delta)
        r_new = edge_residuals(g, q_new, t_new)
        cost_new = 0.5 * jnp.sum(r_new * r_new)
        accept = cost_new < cost0
        return (
            jnp.where(accept, q_new, q0),
            jnp.where(accept, t_new, t0),
            jnp.where(accept, lam * 0.3, lam * 5.0),
            jnp.minimum(cost_new, cost0),
        ), None

    r0 = edge_residuals(g, g.q, g.t)
    init = (g.q, g.t, jnp.float32(1e-4), 0.5 * jnp.sum(r0 * r0))
    (q, t, _, cost), _ = lax.scan(step, init, None, length=iterations)
    return q, t, cost


def build_odometry_chain(qs, ts, weight_t=1.0, weight_r=1.0,
                         capacity_edges=None):
    """Build a PoseGraph whose edges are consecutive odometry
    constraints from a pose sequence (the reference builds these as it
    records keyframes, `scene_alignment.hpp:97-129`)."""
    n = qs.shape[0]
    e = n - 1
    cap = capacity_edges or e
    qa = qs[:-1]
    qb = qs[1:]
    rel_q = se3.quat_multiply(se3.quat_conjugate(qa), qb)
    rel_t = se3.quat_rotate(se3.quat_conjugate(qa), ts[1:] - ts[:-1])

    def pad(a, fill=0):
        if cap == e:
            return a
        return jnp.concatenate(
            [a, jnp.full((cap - e,) + a.shape[1:], fill, a.dtype)])

    return PoseGraph(
        q=qs, t=ts,
        node_mask=jnp.ones((n,), bool),
        edge_i=pad(jnp.arange(e, dtype=jnp.int32)),
        edge_j=pad(jnp.arange(1, e + 1, dtype=jnp.int32)),
        rel_q=pad(rel_q), rel_t=pad(rel_t),
        weight_t=pad(jnp.full((e,), weight_t, jnp.float32)),
        weight_r=pad(jnp.full((e,), weight_r, jnp.float32)),
        edge_mask=pad(jnp.ones((e,), bool)),
    )


def add_loop_edge(g: PoseGraph, slot: int, i: int, j: int,
                  rel_q, rel_t, weight_t=1.0, weight_r=1.0) -> PoseGraph:
    """Write a loop-closure constraint into edge slot `slot`."""
    return g._replace(
        edge_i=g.edge_i.at[slot].set(i),
        edge_j=g.edge_j.at[slot].set(j),
        rel_q=g.rel_q.at[slot].set(rel_q),
        rel_t=g.rel_t.at[slot].set(rel_t),
        weight_t=g.weight_t.at[slot].set(weight_t),
        weight_r=g.weight_r.at[slot].set(weight_r),
        edge_mask=g.edge_mask.at[slot].set(True),
    )
