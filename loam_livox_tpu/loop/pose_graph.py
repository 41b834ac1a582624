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


# ---------------------------------------------------------------------------
# Scalable solver: per-edge Jacobians + matrix-free CG (+ edge sharding)
#
# The dense path above materializes a (6E, 6N) Jacobian — right for the
# reference's workload (10² keyframes), hopeless at pod scale.  This
# path never materializes H: per-edge (6, 12) Jacobians (exact
# forward-mode of the same residual, vmapped per edge so the cost is
# O(E) and embarrassingly parallel), and the GN system solved by
# conjugate gradients where each matvec is two gathers, two (6, 6)
# einsums, and two scatter-adds.  With edges sharded over a device
# mesh, the matvec's partial sums psum-reduce over ICI — the "sharded
# Schur/Hessian reduction" of BASELINE.json; collective payload is one
# (N, 6) vector per CG step.
# ---------------------------------------------------------------------------


def _edge_residual_d(qa, ta, qb, tb, rel_q, rel_t, wt, wr, d):
    """One edge's 6-residual with left-multiplied tangent perturbations
    d = (δ_rot_a, δ_t_a, δ_rot_b, δ_t_b) — the same residual as
    `edge_residuals` (reference ceres_pose_graph_3d.hpp:216-242)."""
    qa = se3.quat_multiply(se3.quat_exp(d[0:3]), qa)
    ta = ta + d[3:6]
    qb = se3.quat_multiply(se3.quat_exp(d[6:9]), qb)
    tb = tb + d[9:12]
    qa_inv = se3.quat_conjugate(qa)
    p_ab = se3.quat_rotate(qa_inv, tb - ta)
    q_ab = se3.quat_multiply(qa_inv, qb)
    dq = se3.quat_multiply(rel_q, se3.quat_conjugate(q_ab))
    dq = jnp.where(dq[0] < 0, -dq, dq)
    return jnp.concatenate([(p_ab - rel_t) * wt, 2.0 * dq[1:] * wr])


def edge_jacobians(g: PoseGraph, q: jax.Array, t: jax.Array):
    """(J_a, J_b): per-edge (E, 6, 6) Jacobians of the weighted edge
    residual w.r.t. the begin/end node tangents.  Exact forward-mode,
    one tiny jacfwd per edge under vmap (12 JVPs of a closed-form
    function — no (6E, 6N) materialization)."""
    def per_edge(qa, ta, qb, tb, rq, rt, wt, wr, m):
        J = jax.jacfwd(
            lambda d: _edge_residual_d(qa, ta, qb, tb, rq, rt, wt, wr, d)
        )(jnp.zeros(12, q.dtype))
        J = jnp.where(m, J, 0.0)
        return J[:, :6], J[:, 6:]

    return jax.vmap(per_edge)(
        q[g.edge_i], t[g.edge_i], q[g.edge_j], t[g.edge_j],
        g.rel_q, g.rel_t, g.weight_t, g.weight_r, g.edge_mask)


def _gauge_project(x):
    """Zero node 0's tangent (gauge fix, reference :325-331)."""
    return x.at[0].set(0.0)


def _assemble_b_diag(g, Ja, Jb, r, n):
    """RHS −Jᵀr (N, 6) and the diagonal of JᵀJ (N, 6) via scatter-add."""
    ga = jnp.einsum("eij,ei->ej", Ja, r)
    gb = jnp.einsum("eij,ei->ej", Jb, r)
    grad = (jnp.zeros((n, 6), r.dtype).at[g.edge_i].add(ga)
            .at[g.edge_j].add(gb))
    da = jnp.einsum("eij,eij->ej", Ja, Ja)
    db = jnp.einsum("eij,eij->ej", Jb, Jb)
    diag = (jnp.zeros((n, 6), r.dtype).at[g.edge_i].add(da)
            .at[g.edge_j].add(db))
    return grad, diag


def _hvp(g, Ja, Jb, x):
    """(JᵀJ)·x without materializing H (x: (N, 6))."""
    jx = (jnp.einsum("eij,ej->ei", Ja, x[g.edge_i])
          + jnp.einsum("eij,ej->ei", Jb, x[g.edge_j]))
    ya = jnp.einsum("eij,ei->ej", Ja, jx)
    yb = jnp.einsum("eij,ei->ej", Jb, jx)
    n = x.shape[0]
    return (jnp.zeros_like(x).at[g.edge_i].add(ya).at[g.edge_j].add(yb))


def _cg(matvec, b, iters: int, precond=None):
    """(Jacobi-preconditioned) conjugate gradients on the (N, 6)
    tangent space.  `precond` is the inverse-preconditioner apply
    (x → M⁻¹x); chain-topology pose graphs are ill-conditioned
    (information crosses one edge per CG step), so the Jacobi scaling
    matters at thousands of nodes."""
    if precond is None:
        precond = lambda x: x
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        denom = jnp.maximum(jnp.sum(p * Ap), 1e-20)
        alpha = rz / denom
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = lax.scan(body, (x0, r0, p0, rz0), None, length=iters)
    return x


@partial(jax.jit, static_argnames=("iterations", "cg_iterations"))
def optimize_pose_graph_cg(g: PoseGraph, iterations: int = 25,
                           cg_iterations: int = 50):
    """Damped-GN pose-graph solve with matrix-free CG inner solves.

    Same problem and gauge as `optimize_pose_graph`; memory and compute
    are O(E) per iteration instead of O((6N)² · E).  Returns
    (q (N, 4), t (N, 3), final_cost)."""
    n = g.q.shape[0]

    def apply_delta(q0, t0, d):
        q_new = se3.quat_normalize(
            se3.quat_multiply(se3.quat_exp(d[:, :3]), q0))
        return q_new, t0 + d[:, 3:]

    def step(state, _):
        q0, t0, lam, cost0 = state
        r = edge_residuals(g, q0, t0)                      # (E, 6)
        Ja, Jb = edge_jacobians(g, q0, t0)                 # (E, 6, 6)
        grad, diag = _assemble_b_diag(g, Ja, Jb, r, n)
        b = _gauge_project(-grad)
        damp = lam * diag + 1e-9

        def matvec(x):
            x = _gauge_project(x)
            y = _hvp(g, Ja, Jb, x) + damp * x
            # identity block on the gauge-fixed node keeps H PD
            return _gauge_project(y) + jnp.zeros_like(x).at[0].set(x[0])

        # Jacobi preconditioner: the matvec operator's exact diagonal
        pre = _gauge_project(diag + damp) + \
            jnp.zeros_like(diag).at[0].set(1.0)
        delta = _cg(matvec, b, cg_iterations, lambda x: x / pre)
        q_new, t_new = apply_delta(q0, t0, _gauge_project(delta))
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


# ---------------------------------------------------------------------------
# Exact direct solver for chain(+loops) topology
#
# SLAM pose graphs are an odometry CHAIN plus a handful of loop-closure
# edges.  The chain's normal matrix is block-tridiagonal — solvable
# exactly by a block-Thomas factorization (one lax.scan of 6×6 ops,
# O(N)); the K loop edges are a rank-6K update handled by the Woodbury
# identity with a tiny (6K, 6K) capacitance solve.  Each GN step is
# then an EXACT damped-Newton step: convergence in a handful of
# iterations regardless of N, where truncated CG stalls in the chain's
# soft bending modes (per-edge residual ~1e-4 ⇒ metre-level position
# error at 10³+ nodes).  The analogue of the reference's
# SPARSE_NORMAL_CHOLESKY (`ceres_pose_graph_3d.hpp:340-344`), built
# from scan + batched small matmuls instead of a sparse library.
# ---------------------------------------------------------------------------


def _chain_tridiag_factor(D, O):
    """Block-Thomas factorization of the SPD block-tridiagonal matrix
    with diagonal blocks D (M, 6, 6) and super-diagonal blocks O
    (M-1, 6, 6) (O_i couples block i to i+1).  Returns S_inv (M, 6, 6):
    the inverses of the Schur-complement pivots."""
    def fwd(s_prev_inv, inputs):
        d, o_prev = inputs
        s = d - o_prev.T @ s_prev_inv @ o_prev
        s_inv = jnp.linalg.inv(s)
        return s_inv, s_inv

    s0_inv = jnp.linalg.inv(D[0])
    _, s_inv_rest = lax.scan(fwd, s0_inv, (D[1:], O))
    return jnp.concatenate([s0_inv[None], s_inv_rest])


def _chain_tridiag_solve(S_inv, O, b):
    """Solve T x = b given the Thomas factorization.  b: (M, 6, R) —
    R right-hand sides batched through the same two scans."""
    def fwd(y_prev, inputs):
        b_i, o_prev, s_prev_inv = inputs
        y = b_i - o_prev.T @ (s_prev_inv @ y_prev)
        return y, y

    _, y_rest = lax.scan(fwd, b[0], (b[1:], O, S_inv[:-1]))
    y = jnp.concatenate([b[0][None], y_rest])

    def bwd(x_next, inputs):
        y_i, o_i, s_inv_i = inputs
        x = s_inv_i @ (y_i - o_i @ x_next)
        return x, x

    x_last = S_inv[-1] @ y[-1]
    _, x_rest = lax.scan(bwd, x_last, (y[:-1], O, S_inv[:-1]),
                         reverse=True)
    return jnp.concatenate([x_rest, x_last[None]])


@partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph_chain(g: PoseGraph, iterations: int = 10):
    """Damped-GN solve with an EXACT sparse inner solve for graphs
    built by `build_odometry_chain` (+ `add_loop_edge`): edges 0..N-2
    MUST be the consecutive odometry chain; all further edge slots are
    treated as loop closures (masked slots contribute nothing).

    O(N · 6³) per iteration + a (6K, 6K) dense solve for K loop edges.
    Returns (q (N, 4), t (N, 3), final_cost)."""
    n = g.q.shape[0]
    e = g.edge_i.shape[0]
    k = e - (n - 1)          # loop-edge slots (static)
    assert k >= 0, "graph has fewer edges than a full odometry chain"

    def step(state, _):
        q0, t0, lam, cost0 = state
        r = edge_residuals(g, q0, t0)
        Ja, Jb = edge_jacobians(g, q0, t0)      # (E, 6, 6) each
        grad, diag = _assemble_b_diag(g, Ja, Jb, r, n)
        damp = lam * diag + 1e-7                # (N, 6)

        # --- chain part over free nodes 1..N-1 (node 0 gauge-fixed) --
        # Chain edge i has Ja_i on node i, Jb_i on node i+1, so in
        # free-block coordinates f = node − 1:
        #   D_f     = Jb_fᵀ Jb_f + Ja_{f+1}ᵀ Ja_{f+1} + λ·diag
        #   O_f     = H[node f+1, node f+2] = Ja_{f+1}ᵀ Jb_{f+1}
        ca, cb = Ja[: n - 1], Jb[: n - 1]       # chain-edge Jacobians
        D = jnp.einsum("eij,eik->ejk", cb, cb)
        D = D.at[: n - 2].add(
            jnp.einsum("eij,eik->ejk", ca[1:], ca[1:]))
        D = D + jax.vmap(jnp.diag)(damp[1:])
        O = jnp.einsum("eij,eik->ejk", ca[1:], cb[1:])

        S_inv = _chain_tridiag_factor(D, O)

        # --- loop edges as a rank-6K Woodbury update -----------------
        b_free = _gauge_project(-grad)[1:]                    # (N-1, 6)
        rhs = b_free[:, :, None]                              # (N-1,6,1)
        if k > 0:
            la, lb = Ja[n - 1:], Jb[n - 1:]                   # (K, 6, 6)
            li = g.edge_i[n - 1:] - 1                         # free idx
            lj = g.edge_j[n - 1:] - 1
            # U columns: for loop edge k, rows at node a get Jkaᵀ,
            # rows at node b get Jkbᵀ (columns = that edge's 6 resid
            # dims).  Gauge: contributions on node 0 are dropped.
            U = jnp.zeros((n - 1, 6, 6 * k), rhs.dtype)
            cols = (jnp.arange(k)[:, None, None] * 6
                    + jnp.arange(6)[None, None, :])           # (K,1,6)
            rows = jnp.arange(6)[None, :, None]               # (1,6,1)
            Ua = jnp.transpose(la, (0, 2, 1))                 # Jkaᵀ
            Ub = jnp.transpose(lb, (0, 2, 1))
            # value[k, r, c] lands at U[node_k, r, 6k+c]; edges touching
            # the gauge-fixed node 0 contribute nothing there (the index
            # then wraps to -1 but the value is zeroed)
            va = jnp.where((li >= 0)[:, None, None], Ua, 0.0)
            vb = jnp.where((lj >= 0)[:, None, None], Ub, 0.0)
            U = U.at[li[:, None, None], rows, cols].add(va)
            U = U.at[lj[:, None, None], rows, cols].add(vb)
            # solve T⁻¹ [b, U] in one batched pass
            rhs_all = jnp.concatenate([rhs, U], axis=-1)      # (N-1,6,1+6K)
            sol = _chain_tridiag_solve(S_inv, O, rhs_all)
            Tb, TU = sol[:, :, :1], sol[:, :, 1:]
            # capacitance C = I + Uᵀ T⁻¹ U  (6K, 6K)
            UtTU = jnp.einsum("nir,nis->rs", U, TU)
            UtTb = jnp.einsum("nir,ni->r", U, Tb[:, :, 0])
            C = jnp.eye(6 * k, dtype=rhs.dtype) + UtTU
            w = jnp.linalg.solve(C, UtTb)
            x = Tb[:, :, 0] - jnp.einsum("nir,r->ni", TU, w)
        else:
            x = _chain_tridiag_solve(S_inv, O, rhs)[:, :, 0]

        d = jnp.concatenate([jnp.zeros((1, 6), x.dtype), x])
        q_new = se3.quat_normalize(
            se3.quat_multiply(se3.quat_exp(d[:, :3]), q0))
        t_new = t0 + d[:, 3:]
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


def optimize_pose_graph_sharded(g: PoseGraph, mesh, iterations: int = 25,
                                cg_iterations: int = 50,
                                axis: str = "shard"):
    """`optimize_pose_graph_cg` with the EDGE set sharded over a device
    mesh: each device holds E/n edges (+ their (6, 6) Jacobian blocks)
    and computes partial residuals / gradients / Hessian-vector
    products; node-space results psum-reduce over the mesh (one (N, 6)
    vector per CG step rides the interconnect).  Poses are replicated —
    the node state is small; the edge work and memory scale out.

    Edge count must be divisible by the mesh size (pad with masked
    edges).  Bit-comparable to `optimize_pose_graph_cg` up to float
    reduction order."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard_map = jax.shard_map
    n = g.q.shape[0]
    e = g.edge_i.shape[0]
    n_dev = mesh.shape[axis]
    assert e % n_dev == 0, (
        f"edge count {e} not divisible by mesh size {n_dev}; pad with "
        "masked edges")

    edge_fields = ("edge_i", "edge_j", "rel_q", "rel_t",
                   "weight_t", "weight_r", "edge_mask")

    def local_run(q_init, t_init, ei, ej, rq, rt, wt, wr, em):
        # Everything edge-indexed here is this device's shard; poses
        # and the GN/CG iteration state are replicated (kept identical
        # across devices by the psum reductions).
        gl = PoseGraph(q=q_init, t=t_init,
                       node_mask=jnp.ones((n,), bool),
                       edge_i=ei, edge_j=ej, rel_q=rq, rel_t=rt,
                       weight_t=wt, weight_r=wr, edge_mask=em)

        def step(carry, _):
            q0, t0, lam, cost0 = carry
            r = edge_residuals(gl, q0, t0)
            Ja, Jb = edge_jacobians(gl, q0, t0)
            grad, diag = _assemble_b_diag(gl, Ja, Jb, r, n)
            grad = lax.psum(grad, axis)
            diag = lax.psum(diag, axis)
            b = _gauge_project(-grad)
            damp = lam * diag + 1e-9

            def matvec(x):
                x = _gauge_project(x)
                y = lax.psum(_hvp(gl, Ja, Jb, x), axis) + damp * x
                return _gauge_project(y) + jnp.zeros_like(x).at[0].set(x[0])

            pre = _gauge_project(diag + damp) + \
                jnp.zeros_like(diag).at[0].set(1.0)
            delta = _cg(matvec, b, cg_iterations, lambda x: x / pre)
            d = _gauge_project(delta)
            q_new = se3.quat_normalize(
                se3.quat_multiply(se3.quat_exp(d[:, :3]), q0))
            t_new = t0 + d[:, 3:]
            r_new = edge_residuals(gl, q_new, t_new)
            cost_new = 0.5 * lax.psum(jnp.sum(r_new * r_new), axis)
            accept = cost_new < cost0
            return (jnp.where(accept, q_new, q0),
                    jnp.where(accept, t_new, t0),
                    jnp.where(accept, lam * 0.3, lam * 5.0),
                    jnp.minimum(cost_new, cost0)), None

        r0 = edge_residuals(gl, q_init, t_init)
        cost0 = 0.5 * lax.psum(jnp.sum(r0 * r0), axis)
        init = (q_init, t_init, jnp.float32(1e-4), cost0)
        (q, t, _, cost), _ = lax.scan(step, init, None, length=iterations)
        return q, t, cost

    run = jax.jit(shard_map(
        local_run, mesh=mesh,
        in_specs=(P(), P()) + tuple(P(axis) for _ in edge_fields),
        out_specs=(P(), P(), P()),
        check_vma=False,
    ))
    return run(g.q, g.t, *(getattr(g, f) for f in edge_fields))


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
