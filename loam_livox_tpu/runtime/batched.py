"""Batched frame registration — the TPU-native re-expression of the
reference's racing worker pool (``common/maximum_parallel_thread``,
reference ``laser_mapping.hpp:1737-1742`` + ``common_tools.h:52-80``).

The reference's realtime profile launches up to 3 `process_new_scan`
workers concurrently; each registers its frame against the matching
buffer as it was when the worker started (stale by up to
``maximum_pointcloud_delay_time`` = 1.0 s in that profile) from the
then-current pose, and commits are timestamp-gated.  On TPU the same
semantics become ONE dispatch: G frames' registrations run as a vmapped
`register_frame` against the SHARED matching buffer, each starting from
a constant-velocity coast of the batch-entry pose (worker k starts k
frames ahead of the last committed pose — the same ≤G-frame pose/buffer
staleness the racing threads exhibit), then the commits apply in
timestamp order.  The vmap amortizes the solver's latency-bound small-op
chains across the group, which is where the throughput comes from.

Enabled by ``parallel/frame_batch`` (the realtime profile's analogue of
threads=3); the default 1 keeps the fully sequential precision
semantics.  Requires an effective piecewise count of 1 (deblur on, or
``piecewise_number`` 1 — the realtime configurations).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.config import SlamConfig
from ..core.types import FeatureFrame
from ..registration.icp import RegistrationResult, register_frame
from .odometry import OdometryState, commit_frame, input_downsample


@partial(jax.jit, static_argnames=("cfg", "group"))
def odometry_step_batched(
    state: OdometryState,
    frames: FeatureFrame,          # G-leading pytree (G = raw frames × pieces)
    cfg: SlamConfig,
    group: int,
) -> Tuple[OdometryState, RegistrationResult]:
    """Register `group` feature frames in one vmapped solve against the
    current matching buffer, then commit them in timestamp order.
    Returns (state, G-leading RegistrationResult).

    With piecewise splitting active, the caller passes the G·P piece
    frames in time order as `group` lanes — each lane is one piecewise
    registration, so the racing semantics match the reference's
    realtime mode (threads=3 over piecewise-3 frames,
    ``performance_realtime.yaml:3`` + ``laser_feature_extractor.hpp:
    141-142``)."""
    # worker-start poses: constant-velocity coast of the batch-entry
    # pose (the racing workers start from the then-current pose, which
    # trails frame k by up to k frames)
    q_inits, t_inits = [], []
    qk, tk = state.q_w, state.t_w
    for _ in range(group):
        q_inits.append(qk)
        t_inits.append(tk)
        tk = se3.quat_rotate(qk, state.last_t_incre) + tk
        qk = se3.quat_normalize(se3.quat_multiply(qk, state.last_q_incre))
    q_init = jnp.stack(q_inits)
    t_init = jnp.stack(t_inits)

    enabled = (state.frame_count + jnp.arange(group)
               >= cfg.mapping.init_accumulate_frames)
    rng, sub = jax.random.split(state.rng)
    keys = jax.random.split(sub, group)

    corner_in, surf_in = jax.vmap(
        lambda f: input_downsample(f, cfg))(frames)

    def solve(qi, ti):
        return jax.vmap(
            lambda c, s, q0, t0, tmin, tmax, en, key: register_frame(
                c, s, state.map_corners, state.map_surface, q0, t0,
                tmin, tmax, en, key, cfg,
                grid_corners=state.grid_corners,
                grid_surface=state.grid_surface,
            )
        )(corner_in, surf_in, qi, ti,
          frames.time_min, frames.time_max, enabled, keys)

    # One Jacobi round: every frame solves from its coasted start.  (A
    # second Gauss-Seidel round chaining each frame off its
    # predecessor's solution was measured at 36 fps — slower than the
    # 54 fps sequential path it was meant to beat — because the vmapped
    # while_loop re-runs full correspondence for every lane until ALL
    # converge; reverted.)
    regs = solve(q_init, t_init)

    state = state._replace(rng=rng)

    # commits in timestamp order (the reference gates pose commits by
    # timestamp, :1496-1505; in-order sequential commits realize the
    # same final ordering without drops)
    take = lambda tree, k: jax.tree_util.tree_map(lambda x: x[k], tree)
    out_regs = []
    touched_any = jnp.zeros_like(state.last_touched)
    for k in range(group):
        reg_k = take(regs, k)
        # a rejected frame must freeze at the last COMMITTED pose, not
        # at its coasted start pose (register_frame's rollback returns
        # its q_last, which here is an extrapolation — committing it
        # would integrate the coast open-loop and run away; the
        # reference's rollback lands on the committed pose because its
        # workers start there, laser_mapping.hpp:1496-1505)
        rej = jnp.logical_and(reg_k.enabled,
                              jnp.logical_not(reg_k.accepted))
        reg_k = reg_k._replace(
            q_w=jnp.where(rej, state.q_w, reg_k.q_w),
            t_w=jnp.where(rej, state.t_w, reg_k.t_w))
        state, reg_k = commit_frame(
            state, take(frames, k), take(corner_in, k), take(surf_in, k),
            reg_k, q_init[k], t_init[k], cfg)
        touched_any = jnp.logical_or(touched_any, state.last_touched)
        out_regs.append(reg_k)
    # keyframe accumulation must see every frame's touched cells, not
    # only the last commit's
    state = state._replace(last_touched=touched_any)
    regs_out = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *out_regs)
    return state, regs_out
