"""End-to-end odometry pipeline driver.

The host-side loop that stands in for the reference's two ROS processes
and their pub/sub boundary (reference: ``source/laser_feature_extractor.cpp``
+ ``source/laser_mapping.cpp``): raw frames → front-end feature
extraction (jitted) → odometry step (jitted).  The handoff between the
two stages is a device-array `FeatureFrame`, not a serialized
PointCloud2 — the "topic" is gone by design (SURVEY.md §2.7).

The reference's node-level behaviors reproduced here:
* source voxel downsample before "publish": surface leaf =
  plane_resolution/2, corner leaf = line_resolution
  (reference: laser_feature_extractor.hpp:192-193, 372-384),
* piecewise frame splitting (reference :305-335),
* frame-drop backpressure is not needed: the loop is synchronous, so
  the queue never grows (the reference drops frames only because its
  producer can outrun its consumer, laser_mapping.hpp:1702-1707).

Frame pipelining (`common/maximum_parallel_thread`, reference
``laser_mapping.hpp:1737-1742`` — up to N frames' registrations in
flight): with depth D > 1 the host defers the device→host readback of
each frame's results by up to D frames, so the chip computes frame t
while the host pads/feeds frame t+1 and post-processes frame t−D
(logging, trajectory, loop-closure bookkeeping).  JAX's async dispatch
provides the overlap; the pending queue bounds it.  The state handoff
between steps stays on-device either way — depth only controls when
the host *observes* results, never what is computed.
"""
from __future__ import annotations

import time as _time
from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from ..core.config import SlamConfig
from ..core.types import FeatureFrame
from ..frontend.livox import extract_frame
from ..io.simulator import LivoxSimulator
from ..ops.voxel import voxel_downsample
from .odometry import OdometryState, init_state, odometry_step


def _process_raw_frame_body(state, pts, inten, mask, t0, cfg: SlamConfig,
                            piecewise_number: int = 1):
    """One whole raw frame: feature extraction → source downsample →
    `piecewise_number` sequential odometry steps.  Traced inside
    `process_raw_frame` (one dispatch per frame) and inside
    `process_raw_frames_chunked` (one dispatch per K frames).

    A single dispatch per frame matters: per-call host→device latency
    would otherwise dominate at real-time rates (the reference's
    analogue is its zero-copy intra-process handoff once inside
    `Laser_mapping`).

    The piecewise windows run as a `lax.scan` over (lo, hi) index
    fractions — NOT a Python unroll, which would multiply the program
    size (and compile time) by `piecewise_number`.

    Returns (state, last RegistrationResult, per-piece
    (q_w, t_w, accepted, time_min) arrays with leading dim
    `piecewise_number`).
    """
    from jax import lax

    from ..frontend.livox import extract_point_info, select_features

    fe = cfg.feature_extraction
    caps = cfg.capacity

    if cfg.common.lidar_type == "velodyne":
        # Classic mechanical-lidar path (reference lidar_type switch,
        # laser_feature_extractor.hpp:827-864): one sweep, no piecewise.
        from ..frontend.velodyne import extract_velodyne_features

        frame = extract_velodyne_features(
            pts, mask, jnp.asarray(t0, jnp.float32), fe, caps,
            minimum_range=fe.minimum_range)
        frame = frame._replace(
            corners=voxel_downsample(frame.corners,
                                     fe.mapping_line_resolution,
                                     capacity=caps.max_corner),
            surface=voxel_downsample(frame.surface,
                                     fe.mapping_plane_resolution / 2.0,
                                     capacity=caps.max_surface),
        )
        state, reg = odometry_step(state, frame, cfg)
        one = lambda x: jnp.asarray(x)[None]
        poses = (one(reg.q_w), one(reg.t_w), one(reg.accepted),
                 one(frame.time_min))
        return state, reg, poses

    info, n_petals = extract_point_info(pts, inten, mask,
                                        jnp.asarray(t0, jnp.float32), fe, caps)

    bounds = jnp.stack(
        [jnp.arange(piecewise_number) / piecewise_number,
         (jnp.arange(piecewise_number) + 1) / piecewise_number],
        axis=-1).astype(jnp.float32)
    if cfg.common.odom_mode == 0 and piecewise_number > 1:
        # Odometry mode publishes only the FIRST piecewise window per
        # frame — the reference's extractor loop `break`s after piece 0
        # when m_odom_mode == 0 (laser_feature_extractor.hpp:385-388).
        bounds = bounds[:1]

    def piece_step(st, lohi):
        from ..parallel.mesh import pin_replicated

        piece = select_features(pts, info, n_petals, lohi[0], lohi[1],
                                fe, caps)
        piece = piece._replace(
            corners=voxel_downsample(piece.corners, fe.mapping_line_resolution,
                                     capacity=caps.max_corner),
            surface=voxel_downsample(piece.surface,
                                     fe.mapping_plane_resolution / 2.0,
                                     capacity=caps.max_surface),
        )
        # product mesh: the per-frame feature arrays must lower
        # whole-array in every layout (shard-invariance contract)
        piece = pin_replicated(piece)
        st, reg = odometry_step(st, piece, cfg)
        return st, (reg, piece.time_min)

    state, (regs, tmins) = lax.scan(piece_step, state, bounds)
    last_reg = jax.tree_util.tree_map(lambda x: x[-1], regs)
    poses = (regs.q_w, regs.t_w, regs.accepted, tmins)
    return state, last_reg, poses


process_raw_frame = partial(jax.jit,
                            static_argnames=("cfg", "piecewise_number"))(
    _process_raw_frame_body)
process_raw_frame.__doc__ = _process_raw_frame_body.__doc__


@partial(jax.jit, static_argnames=("cfg", "chunk", "piecewise_number"))
def process_raw_frames_chunked(state, pts, inten, mask, t0s,
                               cfg: SlamConfig, chunk: int,
                               piecewise_number: int = 1):
    """SEQUENTIAL chunked dispatch: K raw frames in ONE device program,
    same per-frame semantics as K `process_raw_frame` calls — a
    `lax.scan` over the frame axis wrapping the shared frame body.

    This is the replay/offline-throughput mode: at 70+ fps the
    per-dispatch host↔device round trip is a material share of the
    frame budget (remote-TPU tunnel ≈ ms-scale RTT); one dispatch per K
    frames amortizes it with ZERO accuracy tradeoff (unlike racing,
    which coasts start poses).  The cost is K frames of added result
    latency — for live sensor streams keep K small or 1.

    pts (K, N, 3), inten (K, N), mask (K, N), t0s (K,).
    Returns (state, (q_w, t_w, accepted, time_min)) with leading dim
    K·pieces, time-ordered.
    """

    def frame_step(carry, inp):
        st, touched = carry
        p, it, m, t0 = inp
        st, reg, poses = _process_raw_frame_body(
            st, p, it, m, t0, cfg, piecewise_number)
        # OR-fold the touched-cell masks across the chunk: commit_frame
        # REPLACES last_touched per frame, but the chunk drains as ONE
        # pending entry, so keyframe member-cell bookkeeping must see
        # every frame's touched cells (mirrors touched_any in
        # runtime/batched.odometry_step_batched).
        touched = jnp.logical_or(touched, st.last_touched)
        return (st, touched), (poses, reg)

    (state, touched_any), (poses, regs) = lax.scan(
        frame_step, (state, jnp.zeros_like(state.last_touched)),
        (pts, inten, mask, t0s.astype(jnp.float32)))
    state = state._replace(last_touched=touched_any)
    # (K, P, ...) → (K·P, ...) in time order
    poses = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]), poses)
    last_reg = jax.tree_util.tree_map(lambda x: x[-1], regs)
    return state, last_reg, poses


@partial(jax.jit, static_argnames=("cfg", "group", "pieces"))
def process_raw_frames_batched(state, pts, inten, mask, t0s,
                               cfg: SlamConfig, group: int,
                               pieces: int = 1):
    """Fused batched program: G raw frames → vmapped front end →
    batched racing registration (`runtime.batched`) over G·pieces
    lanes → commits in time order.

    With ``pieces > 1`` (deblur off + piecewise_number > 1 — the
    SHIPPED realtime configuration) every raw frame contributes its
    `pieces` piecewise windows as consecutive racing lanes, matching
    the reference's threads=3-over-piecewise-3 realtime mode.

    pts (G, N, 3), inten (G, N), mask (G, N), t0s (G,).
    Returns (state, regs, (q_w, t_w, accepted, time_min) with leading
    dim G·pieces, time-ordered).
    """
    from ..frontend.livox import extract_point_info, select_features
    from .batched import odometry_step_batched

    fe = cfg.feature_extraction
    caps = cfg.capacity

    def extract_pieces(p, it, m, t0):
        info, n_petals = extract_point_info(p, it, m, t0, fe, caps)

        def one(lo, hi):
            fr = select_features(p, info, n_petals, lo, hi, fe, caps)
            return fr._replace(
                corners=voxel_downsample(fr.corners,
                                         fe.mapping_line_resolution,
                                         capacity=caps.max_corner),
                surface=voxel_downsample(fr.surface,
                                         fe.mapping_plane_resolution / 2.0,
                                         capacity=caps.max_surface),
            )

        return [one(q / pieces, (q + 1) / pieces) for q in range(pieces)]

    per_piece = jax.vmap(extract_pieces)(pts, inten, mask,
                                         t0s.astype(jnp.float32))
    if pieces == 1:
        frames = per_piece[0]
    else:
        # interleave to time order: lane k*pieces + q = frame k, piece q
        frames = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=1).reshape(
                (group * pieces,) + xs[0].shape[1:]),
            *per_piece)
    state, regs = odometry_step_batched(state, frames, cfg, group * pieces)
    poses = (regs.q_w, regs.t_w, regs.accepted, frames.time_min)
    return state, regs, poses


@dataclass
class TrajectoryRecord:
    times: List[float] = field(default_factory=list)
    positions: List[np.ndarray] = field(default_factory=list)
    quaternions: List[np.ndarray] = field(default_factory=list)
    accepted: List[bool] = field(default_factory=list)

    def positions_array(self) -> np.ndarray:
        return np.asarray(self.positions, np.float64)


class OdometryPipeline:
    """Feature extraction + odometry over a stream of raw frames; with
    loop closure enabled, also drives the keyframe/loop service
    (reference: the `service_loop_detection` thread)."""

    def __init__(self, cfg: SlamConfig, log_dir: str | None = None):
        from ..utils.logging import FileLogger, SpanTimer

        self.cfg = cfg
        # Adaptive capacity schedule (runtime/capacity_schedule.py):
        # when active, the jitted step runs at right-sized capacities
        # (cfg_active) that grow toward cfg's worst case as measured
        # fills demand — self.cfg keeps the caller's semantics, shapes
        # come from cfg_active.
        from .capacity_schedule import CapacityScheduler, schedule_active

        self.scheduler = None
        self.cfg_active = cfg
        if schedule_active(cfg, None):
            self.scheduler = CapacityScheduler(cfg)
            self.cfg_active = self.scheduler.cfg
        self._sched_interval = 4      # frames between fill checks
        self._sched_countdown = self._sched_interval
        self.state: OdometryState = init_state(self.cfg_active)
        # Multi-chip product mode (parallel/mesh_devices > 1): construct
        # the 1-D mesh once and place the state with the product layout
        # (parallel.layout) — map/matching-buffer point axes and the
        # cell directory shard over the mesh; the jitted step then runs
        # SPMD with XLA collectives for the kNN top-k and J^T J
        # reductions.  The reference's analogue is the thread-level
        # concurrency of laser_mapping.hpp:1737-1742, re-expressed as
        # mesh parallelism (SURVEY.md §5.8).
        self.mesh = None
        n_mesh = int(cfg.parallel.mesh_devices)
        if n_mesh > 1:
            from ..parallel import make_mesh
            from ..parallel.layout import shard_state

            self.mesh = make_mesh(n_mesh)
            self.state = shard_state(self.state, self.mesh)
        self.trajectory = TrajectoryRecord()
        # screen echo of diagnostics when if_verbose_screen_printf == 0
        # (inverted semantics, reference tools_logger.hpp:51-80)
        self.logger = FileLogger(
            log_dir, screen=(cfg.common.if_verbose_screen_printf == 0))
        self.timer = SpanTimer()
        self.loop_closer = None
        if cfg.loop_closure.if_enable_loop_closure:
            from .loop_service import LoopCloser

            self.loop_closer = LoopCloser(cfg)
        # Pipelining depth (see module docstring).  Depth 1 = drain
        # every frame (fully synchronous, the precision profile);
        # depth N = up to N frames' results in flight.
        self.pipeline_depth = max(1, int(cfg.common.maximum_parallel_thread))
        self._pending: deque = deque()
        self._frame_idx = 0
        # Batched racing registration (parallel/frame_batch > 1): raw
        # frames accumulate into groups of G and register in one
        # vmapped dispatch (runtime/batched.py — the reference's
        # maximum_parallel_thread worker pool re-expressed on-device).
        self.frame_batch = max(1, int(cfg.parallel.frame_batch))
        self._batch_pieces = (1 if cfg.common.if_motion_deblur
                              else max(1, cfg.common.piecewise_number))
        if (self.frame_batch > 1 and self._batch_pieces > 1
                and cfg.common.odom_mode == 0):
            raise ValueError(
                "parallel/frame_batch > 1 with piecewise > 1 requires "
                "common/odom_mode = 1 (odometry mode publishes only "
                "piece 0, which the batched lanes do not model)")
        # Motion staleness guard (parallel/batch_motion_guard_t): when
        # the last observed per-step translation exceeds the threshold,
        # dispatch the group SEQUENTIALLY — the racing lanes' coasted
        # inits and ≤G-frame buffer staleness degrade exactly when the
        # platform moves fast (the measured largescale failure mode).
        self._last_motion = 0.0
        # Sequential chunked dispatch (parallel/dispatch_chunk): K raw
        # frames per device program with per-frame semantics — the
        # replay/offline-throughput mode (amortizes per-dispatch host
        # latency; K frames of result latency; loop bookkeeping at
        # chunk granularity like the racing mode).
        self.dispatch_chunk = max(1, int(cfg.parallel.dispatch_chunk))
        if self.dispatch_chunk > 1 and self.frame_batch > 1:
            raise ValueError(
                "parallel/dispatch_chunk and parallel/frame_batch are "
                "mutually exclusive (sequential chunking vs racing)")
        self._batch_buf: List = []
        self._lazy: List = []          # lazily-drained device poses
        # Force per-drain host materialization (live consumers of the
        # trajectory between flushes, e.g. the CLI's --follow stream).
        self.eager_drain = False
        self._pcd_dir = None
        if cfg.common.if_save_to_pcd_files:
            import os

            self._pcd_dir = os.path.join(log_dir or ".", "pcd")
            os.makedirs(self._pcd_dir, exist_ok=True)

    def process_raw(self, xyz: np.ndarray, intensity: np.ndarray,
                    base_time: float, mask: np.ndarray | None = None
                    ) -> None:
        """One raw sensor frame → piecewise feature frames → odometry
        (one fused device program).  With pipeline_depth > 1 the
        results are observed up to depth frames later; call `flush()`
        before reading the trajectory.

        Fast path: pass `xyz`/`intensity` already PADDED to
        ``capacity.max_raw_points`` as device (jax) arrays together
        with their validity `mask` to skip the host-side pad + copy —
        a fresh host→device transfer costs ms-scale latency through a
        remote-TPU tunnel, a real share of the frame budget at
        real-time rates."""
        caps = self.cfg.capacity
        # register this pipeline's mesh (or None) and deterministic-
        # numerics flag so library code can harden/pin the solver chain
        # at trace time — see parallel/mesh.py.  Re-assigned per
        # dispatch: several pipelines with different meshes may
        # interleave in one process (the trace cache is keyed by cfg,
        # which carries parallel.mesh_devices/deterministic).
        from ..parallel.mesh import set_active_mesh

        det = self.cfg.parallel.deterministic
        dsol = self.cfg.parallel.det_solver
        set_active_mesh(self.mesh,
                        deterministic=(None if det < 0 else bool(det)),
                        det_solver=(None if dsol < 0 else bool(dsol)))
        n = caps.max_raw_points
        if (mask is not None and isinstance(xyz, jax.Array)
                and xyz.shape == (n, 3)):
            pts, inten = xyz, intensity
            m = n
            raw_np = None
        else:
            pts = np.zeros((n, 3), np.float32)
            inten = np.zeros((n,), np.float32)
            mask = np.zeros((n,), bool)
            m = min(len(xyz), n)
            pts[:m] = xyz[:m]
            inten[:m] = intensity[:m]
            mask[:m] = True
            raw_np = pts[:m] if self._pcd_dir else None

        from ..utils import logging as L

        self.timer.tic(L.SPAN_FRAME)
        if self.frame_batch > 1:
            self._batch_buf.append((pts, inten, mask, base_time))
            if len(self._batch_buf) == self.frame_batch:
                self._dispatch_batch()
                self._maybe_grow_capacity()
            self._drain_to_depth()
            return
        if self.dispatch_chunk > 1:
            self._batch_buf.append((pts, inten, mask, base_time))
            if len(self._batch_buf) == self.dispatch_chunk:
                self._dispatch_chunk()
                self._maybe_grow_capacity()
            self._drain_to_depth()
            return
        # Motion deblur replaces piecewise splitting (reference:
        # laser_feature_extractor.hpp:306-309 forces piece_wise = 1
        # when if_motion_deblur is on).
        pieces = (1 if self.cfg.common.if_motion_deblur
                  else self.cfg.common.piecewise_number)
        inputs = (jnp.asarray(pts), jnp.asarray(inten), jnp.asarray(mask),
                  jnp.float32(base_time))
        if self.mesh is not None:
            # Raw sensor inputs replicate over the mesh (the per-point
            # front-end scans are sequential along the point axis); the
            # sharded state pins the step's SPMD partitioning.
            from ..parallel.layout import replicate

            inputs = replicate(inputs, self.mesh)
        self.state, reg, poses = process_raw_frame(
            self.state, *inputs, self.cfg_active,
            piecewise_number=pieces,
        )
        # Defer the device→host sync: park the (device-array) results
        # and the state snapshot this frame produced.  The snapshot is
        # a functional pytree — later steps never mutate it, so loop
        # bookkeeping done at drain time sees exactly frame t's map.
        self._park(self._frame_idx, self.state, reg, poses, raw_np)
        self._frame_idx += 1
        self._drain_to_depth()
        self._maybe_grow_capacity()

    def _park(self, frame_idx, state, reg, poses, raw_np=None) -> None:
        """Queue a dispatched frame's (device) results for drain, and
        START their device→host copies now — by drain time the values
        are host-resident and reading them costs no sync (a blocking
        read through a remote-TPU tunnel is ms-scale per round trip)."""
        for x in poses:
            try:
                x.copy_to_host_async()
            except AttributeError:
                pass
        self._pending.append((frame_idx, state, reg, poses, raw_np))

    def _maybe_grow_capacity(self) -> None:
        """Adaptive capacity schedule hook: every few frames, measure
        buffer fills and grow the active capacities if a watermark was
        crossed (one recompile per growth; exponential check backoff
        once fills settle, zero overhead once at the configured max)."""
        if self.scheduler is None or self.scheduler.at_max():
            return
        self._sched_countdown -= 1
        if self._sched_countdown > 0:
            return
        self.state, cfg_new, grew = self.scheduler.maybe_grow(self.state)
        if grew:
            self.cfg_active = cfg_new
            self._sched_interval = 4
        else:
            self._sched_interval = min(self._sched_interval * 2, 64)
        self._sched_countdown = self._sched_interval

    def _drain_to_depth(self) -> None:
        if self.pipeline_depth == 1:
            while self._pending:        # fully synchronous
                self._drain_one()
        else:
            while len(self._pending) > self.pipeline_depth:
                self._drain_one()

    def _dispatch_batch(self) -> None:
        """One vmapped dispatch over the accumulated raw-frame group
        (runtime/batched.py racing registration) — or, when the motion
        guard trips, the same frames sequentially."""
        # Re-register the active mesh: a partial tail group (flush)
        # compiles a NEW trace, which must not read another pipeline's
        # mesh/deterministic globals (several pipelines with different
        # meshes may interleave in one process — parallel/mesh.py).
        from ..parallel.mesh import set_active_mesh

        det = self.cfg.parallel.deterministic
        dsol = self.cfg.parallel.det_solver
        set_active_mesh(self.mesh,
                        deterministic=(None if det < 0 else bool(det)),
                        det_solver=(None if dsol < 0 else bool(dsol)))
        guard = self.cfg.parallel.batch_motion_guard_t
        if guard > 0 and self._last_motion > guard:
            # fast motion: racing-lane staleness costs accuracy; fall
            # back to sequential registration for this group
            buf, self._batch_buf = self._batch_buf, []
            for pts, inten, mask, t0 in buf:
                inputs = (jnp.asarray(pts), jnp.asarray(inten),
                          jnp.asarray(mask), jnp.float32(t0))
                if self.mesh is not None:
                    from ..parallel.layout import replicate

                    inputs = replicate(inputs, self.mesh)
                self.state, reg, poses = process_raw_frame(
                    self.state, *inputs, self.cfg_active,
                    piecewise_number=self._batch_pieces)
                self._park(self._frame_idx, self.state, reg, poses)
                self._frame_idx += 1
            return
        group = len(self._batch_buf)
        pts = jnp.stack([b[0] for b in self._batch_buf])
        inten = jnp.stack([b[1] for b in self._batch_buf])
        mask = jnp.stack([b[2] for b in self._batch_buf])
        t0s = jnp.asarray(np.asarray([b[3] for b in self._batch_buf],
                                     np.float32))
        self._batch_buf = []
        inputs = (pts, inten, mask, t0s)
        if self.mesh is not None:
            from ..parallel.layout import replicate

            inputs = replicate(inputs, self.mesh)
        self.state, regs, poses = process_raw_frames_batched(
            self.state, *inputs, self.cfg_active, group,
            pieces=self._batch_pieces)
        last_reg = jax.tree_util.tree_map(lambda x: x[-1], regs)
        self._park(self._frame_idx, self.state, last_reg, poses)
        self._frame_idx += group

    def _dispatch_chunk(self) -> None:
        """One sequential chunked dispatch over the accumulated raw
        frames (process_raw_frames_chunked — per-frame semantics, one
        device program)."""
        # see _dispatch_batch: tail-group traces must pin THIS
        # pipeline's mesh/deterministic globals
        from ..parallel.mesh import set_active_mesh

        det = self.cfg.parallel.deterministic
        dsol = self.cfg.parallel.det_solver
        set_active_mesh(self.mesh,
                        deterministic=(None if det < 0 else bool(det)),
                        det_solver=(None if dsol < 0 else bool(dsol)))
        k = len(self._batch_buf)
        pts = jnp.stack([b[0] for b in self._batch_buf])
        inten = jnp.stack([b[1] for b in self._batch_buf])
        mask = jnp.stack([b[2] for b in self._batch_buf])
        t0s = jnp.asarray([b[3] for b in self._batch_buf], jnp.float32)
        self._batch_buf = []
        pieces = (1 if self.cfg.common.if_motion_deblur
                  else self.cfg.common.piecewise_number)
        inputs = (pts, inten, mask, t0s)
        if self.mesh is not None:
            from ..parallel.layout import replicate

            inputs = replicate(inputs, self.mesh)
        self.state, last_reg, poses = process_raw_frames_chunked(
            self.state, *inputs, self.cfg_active, k, piecewise_number=pieces)
        self._park(self._frame_idx, self.state, last_reg, poses)
        self._frame_idx += k

    def flush(self) -> None:
        """Drain all in-flight frames (host observes every result);
        with frame batching/chunking, a partial tail group dispatches
        first."""
        if self._batch_buf:
            if self.dispatch_chunk > 1:
                self._dispatch_chunk()
            else:
                self._dispatch_batch()
        while self._pending:
            self._drain_one()
        if self.loop_closer is not None:
            # wait for the background loop-detection worker to finish
            # every queued keyframe (reference: the detached thread's
            # results are only needed when the loop output is read)
            self.loop_closer.drain()
        if self._lazy:
            # one batched device→host materialization of every lazily
            # drained frame (see _drain_one)
            host = jax.device_get(self._lazy)
            self._lazy = []
            for q_ws, t_ws, accepted, tmins in host:
                for p in range(len(tmins)):
                    self.trajectory.times.append(float(tmins[p]))
                    self.trajectory.positions.append(np.asarray(t_ws[p]))
                    self.trajectory.quaternions.append(np.asarray(q_ws[p]))
                    self.trajectory.accepted.append(bool(accepted[p]))

    def _drain_one(self) -> None:
        from ..utils import logging as L

        frame_idx, state, reg, poses, raw_pts = self._pending.popleft()
        if (self.loop_closer is None and not self.logger.enabled()
                and self._pcd_dir is None and self.frame_batch == 1
                and not self.eager_drain):
            # LAZY drain: nothing downstream needs the values on the
            # host this frame — park the device arrays and let flush()
            # materialize the whole trajectory in one device→host pass.
            # A per-frame np.asarray here would SYNC the dispatch queue
            # (ms-scale per frame through a remote-TPU tunnel) and
            # serialize host and chip.
            self._lazy.append(poses)
            return
        # one batched device→host transfer (per-array np.asarray reads
        # each pay a full round trip through a remote-TPU tunnel)
        q_ws, t_ws, accepted, tmins = (
            np.asarray(x) for x in jax.device_get(poses))
        # feed the batched-mode motion guard: largest per-step
        # translation observed in this drain (stale by pipeline depth,
        # which is exactly the staleness the guard models)
        prev = (self.trajectory.positions[-1]
                if self.trajectory.positions else t_ws[0])
        steps = np.diff(np.vstack([prev[None], t_ws]), axis=0)
        self._last_motion = float(np.linalg.norm(steps, axis=1).max())
        if self.logger.enabled():
            # per-frame quality metrics, mirroring the reference's
            # mapping/timer/pcd logs (point_cloud_registration.hpp:534-557,
            # laser_mapping.hpp:1506-1512)
            self.logger.printf(
                "mapping",
                "frame %d: cost=%.6f inlier_thr=%.6f blocks=%d iters=%d "
                "dR=%.3fdeg dT=%.3fm accepted=%d",
                frame_idx, float(reg.final_cost),
                float(reg.inlier_threshold), int(reg.n_blocks),
                int(reg.iterations), float(reg.angular_diff_deg),
                float(reg.t_diff), int(bool(reg.accepted)))
            q = q_ws[-1]
            t = t_ws[-1]
            self.logger.printf("pcd_log", "Curr_Q = %f,%f,%f,%f", *q)
            self.logger.printf("pcd_log", "Curr_T = %f,%f,%f", *t)
            self.logger.write("timer",
                              f"{L.SPAN_FRAME}: "
                              f"{self.timer.toc(L.SPAN_FRAME):.3f} ms")
        for p in range(len(tmins)):
            self.trajectory.times.append(float(tmins[p]))
            self.trajectory.positions.append(t_ws[p])
            self.trajectory.quaternions.append(q_ws[p])
            self.trajectory.accepted.append(bool(accepted[p]))

        if self._pcd_dir is not None and raw_pts is not None:
            # Registered full cloud per frame (reference
            # laser_mapping.hpp:1608-1611 `save_to_pcd_files("aft_mapp",
            # ...)`); host-side endpoint-pose transform (the on-device
            # path additionally deblur-interpolates per point).
            from ..core import se3
            from ..io.serialization import save_pcd

            R = np.asarray(se3.quat_to_matrix(jnp.asarray(q_ws[-1])))
            world = raw_pts @ R.T + t_ws[-1]
            save_pcd(f"{self._pcd_dir}/aft_mapp_{frame_idx}.pcd", world)

        if self.loop_closer is not None and not self.loop_closer.closed:
            # Keyframe accumulation consumes the last piece's
            # touched-cell mask (with piecewise > 1 the intermediate
            # pieces' masks are folded into the same raw frame —
            # keyframe cadence then counts raw frames, a documented
            # divergence from the reference's per-piece counting).
            self.loop_closer.on_frame(
                state.cell_full, state.last_touched,
                q_ws[-1], t_ws[-1], frame_idx)

    def get_corrected_map(self, stride: int = 2,
                          resolution: float = 0.0) -> np.ndarray:
        """Corrected global map after an accepted loop closure — the
        analogue of the reference's /pc_aft_loop_closure republish
        (laser_mapping.hpp:1091-1100).  Raises if no loop accepted."""
        if self.loop_closer is None or self.loop_closer.result is None:
            raise RuntimeError("no accepted loop closure to refine from")
        return self.loop_closer.corrected_map(
            self.state.cell_full, stride=stride, resolution=resolution)

    def get_surround_map(self, radius: float | None = None) -> np.ndarray:
        """Visualization map around the current pose — the analogue of
        the reference's surround-publish thread (`service_pub_surround_pts`,
        laser_mapping.hpp:1151-1201): cells within `radius` of the pose
        (full-resolution cell map when loop closure maintains it,
        otherwise the surface matching buffer), voxel-filtered at
        ``surround_pointcloud_resolution``.  Returns (N, 3) float32."""
        from ..map.cell_map import cells_in_radius, gather_cell_points

        cfg = self.cfg
        res = cfg.mapping.surround_pointcloud_resolution
        radius = radius or max(cfg.mapping.maximum_search_range_surface,
                               100.0)
        if int(self.state.cell_full.capacity) > 1:
            sel = cells_in_radius(self.state.cell_full, self.state.t_w,
                                  radius)
            batch = gather_cell_points(self.state.cell_full, sel)
        else:
            batch = self.state.map_surface
        ds = voxel_downsample(batch, res)
        return np.asarray(ds.xyz)[np.asarray(ds.mask)]

    def process_feature_frame(self, frame: FeatureFrame) -> None:
        if self.mesh is not None:
            from ..parallel.layout import shard_frame

            frame = shard_frame(frame, self.mesh)
        self.state, reg = odometry_step(self.state, frame, self.cfg_active)
        self._maybe_grow_capacity()
        t = float(frame.time_min)
        self.trajectory.times.append(t)
        self.trajectory.positions.append(np.asarray(reg.t_w))
        self.trajectory.quaternions.append(np.asarray(reg.q_w))
        self.trajectory.accepted.append(bool(reg.accepted))


def run_odometry(
    cfg: SlamConfig,
    n_frames: int,
    sim: Optional[LivoxSimulator] = None,
    verbose: bool = False,
):
    """Simulate and process `n_frames`; returns (pipeline, sim, wall_s)."""
    sim = sim or LivoxSimulator()
    pipe = OdometryPipeline(cfg)
    t0 = _time.perf_counter()
    for i in range(n_frames):
        xyz, inten, base_t = sim.frame(i)
        pipe.process_raw(xyz, inten, base_t)
        if verbose and (i + 1) % 10 == 0 and pipe.trajectory.positions:
            print(f"frame {i + 1}/{n_frames} t_w="
                  f"{np.round(pipe.trajectory.positions[-1], 3)}")
    pipe.flush()
    wall = _time.perf_counter() - t0
    return pipe, sim, wall
