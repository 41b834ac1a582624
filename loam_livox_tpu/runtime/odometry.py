"""Odometry/mapping runtime — the TPU re-design of `Laser_mapping`'s
per-frame critical path (reference: ``source/laser_mapping.hpp:1316-1660``
`process_new_scan` + ``:460-566`` `update_buff_for_matching`).

The reference is a thread-and-mutex pipeline: worker threads register
frames against a double-buffered KD-tree matching buffer that detached
service threads rebuild from a sliding history window.  The TPU-native
design replaces all of it with **one jitted step over functional
state**:

    state, result = odometry_step(state, frame)

where the state pytree carries the pose, the history ring buffers (the
reference's ``m_laser_cloud_*_history`` std::lists become fixed-shape
(W, C, 3) rings), and the current matching buffer (the reference's
``*_from_map_last`` clouds; the KD-tree is gone — correspondence is the
batched MXU kNN).  The matching-buffer rebuild happens inside the step
on a configurable cadence (`capacity.matching_rebuild_interval`), which
is the functional encoding of the reference's staleness contract
(`maximum_pointcloud_delay_time`): a rebuild every k-th frame means
registration sees a buffer at most k frames old, exactly like the async
refresh thread.

Behavioral parity checklist (history matching mode, matching_mode=0):
* input voxel downsample, corner leaf = line_resolution, surface leaf =
  plane_resolution (reference :1368-1373, :742-743),
* init-accumulation gate: full ICP only after `init_accumulate_frames`
  (reference point_cloud_registration.hpp:199 via config :28-30),
* degeneracy-rejected frames update neither pose nor history
  (reference :1416-1420),
* registered features are world-transformed **with per-point deblur**
  then re-downsampled before entering history (reference :1422-1437),
* history admission gate on motion deltas, window popped at
  `maximum_histroy_buffer` (reference :1444-1487),
* matching buffer = concat(history) → voxel filter at the same leaves
  (reference :517-537).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core import se3
from ..core.config import SlamConfig
from ..core.types import FeatureFrame, PointBatch
from ..map.cell_map import (
    CellMap,
    append_cloud,
    cells_in_fov,
    cells_in_radius,
    empty_cell_map,
    gather_cell_points,
)
from ..ops.bucket_grid import BucketGrid, build_bucket_grid
from ..ops.voxel import voxel_downsample
from ..registration import residuals as res
from ..registration.icp import RegistrationResult, refine_blur, register_frame


class OdometryState(NamedTuple):
    """Functional state of the odometry/mapping loop (one pytree)."""

    q_w: jax.Array                 # (4,) current world pose
    t_w: jax.Array                 # (3,)
    frame_count: jax.Array         # int32 — frames processed
    # History ring buffers of world-frame registered features
    # (reference: m_laser_cloud_corner/surface_history, :1444-1487).
    hist_corner_xyz: jax.Array     # (W, Ch, 3)
    hist_corner_mask: jax.Array    # (W, Ch)
    hist_surf_xyz: jax.Array       # (W, Cs, 3)
    hist_surf_mask: jax.Array      # (W, Cs)
    hist_ptr: jax.Array            # int32 — next ring slot
    hist_len: jax.Array            # int32 — valid entries
    # History admission gate state (reference: m_last_his_add_q/t, :80-84).
    last_his_q: jax.Array
    last_his_t: jax.Array
    # Last ACCEPTED increment — the constant-velocity coast applied on
    # rejected frames (mapping.reject_recovery_mode=1).
    last_q_incre: jax.Array
    last_t_incre: jax.Array
    # Cell maps of registered features (reference: m_pt_cell_map_corners
    # / m_pt_cell_map_planes, laser_mapping.hpp:274-275,1491-1493);
    # matching source in cell mode, keyframe source for loop closure.
    cell_corners: CellMap
    cell_planes: CellMap
    # Full-resolution cell map + per-step touched-cell mask — the
    # keyframe accumulation signal (reference: m_pt_cell_map_full +
    # append_cloud's cell_vec, laser_mapping.hpp:1526-1530).  Size-1
    # dummies when loop closure is off.
    cell_full: CellMap
    last_touched: jax.Array        # (C_full,) bool
    # Matching buffer (reference: *_from_map_last, :551-559) + the
    # bucket grids over it (the KD-tree replacement; rebuilt together,
    # mirroring the reference's kdtree.setInputCloud at :539-546).
    map_corners: PointBatch
    map_surface: PointBatch
    grid_corners: BucketGrid
    grid_surface: BucketGrid
    rng: jax.Array


def _need_cell_maps(cfg: SlamConfig) -> bool:
    """Feature cell maps are read only by cell-mode matching and the
    loop-closure keyframes; elsewhere they stay 1-slot dummies."""
    return (cfg.mapping.matching_mode == 1
            or bool(cfg.loop_closure.if_enable_loop_closure))


def init_state(cfg: SlamConfig) -> OdometryState:
    caps = cfg.capacity
    w = caps.history_window
    return OdometryState(
        q_w=se3.quat_identity(),
        t_w=jnp.zeros(3, jnp.float32),
        frame_count=jnp.int32(0),
        hist_corner_xyz=jnp.zeros((w, caps.hist_corner_capacity, 3), jnp.float32),
        hist_corner_mask=jnp.zeros((w, caps.hist_corner_capacity), bool),
        hist_surf_xyz=jnp.zeros((w, caps.hist_surf_capacity, 3), jnp.float32),
        hist_surf_mask=jnp.zeros((w, caps.hist_surf_capacity), bool),
        hist_ptr=jnp.int32(0),
        hist_len=jnp.int32(0),
        last_his_q=se3.quat_identity(),
        last_his_t=jnp.zeros(3, jnp.float32),
        last_q_incre=se3.quat_identity(),
        last_t_incre=jnp.zeros(3, jnp.float32),
        cell_corners=empty_cell_map(
            cfg.mapping.cell_resolution * 0.5,
            caps.cell_capacity if _need_cell_maps(cfg) else 1,
            caps.cell_point_capacity if _need_cell_maps(cfg) else 1),
        cell_planes=empty_cell_map(
            cfg.mapping.cell_resolution * 0.5,
            caps.cell_capacity if _need_cell_maps(cfg) else 1,
            caps.cell_point_capacity if _need_cell_maps(cfg) else 1),
        cell_full=(
            empty_cell_map(cfg.mapping.cell_resolution * 0.5,
                           caps.cell_capacity, caps.cell_point_capacity)
            if cfg.loop_closure.if_enable_loop_closure
            else empty_cell_map(cfg.mapping.cell_resolution * 0.5, 1, 1)),
        last_touched=jnp.zeros(
            (caps.cell_capacity
             if cfg.loop_closure.if_enable_loop_closure else 1,), bool),
        map_corners=PointBatch.empty(caps.map_corner_capacity),
        map_surface=PointBatch.empty(caps.map_surf_capacity),
        grid_corners=build_bucket_grid(
            jnp.zeros((caps.map_corner_capacity, 3), jnp.float32),
            jnp.zeros((caps.map_corner_capacity,), bool),
            cfg.optimization.corner_bucket_size,
            caps.corner_bucket_count, caps.corner_bucket_cap),
        grid_surface=build_bucket_grid(
            jnp.zeros((caps.map_surf_capacity, 3), jnp.float32),
            jnp.zeros((caps.map_surf_capacity,), bool),
            cfg.optimization.surf_bucket_size,
            caps.surf_bucket_count, caps.surf_bucket_cap),
        rng=jax.random.PRNGKey(0),
    )


def _rebuild_matching_buffer(state: OdometryState, cfg: SlamConfig
                             ) -> Tuple[PointBatch, PointBatch]:
    """Matching-buffer build (reference `update_buff_for_matching`,
    laser_mapping.hpp:460-566).

    matching_mode 0 (*history*): concat the sliding window.
    matching_mode 1 (*cell*): gather cell point pools within the search
    radius of the current pose, FoV-gated (reference :471-515).
    Either way, voxel-filter at the registration leaves (:533-537)."""
    fe = cfg.feature_extraction
    caps = cfg.capacity

    if cfg.mapping.matching_mode == 1:
        sel_c = cells_in_radius(state.cell_corners, state.t_w,
                                cfg.mapping.maximum_search_range_corner)
        sel_c &= cells_in_fov(state.cell_corners, state.t_w, state.q_w,
                              cfg.mapping.maximum_in_fov_angle)
        sel_s = cells_in_radius(state.cell_planes, state.t_w,
                                cfg.mapping.maximum_search_range_surface)
        sel_s &= cells_in_fov(state.cell_planes, state.t_w, state.q_w,
                              cfg.mapping.maximum_in_fov_angle)
        raw_c = gather_cell_points(state.cell_corners, sel_c)
        raw_s = gather_cell_points(state.cell_planes, sel_s)
    else:
        def flatten(xyz, mask):
            w, c, _ = xyz.shape
            return PointBatch(
                xyz=xyz.reshape(w * c, 3),
                time=jnp.zeros((w * c,), jnp.float32),
                mask=mask.reshape(w * c),
            )

        raw_c = flatten(state.hist_corner_xyz, state.hist_corner_mask)
        raw_s = flatten(state.hist_surf_xyz, state.hist_surf_mask)

    corners = voxel_downsample(raw_c, fe.mapping_line_resolution,
                               capacity=caps.map_corner_capacity,
                               with_time=False)
    surface = voxel_downsample(raw_s, fe.mapping_plane_resolution,
                               capacity=caps.map_surf_capacity,
                               with_time=False)
    if cfg.optimization.correspondence == "grid":
        grid_c = build_bucket_grid(
            corners.xyz, corners.mask, cfg.optimization.corner_bucket_size,
            caps.corner_bucket_count, caps.corner_bucket_cap)
        grid_s = build_bucket_grid(
            surface.xyz, surface.mask, cfg.optimization.surf_bucket_size,
            caps.surf_bucket_count, caps.surf_bucket_cap)
    else:
        # The dense engine never reads the bucket grids; building them
        # anyway would burn two argsorts per rebuild on state fields
        # XLA cannot dead-code-eliminate (they are live carries).
        grid_c, grid_s = state.grid_corners, state.grid_surface
    return corners, surface, grid_c, grid_s


def input_downsample(frame: FeatureFrame, cfg: SlamConfig):
    """ICP input voxel downsample (reference :1368-1373)."""
    fe = cfg.feature_extraction
    caps = cfg.capacity
    if cfg.mapping.input_downsample_mode:
        corner_in = voxel_downsample(frame.corners, fe.mapping_line_resolution,
                                     capacity=caps.max_corner_ds)
        surf_in = voxel_downsample(frame.surface, fe.mapping_plane_resolution,
                                   capacity=caps.max_surface_ds)
        return corner_in, surf_in
    return frame.corners, frame.surface


@partial(jax.jit, static_argnames=("cfg",))
def odometry_step(
    state: OdometryState,
    frame: FeatureFrame,
    cfg: SlamConfig,
) -> Tuple[OdometryState, RegistrationResult]:
    """Process one feature frame: register, map-update, rebuild buffer."""
    corner_in, surf_in = input_downsample(frame, cfg)

    # ---- registration gate (reference config :28-30) --------------------
    enabled = state.frame_count >= cfg.mapping.init_accumulate_frames

    rng, reg_key = jax.random.split(state.rng)
    reg = register_frame(
        corner_in, surf_in,
        state.map_corners, state.map_surface,
        state.q_w, state.t_w,
        frame.time_min, frame.time_max,
        enabled, reg_key, cfg,
        grid_corners=state.grid_corners,
        grid_surface=state.grid_surface,
        q_incre_init=state.last_q_incre,
        t_incre_init=state.last_t_incre,
    )
    state = state._replace(rng=rng)
    return commit_frame(state, frame, corner_in, surf_in, reg,
                        state.q_w, state.t_w, cfg)


def commit_frame(
    state: OdometryState,
    frame: FeatureFrame,
    corner_in: PointBatch,
    surf_in: PointBatch,
    reg: RegistrationResult,
    q_base: jax.Array,
    t_base: jax.Array,
    cfg: SlamConfig,
) -> Tuple[OdometryState, RegistrationResult]:
    """Everything after registration: pose policy, history ring, cell
    maps, matching-buffer append/rebuild (reference
    `process_new_scan`'s post-ICP half, laser_mapping.hpp:1413-1564).

    ``q_base/t_base`` is the pose the registration's increment composes
    from — ``state.q_w`` in the sequential step; the per-frame INIT
    pose in the batched step (`runtime.batched`), where several frames
    register against the same buffer before any commit."""
    fe = cfg.feature_extraction
    caps = cfg.capacity
    deblur = bool(cfg.common.if_motion_deblur)

    # Rejected frames: add nothing to the map (reference :1416-1420).
    add_frame = reg.accepted

    # Pose policy for rejected frames (see MappingConfig.reject_recovery_mode):
    # coast on the last accepted increment instead of freezing.
    rejected = jnp.logical_and(reg.enabled, jnp.logical_not(reg.accepted))
    if cfg.mapping.reject_recovery_mode == 1:
        coast_q = se3.quat_normalize(
            se3.quat_multiply(state.q_w, state.last_q_incre))
        coast_t = se3.quat_rotate(state.q_w, state.last_t_incre) + state.t_w
        q_pose = jnp.where(rejected, coast_q, reg.q_w)
        t_pose = jnp.where(rejected, coast_t, reg.t_w)
    else:
        q_pose, t_pose = reg.q_w, reg.t_w
    reg = reg._replace(q_w=q_pose, t_w=t_pose)
    last_q_incre = jnp.where(reg.accepted & reg.enabled, reg.q_incre,
                             state.last_q_incre)
    last_t_incre = jnp.where(reg.accepted & reg.enabled, reg.t_incre,
                             state.last_t_incre)

    # ---- world transform with deblur (reference :1422-1437) -------------
    s_c = refine_blur(corner_in.time, frame.time_min, frame.time_max, deblur)
    s_s = refine_blur(surf_in.time, frame.time_min, frame.time_max, deblur)
    corner_w = corner_in._replace(xyz=res.transform_points_incre(
        reg.q_incre, reg.t_incre, corner_in.xyz, s_c,
        q_base, t_base, deblur))
    surf_w = surf_in._replace(xyz=res.transform_points_incre(
        reg.q_incre, reg.t_incre, surf_in.xyz, s_s,
        q_base, t_base, deblur))

    corner_w = voxel_downsample(corner_w, fe.mapping_line_resolution,
                                capacity=caps.hist_corner_capacity)
    surf_w = voxel_downsample(surf_w, fe.mapping_plane_resolution,
                              capacity=caps.hist_surf_capacity)

    # ---- history admission (reference :1444-1463) -----------------------
    r_diff = se3.quat_angular_distance(reg.q_w, state.last_his_q) * 57.3
    t_diff = jnp.linalg.norm(reg.t_w - state.last_his_t)
    window_open = state.hist_len < cfg.mapping.maximum_histroy_buffer
    moved = jnp.logical_or(
        t_diff > cfg.mapping.history_add_t_step,
        r_diff > cfg.mapping.history_add_angle_step * 57.3,
    )
    admit = jnp.logical_and(add_frame, jnp.logical_or(window_open, moved))

    w = caps.history_window
    slot = state.hist_ptr
    def write_ring(ring, ring_mask, pts: PointBatch):
        new_xyz = lax.dynamic_update_index_in_dim(ring, pts.xyz, slot, 0)
        new_mask = lax.dynamic_update_index_in_dim(ring_mask, pts.mask, slot, 0)
        return (
            jnp.where(admit, new_xyz, ring),
            jnp.where(admit, new_mask, ring_mask),
        )

    hc_xyz, hc_mask = write_ring(state.hist_corner_xyz, state.hist_corner_mask,
                                 corner_w)
    hs_xyz, hs_mask = write_ring(state.hist_surf_xyz, state.hist_surf_mask,
                                 surf_w)
    hist_ptr = jnp.where(admit, (slot + 1) % w, slot)
    hist_len = jnp.where(admit, jnp.minimum(state.hist_len + 1, w),
                         state.hist_len)
    last_his_q = jnp.where(admit, reg.q_w, state.last_his_q)
    last_his_t = jnp.where(admit, reg.t_w, state.last_his_t)

    # ---- cell-map insertion (reference :1491-1493) ----------------------
    # Appended unconditionally with an admit-gated mask so the jit
    # program is branch-free; an all-False mask touches no cells.  (The
    # cell frame index then counts all frames, not only accepted ones —
    # immaterial at the shipped revisit thresholds of 2000/100000.)
    # In history matching mode with loop closure off, nothing ever
    # reads the feature cell maps (the reference maintains them anyway,
    # laser_mapping.hpp:1491-1493, burning ~20% of its frame budget);
    # skip the insertions then.
    revisit = cfg.common.threshold_cell_revisit
    max_new = caps.cell_max_new_per_frame
    if _need_cell_maps(cfg):
        cell_corners, _ = append_cloud(
            state.cell_corners,
            corner_w._replace(mask=corner_w.mask & admit),
            revisit, max_new=max_new)
        cell_planes, _ = append_cloud(
            state.cell_planes,
            surf_w._replace(mask=surf_w.mask & admit),
            revisit, max_new=max_new)
    else:
        cell_corners, cell_planes = state.cell_corners, state.cell_planes

    # Full-cloud cell map for keyframes (reference :1526-1530): the
    # registered full cloud, world-transformed with deblur.
    if cfg.loop_closure.if_enable_loop_closure:
        s_f = refine_blur(frame.full.time, frame.time_min, frame.time_max,
                          deblur)
        full_w = frame.full._replace(
            xyz=res.transform_points_incre(
                reg.q_incre, reg.t_incre, frame.full.xyz, s_f,
                q_base, t_base, deblur),
            mask=frame.full.mask & admit)
        cell_full, last_touched = append_cloud(
            state.cell_full, full_w, revisit, max_new=max_new)
    else:
        cell_full, last_touched = state.cell_full, state.last_touched

    # ---- matching-buffer rebuild (cadenced; see module doc) -------------
    mid_state = state._replace(
        hist_corner_xyz=hc_xyz, hist_corner_mask=hc_mask,
        hist_surf_xyz=hs_xyz, hist_surf_mask=hs_mask,
        cell_corners=cell_corners, cell_planes=cell_planes,
        q_w=reg.q_w, t_w=reg.t_w,
    )
    # Appends between full rebuilds (capacity.matching_append_mode):
    # dense-correspondence matching mode only — bucket grids have no
    # in-place append.
    append_mode = (bool(caps.matching_append_mode)
                   and cfg.optimization.correspondence != "grid")
    interval = int(caps.matching_rebuild_interval)
    if interval == 0:
        # Auto cadence.  WITHOUT appends: derive it from the staleness
        # the profile tolerates (`mapping/maximum_pointcloud_delay_time`
        # over the 0.1 s design scan period,
        # laser_feature_extractor.hpp:68) — the functional encoding of
        # the reference's async refresh thread lagging up to that long
        # (laser_mapping.hpp:568-576).  The tolerance would admit
        # k = delay/0.1 + 1, but that claims the reference's WORST-CASE
        # staleness as the operating point — its async thread typically
        # refreshes within ~1 frame, and measured ATE degrades when the
        # allowance is claimed (full_mapping 0.082→0.147, largescale
        # 0.18→0.43 on the scenario matrix), so the cadence stays at
        # the reference's typical staleness, not its bound.
        # WITH appends the newest frame's geometry always reaches the
        # buffer (the property the ~1-frame refresh provides); only the
        # voxel dedup lags, so the full-rebuild cadence stretches to
        # every 4th frame (ATE-neutral on the scenario matrix —
        # RESULTS.md round 3) and never below the delay-derived cadence.
        interval = max(
            1, round(cfg.mapping.maximum_pointcloud_delay_time / 0.1))
        if append_mode:
            interval = max(interval, 4)
    interval = max(interval, 1)
    do_rebuild = jnp.logical_and(
        admit, (state.frame_count % interval) == 0) if interval > 1 else admit

    if append_mode and interval > 1:
        # Off-cadence admitted frames append their (compacted) world
        # features at the buffer's valid-prefix end — the buffer always
        # holds the newest geometry; the cadenced rebuild re-dedups.
        do_append = jnp.logical_and(admit, jnp.logical_not(do_rebuild))

        def append_path(st):
            def append(buf: PointBatch, pts: PointBatch):
                C = buf.capacity
                fill = jnp.sum(buf.mask.astype(jnp.int32))
                start = jnp.clip(fill, 0, C - pts.capacity)
                xyz = lax.dynamic_update_slice(buf.xyz, pts.xyz, (start, 0))
                mask = lax.dynamic_update_slice(buf.mask, pts.mask, (start,))
                return PointBatch(
                    xyz=jnp.where(do_append, xyz, buf.xyz),
                    time=buf.time,
                    mask=jnp.where(do_append, mask, buf.mask))

            return (append(st.map_corners, corner_w),
                    append(st.map_surface, surf_w),
                    st.grid_corners, st.grid_surface)

        map_corners, map_surface, grid_corners, grid_surface = lax.cond(
            do_rebuild,
            lambda st: _rebuild_matching_buffer(st, cfg),
            append_path,
            mid_state,
        )
    else:
        map_corners, map_surface, grid_corners, grid_surface = lax.cond(
            do_rebuild,
            lambda st: _rebuild_matching_buffer(st, cfg),
            lambda st: (st.map_corners, st.map_surface,
                        st.grid_corners, st.grid_surface),
            mid_state,
        )

    new_state = OdometryState(
        q_w=reg.q_w,
        t_w=reg.t_w,
        frame_count=state.frame_count + 1,
        hist_corner_xyz=hc_xyz,
        hist_corner_mask=hc_mask,
        hist_surf_xyz=hs_xyz,
        hist_surf_mask=hs_mask,
        hist_ptr=hist_ptr,
        hist_len=hist_len,
        last_his_q=last_his_q,
        last_his_t=last_his_t,
        last_q_incre=last_q_incre,
        last_t_incre=last_t_incre,
        cell_corners=cell_corners,
        cell_planes=cell_planes,
        cell_full=cell_full,
        last_touched=last_touched,
        map_corners=map_corners,
        map_surface=map_surface,
        grid_corners=grid_corners,
        grid_surface=grid_surface,
        rng=state.rng,
    )
    return new_state, reg
