"""Configuration tree for the TPU-native LiDAR SLAM engine.

One dataclass tree, YAML-loadable, mirroring the reference's five ROS
parameter namespaces (``common/``, ``feature_extraction/``,
``optimization/``, ``mapping/``, ``loop_closure/`` — reference:
``config/performance_precision.yaml:1-56``) plus a TPU-specific
``capacity`` namespace that fixes the static shapes (padded batch sizes,
map capacities) the XLA compilation model requires.

Both shipped profiles are reproduced as constructors:
`precision_profile()` and `realtime_profile()` (reference:
``config/performance_precision.yaml`` vs ``config/performance_realtime.yaml``).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


@dataclass(frozen=True)
class CommonConfig:
    # reference: config/performance_precision.yaml:1-8
    lidar_type: str = "livox"
    maximum_parallel_thread: int = 1
    odom_mode: int = 1
    # NOTE on fidelity: BOTH shipped reference YAMLs set
    # `common/if_motion_deblur: 0` (config/performance_precision.yaml:5,
    # performance_realtime.yaml:5) and omit `common/piecewise_number`,
    # whose node default is 3 (laser_feature_extractor.hpp:141-142) — so
    # the reference's shipped modes run deblur OFF with 3 piecewise
    # registrations per 0.1 s frame.  The deblur-ON node default (:141)
    # applies only when no YAML is loaded.  This framework's DEFAULT
    # config deliberately ships the deblur-interpolation variant
    # (deblur 1 → effective piecewise 1): one registration per frame
    # with per-residual slerp compensation is the natural fit for the
    # batched TPU solve, and every headline number is measured on it.
    # The faithful shipped profiles are `precision_profile()` /
    # `realtime_profile()` (deblur 0, piecewise 3); the deblur variant
    # of precision is `deblur_precision_profile()`.
    if_motion_deblur: int = 1
    if_save_to_pcd_files: int = 0
    # Cell mean/cov source: 1 = lifetime moment accumulators (the
    # reference's incremental recursion, cell_map_keyframe.hpp:30,
    # :394-415); 0 = recompute from the retained point pool (the
    # reference recomputes from its stored point vector; the realtime
    # profile ships 0).  Read by map.cell_map.cell_features.
    if_update_mean_and_cov_incrementally: int = 1
    threshold_cell_revisit: int = 2000
    # reference: launch/rosbag_mid100.launch:6 (common/piecewise_number)
    piecewise_number: int = 3
    # Screen diagnostics gate with the REFERENCE'S INVERTED semantics
    # (tools_logger.hpp:51-80 ADD_SCREEN_PRINTF_OUT_METHOD): 1 = silent
    # (prints swallowed — the shipped default), 0 = echo per-frame /
    # loop-gate diagnostics to stdout.
    if_verbose_screen_printf: int = 1


@dataclass(frozen=True)
class FeatureExtractionConfig:
    # reference: config/performance_precision.yaml:10-18
    scan_line: int = 64
    mapping_line_resolution: float = 0.1
    mapping_plane_resolution: float = 0.4
    livox_min_sigma: float = 7e-4
    livox_min_dis: float = 0.1
    corner_curvature: float = 0.1
    surface_curvature: float = 0.005
    minimum_view_angle: float = 5.0
    # Mechanical-lidar close-point cutoff (Velodyne path only; the
    # Livox path uses livox_min_dis).  Reference:
    # `feature_extraction/minimum_range`, laser_feature_extractor.hpp:140
    # (default 0.1), applied in removeClosedPointCloud (:211-240,400).
    minimum_range: float = 0.1
    # Livox hardware constants (reference: source/livox_feature_extractor.hpp:143-145)
    max_fov_deg: float = 17.0
    time_internal_pts: float = 1.0e-5
    # Petal-split minimum sample gap (reference: livox_feature_extractor.hpp:545,555)
    split_min_gap: int = 50
    # Depth gates on emitted features (reference: livox_feature_extractor.hpp:242,252)
    corner_max_depth: float = 30.0
    surface_max_depth: float = 1000.0


@dataclass(frozen=True)
class OptimizationConfig:
    # reference: config/performance_precision.yaml:20-26
    minimum_icp_R_diff: float = 0.01
    minimum_icp_T_diff: float = 0.01
    maximum_residual_blocks: int = 200
    max_allow_final_cost: float = 2.0
    icp_maximum_iteration: int = 15
    # (the reference's optimization/ceres_maximum_iteration=50 has no
    # analogue here: it caps a solver this design replaced — the LM
    # inner budget is `prerun_iterations` + `full_iterations` below)
    # Inner-solver schedule (reference: point_cloud_registration.hpp:91,97-98)
    prerun_iterations: int = 2
    inlier_dis: float = 0.02
    inlier_ratio: float = 0.80
    huber_delta: float = 0.1           # reference: point_cloud_registration.hpp:220
    line_search_num: int = 5
    plane_search_num: int = 5
    maximum_dis_line_for_match: float = 2.0    # squared-distance gate, :65
    maximum_dis_plane_for_match: float = 50.0  # squared-distance gate, :64
    # Effective degeneracy-rejection / bound values.  NOTE: the
    # reference *reads* these from ``optimization/max_allow_incre_*``
    # (laser_mapping.hpp:682-684) but the shipped YAMLs define them only
    # under ``mapping/`` — so the reference actually runs on these
    # defaults (4.0 deg/frame gate, ±2.0 m translation bounds,
    # laser_mapping.hpp:152-153); the mapping/ YAML values are dead.
    max_allow_incre_R: float = 200.0 / 50.0
    max_allow_incre_T: float = 100.0 / 50.0
    # LM damping for the GN solver that replaces Ceres.
    lm_init_lambda: float = 1e-4
    # ICP increment initialization: 0 = identity (the reference's
    # behavior — every frame's Ceres solve starts at zero increment,
    # point_cloud_registration.hpp:205-208); 1 = constant-velocity
    # (seed the increment with the last ACCEPTED increment — the first
    # correspondence search then happens near the answer, cutting
    # outer ICP iterations on smooth motion; VERDICT r3 item 5a).
    increment_init: int = 0
    # LM iterations used for the post-prune full solve (the reference's
    # ceres_maximum_iteration=50 is a cap; Ceres converges in a handful
    # of iterations on this 6-DoF problem — and the outer ICP loop
    # re-searches correspondences anyway, so deep inner convergence is
    # wasted work).
    full_iterations: int = 5
    # If > 0, randomly subsample residuals to this budget like the
    # reference; if 0, keep all residuals (the TPU-native default — the
    # batched solver is not residual-count bound).
    subsample_residuals: int = 0
    # Correspondence engine:
    # "auto" (default) = "pallas" on TPU, "dense" elsewhere;
    # "pallas" = fused Pallas kernel (ops.pallas.knn_fused): distance +
    #   binned-min reduction in one VMEM pass — ~45× the dense engine
    #   at the odometry working set (0.03 ms vs 1.5 ms at 2048×65536,
    #   recall 0.995 vs the dense approx engine's 0.99);
    # "dense" = brute-force MXU kNN + approx_min_k (the XLA baseline,
    #   and the CPU path — Mosaic kernels only compile on TPU);
    # "grid" = 27-bucket grid-hash search (ops.bucket_grid, the
    #   crossover choice beyond ~5·10^5 map points for non-TPU).
    correspondence: str = "auto"
    # Dense-engine kNN selection: -1 (default) = AUTO — exact top_k
    # everywhere except single-chip TPU, where `lax.approx_min_k` at
    # recall 0.99 keeps its hardware-friendly fused lowering (the dense
    # engine is only the A/B baseline there; the production TPU engine
    # is Pallas).  0 = approx always, 1 = exact always.
    # Why exact off-TPU: (a) approx_min_k has no fast CPU lowering —
    # measured 29.6 s vs 0.65 s/call exact at 2048×65536; (b) exact
    # selection is shard-invariant — approx_min_k's GSPMD-partitioned
    # lowering (per-shard approx + merge) drops a slightly DIFFERENT
    # ~1% candidate set than the single-device binned reduction,
    # breaking the multi-chip equivalence contract
    # (test_parallel_mode).
    knn_exact: int = -1
    # MXU precision of the kNN distance matmul: "high" (3-pass bf16,
    # the default — 29% faster on the dominant 2048×65536 kernel,
    # 0.98 index agreement with full precision; error analysis in
    # ops/knn.py; ATE-neutral across all five BASELINE scenarios on
    # the chip, loop closure included) or "highest" (6-pass f32,
    # bit-faithful reference for A/B).
    knn_precision: str = "high"
    # Deblur Jacobian: 0 = forward-mode autodiff (the default);
    # 1 = the EXACT closed form (the SO(3) left-Jacobian ratio
    # J_l(sφ)J_l(φ)⁻¹ collapses to I + c₁K + c₂K² — agrees with
    # forward-mode to f32 round-off, tests/test_registration.py; it
    # replaced round 2's FIRST-ORDER truncation, which biased steps
    # enough to cost deblur acceptance 56/60 → 40/60).  Measured
    # perf-equal on the chip (XLA shares the 6-tangent jacfwd work
    # well), so the default stays on the path every shipped artifact
    # was measured with; the analytic path remains for composing with
    # transforms jacfwd cannot reach.
    deblur_analytic_jacobian: int = 0
    # Bucket sizes bound the search radius (±1 bucket); defaults sized
    # for the shipped resolutions vs the match gates
    # (maximum_dis_line/plane_for_match).
    corner_bucket_size: float = 1.5
    surf_bucket_size: float = 1.0


@dataclass(frozen=True)
class MappingConfig:
    # reference: config/performance_precision.yaml:28-41
    matching_mode: int = 0
    input_downsample_mode: int = 1
    init_accumulate_frames: int = 50
    maximum_mapping_buffer: int = 20000000
    maximum_histroy_buffer: int = 400
    maximum_in_fov_angle: float = 45.0
    maximum_pointcloud_delay_time: float = 0.1
    maximum_search_range_corner: float = 100.0
    maximum_search_range_surface: float = 100.0
    surround_pointcloud_resolution: float = 0.30
    max_allow_incre_R: float = 20.0
    max_allow_incre_T: float = 0.3
    max_allow_final_cost: float = 2.0
    # history admission gates (reference: laser_mapping.hpp:80-84)
    history_add_t_step: float = 0.0
    history_add_angle_step: float = 0.0
    # Rejected-frame pose policy: 0 = freeze at the previous pose (the
    # reference's rollback, point_cloud_registration.hpp:561-573);
    # 1 = coast on the last accepted increment (constant-velocity
    # prediction).  Freeze is the default: measured on oscillating
    # trajectories, blind coasting through a rejection streak integrates
    # a stale velocity and drifts far worse than freezing.
    reject_recovery_mode: int = 0
    # Cell-map grid resolution; the effective cell box size is half this
    # (reference: m_pt_cell_resolution = 1.0, laser_mapping.hpp:272,
    # halved by set_resolution, cell_map_keyframe.hpp:675-680).
    cell_resolution: float = 1.0


@dataclass(frozen=True)
class LoopClosureConfig:
    # reference: config/performance_precision.yaml:43-56
    if_enable_loop_closure: int = 0
    if_dump_keyframe_data: int = 0
    scans_of_each_keyframe: int = 300
    scans_between_two_keyframe: int = 100
    minimum_keyframe_differen: int = 200
    minimum_similarity_linear: float = 0.65
    minimum_similarity_planar: float = 0.94
    map_alignment_resolution: float = 0.1
    maximum_keyframe_in_waiting_list: int = 10
    map_alignment_maximum_icp_iteration: int = 5
    map_alignment_inlier_threshold: float = 0.20
    map_alignment_if_dump_matching_result: int = 0
    # Run the loop service on a background host thread (the reference's
    # detached service_loop_detection thread, laser_mapping.hpp:1683-1686)
    # so keyframe completion never stalls frame registration; 0 = inline
    # (deterministic ordering for unit tests).  TPU-side execution is
    # identical — only the host thread that enqueues the device programs
    # changes.
    if_loop_service_async: int = 1
    scene_alignment_maximum_residual_block: int = 3000
    # Histogram nonzero-ratio floors for loop candidates (reference
    # hardcodes 0.05/0.03 for 300-scan keyframes, laser_mapping.hpp:894-895)
    avail_ratio_plane: float = 0.05
    avail_ratio_line: float = 0.03


@dataclass(frozen=True)
class ParallelConfig:
    """Multi-chip execution (TPU-specific; no reference analogue — the
    reference's only process boundary is ROS pub/sub on one machine,
    ``package.xml:22-39``; this is the new capability BASELINE.md
    requires).  With ``mesh_devices > 1`` the pipeline constructs a 1-D
    device mesh and runs the odometry step with the product sharding
    layout (`parallel.layout`): map/matching-buffer point axes and the
    cell directory shard over the mesh, J^T J / top-k reductions cross
    it as collectives."""
    # devices in the 1-D mesh; 1 = single-chip (no sharding)
    mesh_devices: int = 1
    # Layout-deterministic numerics (docs/multichip.md): -1 AUTO = on
    # exactly when mesh_devices > 1 (the product multi-chip mode needs
    # its shard-invariance contract); 0 = off (fastest — lets XLA fuse
    # and FMA-contract freely); 1 = force on (used by the contract
    # test's 1-device reference runs so both programs share the
    # hardened numerics).
    deterministic: int = -1
    # Solver-chain share of the deterministic hardening (the
    # barrier/tree-sum paths in registration/gauss_newton + residuals):
    # -1/1 = harden whenever `deterministic` is active (the shipped
    # contract configuration); 0 = relax the SOLVER chain only — the
    # bitwise contract leg is unaffected (registration never executes
    # in the contractive init window), the chaos-envelope leg holds
    # empirically (tests/test_parallel_mode.py re-run with the
    # relaxation), and the H/g build returns to XLA's fused einsums
    # (the measured 13.1% single-chip deterministic-mode tax is mostly
    # this chain).  Map-build hardening (exact kNN selection,
    # replication pinning) stays tied to `deterministic`.
    det_solver: int = -1
    # Frame-group size for batched racing registration
    # (runtime/batched.py) — the TPU-native re-expression of the
    # reference's `common/maximum_parallel_thread` worker pool
    # (laser_mapping.hpp:1737-1742): G frames register against the
    # SHARED matching buffer in one vmapped solve from coasted start
    # poses (the racing threads' ≤G-frame pose/buffer staleness), then
    # commit in timestamp order.  1 = fully sequential (the precision
    # semantics; the default); the realtime profile's analogue of
    # threads=3 is frame_batch=3.  Measured (RESULTS.md): 54 → 75 fps
    # at G=3; ATE parity on normal-speed streams with deblur OFF
    # (deblur amplifies the coasted-init error — the same fragility the
    # deblur notes document — and fast 4×-speed trajectories pay the
    # buffer staleness), so pair it with if_motion_deblur=0 /
    # piecewise_number=1 and normal platform dynamics.
    frame_batch: int = 1
    # SEQUENTIAL chunked dispatch: process K raw frames per device
    # program (lax.scan over the frame axis) — identical per-frame
    # semantics to one-dispatch-per-frame, amortizing the per-dispatch
    # host↔device round trip (the replay/offline-throughput mode; K
    # frames of added result latency).  1 = off.  Mutually exclusive
    # with frame_batch > 1 (racing).
    dispatch_chunk: int = 1
    # Motion staleness guard for batched racing (m per odometry step):
    # when the last observed per-step translation exceeds this, the
    # pipeline dispatches the group SEQUENTIALLY instead of racing it —
    # the lanes' coasted inits and ≤G-frame buffer staleness degrade
    # exactly when the platform moves fast (the measured largescale
    # failure: G=3 ATE 0.114→0.72 at 4× platform speed).  0 disables
    # the guard.  The 0.08 default ≈ 0.8 m/s at 10 Hz — below the
    # handheld-walking speeds the shipped bags exhibit, above the
    # per-frame motion where racing was measured ATE-neutral.
    batch_motion_guard_t: float = 0.08


@dataclass(frozen=True)
class CapacityConfig:
    """Static shapes for the XLA programs (TPU-specific; no reference
    analogue — the reference uses dynamically sized std::vector/PCL
    clouds, which have no jit-compatible equivalent)."""
    max_raw_points: int = 16384        # padded raw points per frame
    max_splits: int = 512              # petal turning-point candidates
    max_corner: int = 1024             # padded corner features per frame
    max_surface: int = 4096            # padded surface features per frame
    # capacities after the mapping-input voxel filter (coarser leaves →
    # fewer voxels; these set the ICP query width, the hot dimension)
    max_corner_ds: int = 512
    max_surface_ds: int = 2048
    map_corner_capacity: int = 16384   # matching-buffer corner points
    map_surf_capacity: int = 65536     # matching-buffer surface points
    cell_capacity: int = 8192          # cell-map directory slots
    cell_point_capacity: int = 32      # points retained per cell (ring pool)
    cell_max_new_per_frame: int = 512  # new cells creatable per frame
    # Bucket-grid correspondence structure (ops.bucket_grid)
    corner_bucket_count: int = 8192
    corner_bucket_cap: int = 32
    surf_bucket_count: int = 16384
    surf_bucket_cap: int = 16
    # kNN query chunking: the scan step width of the dense MXU search
    # (ops.knn) — each step materializes one (knn_query_tile, M)
    # distance block, so this bounds peak HBM scratch.
    knn_query_tile: int = 1024
    history_window: int = 64           # registered frames kept for matching
    # per-frame capacities of the history ring buffers (world-frame,
    # voxel-downsampled registered features — reference keeps full
    # dynamically-sized clouds in std::list, laser_mapping.hpp:1444-1463)
    # sized so a frame's world-transformed features never truncate
    # (lexicographic voxel truncation spatially biases the map and
    # measurably degrades ATE)
    hist_corner_capacity: int = 512
    hist_surf_capacity: int = 2048
    # ---- adaptive capacity schedule (runtime/capacity_schedule.py) ----
    # The capacities above are worst-case static shapes, but every
    # padded op costs the CAPACITY, not the fill — and measured fills on
    # bounded scenes are 1-5% of the worst case (the +36% bounded preset
    # was this observation, frozen; the schedule makes it adaptive and
    # large-world safe).  With auto_schedule=1 the sequential pipeline
    # starts the fill-driven buffers at 1/schedule_start_scale of their
    # configured size and GROWS them (×2 per step, one recompile each,
    # monotonic, capped at the configured values) whenever a measured
    # fill crosses schedule_watermark — so a bounded scene runs at
    # right-sized shapes while a large-scale world converges to exactly
    # the configured worst case.  Capacities are execution shapes, not
    # behavior: growth triggers before meaningful truncation, and the
    # scenario-matrix ATE is the regression guard.  The schedule is
    # automatically inactive under a product mesh, explicit
    # deterministic mode, racing/chunked dispatch, the grid engine, and
    # raw odometry_step callers (shape-pinned contracts).
    auto_schedule: int = 1
    schedule_watermark: float = 0.7
    schedule_start_scale: int = 16
    # matching-buffer FULL-rebuild cadence in frames: 0 = auto, 1 =
    # every frame, larger = that fixed cadence — the functional
    # encoding of the reference's async refresh thread
    # (laser_mapping.hpp:568-576, maximum_pointcloud_delay_time)
    matching_rebuild_interval: int = 0
    # Between full rebuilds, APPEND each admitted frame's downsampled
    # world features into the matching buffer's free tail (1 = on, the
    # default; dense correspondence only — the bucket grids cannot be
    # appended in place).  The buffer then always contains the newest
    # geometry — the property the reference's ~1-frame-staleness async
    # refresh provides — while the expensive full voxel-dedup sort runs
    # only on the cadence; between rebuilds the new points are simply
    # not deduplicated against the window yet.  With appends on, the
    # auto cadence is every 4th frame (ATE-neutral on the scenario
    # matrix, unlike cadence alone — RESULTS.md); with appends off,
    # auto = max(1, delay_time/0.1) as before.
    matching_append_mode: int = 1


@dataclass(frozen=True)
class SlamConfig:
    common: CommonConfig = field(default_factory=CommonConfig)
    feature_extraction: FeatureExtractionConfig = field(default_factory=FeatureExtractionConfig)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    mapping: MappingConfig = field(default_factory=MappingConfig)
    loop_closure: LoopClosureConfig = field(default_factory=LoopClosureConfig)
    capacity: CapacityConfig = field(default_factory=CapacityConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def replace(self, **sections) -> "SlamConfig":
        """Return a copy with whole sections or nested fields replaced.

        `cfg.replace(optimization={'icp_maximum_iteration': 10})` merges
        into the existing section; passing a dataclass replaces it.
        """
        updates: Dict[str, Any] = {}
        for name, val in sections.items():
            cur = getattr(self, name)
            if isinstance(val, dict):
                updates[name] = dataclasses.replace(cur, **val)
            else:
                updates[name] = val
        return dataclasses.replace(self, **updates)


_SECTION_TYPES = {
    "common": CommonConfig,
    "feature_extraction": FeatureExtractionConfig,
    "optimization": OptimizationConfig,
    "mapping": MappingConfig,
    "loop_closure": LoopClosureConfig,
    "capacity": CapacityConfig,
    "parallel": ParallelConfig,
}


def from_dict(d: Dict[str, Any], base: Optional[SlamConfig] = None) -> SlamConfig:
    """Build a SlamConfig from a nested dict (e.g. parsed YAML).

    Unknown keys inside a known section are ignored with the same
    spirit as ROS param lookup defaults (reference:
    ``laser_mapping.hpp:648-655`` logs defaults for missing params);
    unknown *sections* raise, to catch typos.
    """
    cfg = base or SlamConfig()
    updates: Dict[str, Any] = {}
    for section, values in d.items():
        if section not in _SECTION_TYPES:
            raise KeyError(f"Unknown config section: {section!r}")
        cls = _SECTION_TYPES[section]
        ftypes = {f.name: f.type for f in dataclasses.fields(cls)}
        filtered = {}
        for k, v in (values or {}).items():
            if k not in ftypes:
                continue
            # Coerce to the declared field type: YAML 1.1 parses `7e-4`
            # (no dot) as a STRING, and ints arrive for float fields —
            # mirror ROS param server typing, which casts to the
            # declared template type (laser_mapping.hpp:648-655).
            t = ftypes[k]
            if t in ("float", float) and not isinstance(v, float):
                v = float(v)
            elif t in ("int", int) and not isinstance(v, int):
                v = int(float(v))
            filtered[k] = v
        updates[section] = dataclasses.replace(getattr(cfg, section), **filtered)
    return dataclasses.replace(cfg, **updates)


def load_yaml(path: str, base: Optional[SlamConfig] = None) -> SlamConfig:
    import yaml

    with open(path) as f:
        d = yaml.safe_load(f) or {}
    return from_dict(d, base)


def precision_profile() -> SlamConfig:
    """The SHIPPED precision profile, faithfully: deblur OFF
    (config/performance_precision.yaml:5 ships `if_motion_deblur: 0`)
    with the node-default `piecewise_number` 3
    (laser_feature_extractor.hpp:141-142) — 3 piecewise registrations
    per 0.1 s frame.  For the deblur-interpolation variant (this
    framework's default config) use `deblur_precision_profile()`."""
    return SlamConfig().replace(common={"if_motion_deblur": 0})


def deblur_precision_profile() -> SlamConfig:
    """Precision knobs with motion deblur ON (effective piecewise 1):
    per-residual slerp compensation instead of piecewise splitting —
    the reference's `if_motion_deblur: 1` variant of the precision
    YAML (laser_feature_extractor.hpp:306-309 forces piece_wise = 1),
    and this framework's default configuration."""
    return SlamConfig()


def realtime_profile() -> SlamConfig:
    """The SHIPPED realtime profile, faithfully: deblur OFF + node
    -default piecewise 3, like precision (see `precision_profile()`),
    plus the realtime knob deltas
    (reference: config/performance_realtime.yaml)."""
    return SlamConfig().replace(
        common={
            "if_motion_deblur": 0,
            "maximum_parallel_thread": 3,
            "if_update_mean_and_cov_incrementally": 0,
            "threshold_cell_revisit": 100000,
        },
        feature_extraction={
            "mapping_line_resolution": 0.2,
            "mapping_plane_resolution": 0.6,
        },
        optimization={"maximum_residual_blocks": 150},
        mapping={
            "maximum_mapping_buffer": 50,
            "maximum_histroy_buffer": 200,
            "maximum_pointcloud_delay_time": 1.0,
            "surround_pointcloud_resolution": 0.5,
        },
    )


def realtime_racing_profile() -> SlamConfig:
    """The realtime profile with its parallelism actually ENABLED the
    TPU way: the reference's `maximum_parallel_thread: 3` worker racing
    (``performance_realtime.yaml:3``, ``laser_mapping.hpp:1737-1742``)
    re-expressed as `parallel/frame_batch = 3` — three raw frames'
    piecewise registrations race in one vmapped dispatch against the
    shared matching buffer and commit in time order, with the motion
    staleness guard (`parallel/batch_motion_guard_t`) falling back to
    sequential dispatch when the platform moves fast."""
    return realtime_profile().replace(parallel={"frame_batch": 3})


def bounded_scene_caps() -> dict:
    """Capacity overrides for BOUNDED scenes (rooms, courtyards — the
    reference's CYT/ZYM class of capture): every static-shape buffer
    sized ~4× its measured P99 fill on such streams instead of the
    worst-case-world defaults.

    SUPERSEDED by the adaptive capacity schedule
    (``capacity.auto_schedule``, runtime/capacity_schedule.py), which
    right-sizes the same buffers dynamically and stays large-world
    safe; this frozen preset remains as the round-4 comparison point
    and for deployments that want fixed shapes with no growth
    recompiles.

    Capacities are TPU static shapes, not behavior — but every padded
    op (sorts, gathers, residual sets; the dense kNN pays the full
    reference axis) costs the CAPACITY, so right-sizing is pure speed:
    measured +36% end-to-end (74 → 101 fps) on the bench stream, with
    the on-device scenario-matrix ATE unchanged on odometry /
    full_mapping / loop (closes) / mid100 (artifact
    ``scripts/ab_bounded_caps_out.json``).  NOT for large-scale worlds:
    largescale_realtime degrades 0.11 → 0.26 m when the map genuinely
    needs the big buffers (overflow drops the newest points beyond
    capacity).  Usage: ``cfg.replace(capacity=bounded_scene_caps())``.
    """
    return {
        "map_corner_capacity": 4096,
        "map_surf_capacity": 16384,
        "max_corner": 512,
        "max_surface": 2048,
        "max_corner_ds": 256,
        "max_surface_ds": 1024,
    }


def largescale_profile() -> SlamConfig:
    """reference: launch/rosbag_largescale.launch:9-10 overrides on the
    realtime profile (line/plane resolution 0.05 / 1.2 m)."""
    return realtime_profile().replace(
        feature_extraction={
            "mapping_line_resolution": 0.05,
            "mapping_plane_resolution": 1.2,
        },
    )
