"""Adaptive capacity schedule — right-sized static shapes for XLA.

The reference grows its clouds and KD-trees dynamically
(``std::vector``/PCL everywhere); XLA needs static shapes, so round 1
froze worst-case capacities (`core.config.CapacityConfig`) and every
padded op has paid the worst case since — measured fills on bounded
scenes (rooms, courtyards: the reference's CYT/ZYM class of capture)
are 1-5% of it.  `bounded_scene_caps()` froze one good operating point;
this module makes the choice adaptive, the standard TPU answer to
dynamic shapes (bucketed compilation):

* the fill-driven buffers start at ``1/schedule_start_scale`` of their
  configured capacity (with per-field floors),
* the pipeline measures buffer fills as it drains results
  (`measure_fills`, one tiny dispatch every few frames),
* when any fill crosses ``schedule_watermark`` of its current capacity
  — or a frame-feature buffer SATURATES (fill == capacity means the
  padded op already truncated) — every scheduled field doubles: one
  recompile (cached persistently), state re-padded in place
  (`resize_state` is pad-only, so no information is ever dropped by a
  growth step), monotonic, capped at the configured worst case.

A large-scale world therefore converges to exactly the configured
capacities (the pre-schedule behavior), while a bounded scene runs the
whole session at shapes a few percent of them.  Capacities are
execution shapes, not behavior — the on-device scenario-matrix ATE is
the regression guard (tests/test_capacity_schedule.py pins trajectory
agreement between scheduled and worst-case runs).

The schedule stays INACTIVE where shapes are part of a contract:
product-mesh / explicit-deterministic runs (the multi-chip equivalence
legs compare bitwise across layouts — tests/test_parallel_mode.py),
the grid correspondence engine (bucket tables are sized statically),
and raw `odometry_step` callers.  Racing and chunked dispatch DO
participate: tiers only change between group dispatches, which are the
same boundaries their per-group semantics are defined at.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SlamConfig

#: fill-driven capacity fields and their floors.  `max_raw_points` is
#: sensor-fixed; `max_corner`/`max_surface` hold RAW per-piece feature
#: candidates whose fills track point density, not scene sparsity —
#: they saturate immediately on a 10k-point stream, so scaling them
#: would only burn two recompiles; cell/bucket/window fields are
#: semantic or contract-sized.
SCALED_FIELDS = {
    "max_corner_ds": 128,
    "max_surface_ds": 256,
    "hist_corner_capacity": 64,
    "hist_surf_capacity": 128,
    "map_corner_capacity": 512,
    "map_surf_capacity": 1024,
}

#: frame-feature buffers: a drain-time fill EQUAL to capacity means the
#: producing op already truncated this frame — grow immediately even
#: below the watermark.
SATURATION_FIELDS = ("max_corner_ds", "max_surface_ds",
                     "hist_corner_capacity", "hist_surf_capacity")


def _round64(n: int) -> int:
    return max(64, (n + 63) // 64 * 64)


def scaled_caps(cfg: SlamConfig, scale: int) -> SlamConfig:
    """`cfg` with every scheduled capacity divided by `scale` (floored,
    64-aligned, never above the configured value)."""
    caps = cfg.capacity
    over = {}
    for f, floor in SCALED_FIELDS.items():
        full = getattr(caps, f)
        over[f] = min(full, max(floor, _round64(full // scale)))
    return cfg.replace(capacity=over)


#: order of the fill fields in the `measure_fills` vector (the matching
#: capacity field per entry).  hist fills proxy the per-piece ICP query
#: fills (same voxel leaf), which are not retained in state.
FILL_FIELDS = ("map_corner_capacity", "map_surf_capacity",
               "hist_corner_capacity", "hist_surf_capacity",
               "max_corner_ds", "max_surface_ds")


@jax.jit
def measure_fills(state) -> jax.Array:
    """Buffer fills from the live state as ONE (6,) int32 vector — a
    single device→host transfer per check (per-scalar reads each pay a
    full round trip through a remote-TPU tunnel)."""
    i32 = jnp.int32
    hist_c = jnp.max(jnp.sum(state.hist_corner_mask.astype(i32), axis=1))
    hist_s = jnp.max(jnp.sum(state.hist_surf_mask.astype(i32), axis=1))
    return jnp.stack([
        jnp.sum(state.map_corners.mask.astype(i32)),
        jnp.sum(state.map_surface.mask.astype(i32)),
        hist_c,
        hist_s,
        hist_c,
        hist_s,
    ])


def needs_growth(fills, cfg: SlamConfig, watermark: float) -> bool:
    caps = cfg.capacity
    fills = np.asarray(fills)
    for f, fill in zip(FILL_FIELDS, fills):
        cap = getattr(caps, f)
        if f in SATURATION_FIELDS and int(fill) >= cap:
            return True
        if int(fill) > watermark * cap:
            return True
    return False


@partial(jax.jit, static_argnames=("cfg",))
def resize_state(state, cfg: SlamConfig):
    """Re-pad a state pytree to `cfg`'s capacities (grow-only: every
    scheduled buffer keeps its valid prefix and gains zero/False
    padding, so a growth step never drops a point)."""
    from ..core.types import PointBatch
    from .odometry import init_state

    tpl = jax.eval_shape(lambda: init_state(cfg))

    def fit(x, t):
        x = jnp.asarray(x)
        if x.shape == t.shape:
            return x.astype(t.dtype)
        pads = []
        slc = []
        for have, want in zip(x.shape, t.shape):
            assert want >= have, (
                f"capacity schedule shrank a buffer axis {have}->{want}; "
                "the schedule is grow-only")
            pads.append((0, want - have))
            slc.append(slice(0, have))
        return jnp.zeros(t.shape, t.dtype).at[tuple(slc)].set(
            x.astype(t.dtype))

    return jax.tree_util.tree_map(fit, state, tpl)


class CapacityScheduler:
    """Host-side driver of the schedule for one pipeline instance."""

    def __init__(self, base_cfg: SlamConfig):
        caps = base_cfg.capacity
        self.base_cfg = base_cfg
        self.scale = max(1, int(caps.schedule_start_scale))
        self.watermark = float(caps.schedule_watermark)
        self.cfg = scaled_caps(base_cfg, self.scale)
        self.growths = 0

    def at_max(self) -> bool:
        return self.scale <= 1

    def maybe_grow(self, state):
        """Measure fills; if any crossed its watermark, double every
        scheduled capacity and re-pad the state.  Returns
        (state, cfg, grew)."""
        if self.at_max():
            return state, self.cfg, False
        fills = np.asarray(measure_fills(state))   # one d2h round trip
        grew = False
        while self.scale > 1 and needs_growth(fills, self.cfg,
                                              self.watermark):
            self.scale //= 2
            self.cfg = scaled_caps(self.base_cfg, self.scale)
            self.growths += 1
            grew = True
        if grew:
            state = resize_state(state, self.cfg)
        return state, self.cfg, grew


def schedule_active(cfg: SlamConfig, mesh) -> bool:
    """Whether the adaptive schedule may drive this pipeline (see
    module doc for the shape-pinned contracts that disable it)."""
    if not cfg.capacity.auto_schedule:
        return False
    if mesh is not None or int(cfg.parallel.mesh_devices) > 1:
        return False
    if int(cfg.parallel.deterministic) == 1:
        return False
    if cfg.optimization.correspondence == "grid":
        return False
    if int(cfg.mapping.matching_mode) == 1:
        # Cell matching mode gathers the whole in-radius map each
        # rebuild: its buffer fill JUMPS discontinuously the moment
        # registration enables, so the watermark cannot grow tiers
        # ahead of truncation (measured: full_mapping ATE 0.09 → 0.31
        # through the one-check lag window).  History mode's fill grows
        # one frame at a time, which the watermark anticipates.
        return False
    return True
