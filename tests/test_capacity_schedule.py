"""Adaptive capacity schedule (`runtime/capacity_schedule.py`):
right-sized static shapes that grow toward the configured worst case as
measured fills demand — capacities are execution shapes, not behavior,
so a scheduled run must track the worst-case run's trajectory."""
import numpy as np
import pytest

import jax.numpy as jnp

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.runtime.capacity_schedule import (
    CapacityScheduler,
    SCALED_FIELDS,
    measure_fills,
    needs_growth,
    resize_state,
    scaled_caps,
    schedule_active,
)
from loam_livox_tpu.runtime.odometry import init_state

SMALL = {
    "max_raw_points": 4096, "max_corner": 256, "max_surface": 1024,
    "max_corner_ds": 256, "max_surface_ds": 1024,
    "map_corner_capacity": 4096, "map_surf_capacity": 16384,
    "hist_corner_capacity": 128, "hist_surf_capacity": 1024,
    "history_window": 16,
}


def small_cfg(**caps):
    return SlamConfig().replace(
        common={"if_motion_deblur": 0, "piecewise_number": 1},
        mapping={"init_accumulate_frames": 4},
        capacity={**SMALL, **caps},
    )


def test_scaled_caps_floors_and_cap():
    cfg = small_cfg()
    lo = scaled_caps(cfg, 1 << 20)          # absurd scale → floors
    for f, floor in SCALED_FIELDS.items():
        assert getattr(lo.capacity, f) == min(getattr(cfg.capacity, f),
                                              floor)
    full = scaled_caps(cfg, 1)
    for f in SCALED_FIELDS:
        assert getattr(full.capacity, f) == getattr(cfg.capacity, f)
    # non-scheduled fields untouched
    assert lo.capacity.max_raw_points == cfg.capacity.max_raw_points
    assert lo.capacity.history_window == cfg.capacity.history_window


def test_resize_state_grow_only_preserves_content():
    cfg_small = scaled_caps(small_cfg(), 8)
    cfg_big = scaled_caps(small_cfg(), 2)
    st = init_state(cfg_small)
    cap = st.map_surface.capacity
    xyz = jnp.arange(cap * 3, dtype=jnp.float32).reshape(cap, 3)
    mask = jnp.arange(cap) < 7
    st = st._replace(map_surface=st.map_surface._replace(xyz=xyz, mask=mask))
    big = resize_state(st, cfg_big)
    assert big.map_surface.capacity == cfg_big.capacity.map_surf_capacity
    np.testing.assert_array_equal(np.asarray(big.map_surface.xyz[:cap]),
                                  np.asarray(xyz))
    assert int(big.map_surface.mask.sum()) == 7
    assert not bool(big.map_surface.mask[cap:].any())
    # shrinking must refuse
    with pytest.raises(AssertionError):
        resize_state(big, cfg_small)


def test_growth_trigger_watermark_and_saturation():
    cfg = scaled_caps(small_cfg(), 8)
    st = init_state(cfg)
    fills = measure_fills(st)
    assert not needs_growth(fills, cfg, 0.7)
    # map fill beyond watermark
    cap = st.map_surface.capacity
    st2 = st._replace(map_surface=st.map_surface._replace(
        mask=jnp.arange(cap) < int(0.8 * cap)))
    assert needs_growth(measure_fills(st2), cfg, 0.7)
    # hist-slot saturation triggers even below the watermark field set
    hs = st.hist_surf_mask.at[0].set(True)
    st3 = st._replace(hist_surf_mask=hs)
    assert needs_growth(measure_fills(st3), cfg, 0.999)


def test_schedule_inactive_under_pinned_contracts():
    cfg = small_cfg()
    assert schedule_active(cfg, None)
    assert not schedule_active(
        cfg.replace(capacity={"auto_schedule": 0}), None)
    assert not schedule_active(
        cfg.replace(parallel={"mesh_devices": 2}), None)
    assert not schedule_active(
        cfg.replace(parallel={"deterministic": 1}), None)
    assert not schedule_active(
        cfg.replace(optimization={"correspondence": "grid"}), None)
    # group-dispatch modes participate (tiers move at group boundaries)
    assert schedule_active(cfg.replace(parallel={"frame_batch": 3}), None)
    assert schedule_active(cfg.replace(parallel={"dispatch_chunk": 4}), None)


def test_scheduled_pipeline_tracks_worst_case_trajectory():
    """End-to-end: auto-scheduled run vs shape-pinned worst-case run on
    the same stream — growth happens, and the trajectories agree (the
    registration inputs are identical whenever no buffer truncates;
    the watermark grows tiers before meaningful truncation)."""
    from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig
    from loam_livox_tpu.runtime.pipeline import OdometryPipeline

    def run(auto):
        cfg = small_cfg(auto_schedule=auto, schedule_start_scale=8,
                        schedule_watermark=0.6)
        pipe = OdometryPipeline(cfg)
        sim = LivoxSimulator(SimConfig(points_per_frame=3072))
        for i in range(16):
            xyz, inten, t0 = sim.frame(i)
            pipe.process_raw(xyz, inten, t0)
        pipe.flush()
        return pipe

    pinned = run(0)
    sched = run(1)
    assert sched.scheduler is not None
    assert sched.scheduler.growths >= 1          # tiers actually moved
    a = pinned.trajectory.positions_array()
    b = sched.trajectory.positions_array()
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-2)
    assert pinned.trajectory.accepted == sched.trajectory.accepted


def test_checkpoint_roundtrip_preserves_tier(tmp_path):
    from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig
    from loam_livox_tpu.runtime.checkpoint import (
        load_pipeline,
        save_pipeline,
    )
    from loam_livox_tpu.runtime.pipeline import OdometryPipeline

    cfg = small_cfg(auto_schedule=1, schedule_start_scale=8,
                    schedule_watermark=0.6)
    pipe = OdometryPipeline(cfg)
    sim = LivoxSimulator(SimConfig(points_per_frame=3072))
    for i in range(10):
        xyz, inten, t0 = sim.frame(i)
        pipe.process_raw(xyz, inten, t0)
    pipe.flush()
    save_pipeline(pipe, str(tmp_path / "ckpt"))
    restored = load_pipeline(str(tmp_path / "ckpt"), cfg)
    assert restored.scheduler.scale == pipe.scheduler.scale
    assert (restored.state.map_surface.capacity
            == pipe.state.map_surface.capacity)
    # resumed run keeps stepping at the restored tier
    for i in range(10, 13):
        xyz, inten, t0 = sim.frame(i)
        restored.process_raw(xyz, inten, t0)
    restored.flush()
    assert len(restored.trajectory.positions) == 3
