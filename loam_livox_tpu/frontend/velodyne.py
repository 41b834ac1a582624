"""Classic Velodyne LOAM feature extraction — TPU re-design of the
reference's mechanical-lidar path (`lidar_type velodyne`, reference:
``source/laser_feature_extractor.hpp:393-720``).

Pipeline (same behavior, fixed shapes):

1. NaN / close-range removal (`removeClosedPointCloud`, :211-240),
2. ring (scan line) assignment from the vertical angle — VLP-16 and
   HDL-64 formulas (:432-459),
3. per-point relative time from the azimuth sweep with the
   half-turn unwrap (:402-500); carried in the `time` channel (the
   reference packs ``scanID + scanPeriod·relTime`` into intensity),
4. points regrouped by (ring, original order) (:509-520),
5. curvature over the ±5 window (:522-535),
6. occlusion rejection (depth-scaled gap at jump edges masks 6
   neighbors on the far side) and parallel-beam rejection (:538-601),
7. per-ring × 6 sectors: greedy curvature selection — ≤20 sharp
   (curvature > 0.5) and ≤5 flat (< 0.05) per sector, each pick
   suppressing up to ±5 neighbors until a gap > 0.05 m² (:645-760);
   remaining non-sharp points are the less-flat cloud, voxel-filtered
   (:763-770).

The greedy pick (argmax → suppress → repeat) is the only sequential
part; it runs as a `lax.scan` of 20 (resp. 5) steps, vmapped over all
ring×sector windows.

Output mapping into the odometry pipeline: corners := sharp ∪
less-sharp, surface := less-flat (downsampled) — the Velodyne
equivalents of the Livox feature clouds.  (In the reference the
velodyne branch publishes its five classic LOAM topics and nothing
consumes them in-repo; wiring them into scan-to-map registration is
the natural completion.)
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import CapacityConfig, FeatureExtractionConfig
from ..core.types import FeatureFrame, PointBatch
from ..ops.masked import compact
from ..ops.voxel import voxel_downsample

SHARP_POINT_THRESHOLD = 0.05   # reference :640
SECTORS_PER_SCAN = 6
MAX_SHARP_PER_SECTOR = 20
MAX_FLAT_PER_SECTOR = 5
SUPPRESS_GAP_SQ = 0.05         # reference :688,699


def _scan_id(xyz, mask, n_lines: int):
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    angle = jnp.arctan2(z, jnp.sqrt(x * x + y * y)) * 180.0 / jnp.pi
    if n_lines == 16:
        sid = jnp.floor((angle + 15.0) / 2.0 + 0.5).astype(jnp.int32)
        ok = (sid >= 0) & (sid <= 15)
    elif n_lines == 64:
        sid_hi = jnp.floor((2.0 - angle) * 3.0 + 0.5).astype(jnp.int32)
        sid_lo = 32 + jnp.floor((-8.83 - angle) * 2.0 + 0.5).astype(jnp.int32)
        sid = jnp.where(angle >= -8.83, sid_hi, sid_lo)
        ok = (angle <= 2.0) & (angle >= -24.33) & (sid >= 0) & (sid <= 50)
    else:
        raise ValueError(f"unsupported scan_line count {n_lines}")
    return jnp.clip(sid, 0, n_lines - 1), mask & ok


def _relative_time(xyz, mask):
    """Azimuth-based sweep fraction ∈ [0, 1] (reference :402-500).

    The reference's `halfPassed` flag is sequential; here it is the
    running-or of the pre-adjusted angle having passed π — identical
    for normal single-sweep clouds."""
    x, y = xyz[:, 0], xyz[:, 1]
    ori = -jnp.arctan2(y, x)
    idxs = jnp.arange(xyz.shape[0])
    first = jnp.argmax(mask)                      # first valid point
    last = xyz.shape[0] - 1 - jnp.argmax(mask[::-1])
    start = ori[first]
    end = ori[last] + 2 * jnp.pi
    end = jnp.where(end - start > 3 * jnp.pi, end - 2 * jnp.pi,
                    jnp.where(end - start < jnp.pi, end + 2 * jnp.pi, end))
    pre = ori
    pre = jnp.where(pre < start - jnp.pi / 2, pre + 2 * jnp.pi, pre)
    pre = jnp.where(pre > start + 3 * jnp.pi / 2, pre - 2 * jnp.pi, pre)
    half = lax.associative_scan(
        jnp.logical_or, mask & (pre - start > jnp.pi))
    post = ori + 2 * jnp.pi
    post = jnp.where(post < end - 3 * jnp.pi / 2, post + 2 * jnp.pi, post)
    post = jnp.where(post > end + jnp.pi / 2, post - 2 * jnp.pi, post)
    o = jnp.where(half, post, pre)
    rel = (o - start) / jnp.maximum(end - start, 1e-6)
    return jnp.clip(rel, 0.0, 1.0)


@partial(jax.jit, static_argnames=("fe", "caps"))
def extract_velodyne_features(
    xyz: jax.Array,
    in_mask: jax.Array,
    base_time: jax.Array,
    fe: FeatureExtractionConfig,
    caps: CapacityConfig,
    minimum_range: float = 0.1,
    scan_period: float = 0.1,
) -> FeatureFrame:
    n = xyz.shape[0]
    n_lines = fe.scan_line
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    xs = jnp.where(finite[:, None], xyz, 0.0)
    d2 = jnp.sum(xs * xs, axis=-1)
    mask = in_mask & finite & (d2 >= minimum_range**2)

    sid, mask = _scan_id(xs, mask, n_lines)
    rel = _relative_time(xs, mask)
    time = base_time + scan_period * rel

    # ---- regroup by (ring, original idx) --------------------------------
    sort_key = jnp.where(mask, sid, n_lines) * n + jnp.arange(n)
    order = jnp.argsort(sort_key)
    p = xs[order]
    m = mask[order]
    s = jnp.where(m, sid[order], n_lines)
    t = time[order]

    # ring start/end in the concatenated layout (+5 / −6 margins,
    # reference :513-517)
    ring_ids = jnp.arange(n_lines)
    counts = jnp.sum(jnp.where(m[None, :], s[None, :] == ring_ids[:, None],
                               False), axis=1)
    starts = jnp.concatenate([jnp.zeros(1, counts.dtype),
                              jnp.cumsum(counts)[:-1]])
    sp_ring = starts + 5
    ep_ring = starts + counts - 6

    # ---- curvature over ±5 (reference :522-535) -------------------------
    def shift(a, k):
        pad = jnp.zeros((abs(k),) + a.shape[1:], a.dtype)
        return jnp.concatenate([a[k:], pad]) if k > 0 else (
            a if k == 0 else jnp.concatenate([pad, a[:k]]))

    acc = -10.0 * p
    for off in range(1, 6):
        acc = acc + shift(p, off) + shift(p, -off)
    curv = jnp.sum(acc * acc, axis=-1)
    ring_of = s
    same_ring = jnp.zeros(n, bool)
    idxs = jnp.arange(n)
    in_ring_window = (idxs[None, :] >= sp_ring[:, None]) & (
        idxs[None, :] <= ep_ring[:, None])
    interior = jnp.any(in_ring_window, axis=0) & m
    curv = jnp.where(interior, curv, 0.0)

    # ---- occlusion + parallel-beam rejection (reference :538-601) -------
    picked = ~m
    depth = jnp.sqrt(jnp.maximum(jnp.sum(p * p, axis=-1), 1e-12))
    nxt = shift(p, 1)
    d_nxt = shift(depth, 1)
    big = curv > 0.1
    # far side of a jump edge masked (6 points)
    gap_a = jnp.linalg.norm(nxt - p * (d_nxt / jnp.maximum(depth, 1e-9))[:, None],
                            axis=-1) / jnp.maximum(d_nxt, 1e-9)
    gap_b = jnp.linalg.norm(nxt * (depth / jnp.maximum(d_nxt, 1e-9))[:, None] - p,
                            axis=-1) / jnp.maximum(depth, 1e-9)
    occ_a = big & (depth > d_nxt) & (gap_a < 0.1)   # mask i-5..i
    occ_b = big & (depth <= d_nxt) & (gap_b < 0.1)  # mask i+1..i+6
    occ_mask = jnp.zeros(n, bool)
    for off in range(0, 6):
        occ_mask = occ_mask | shift(occ_a, off)      # j s.t. j+off is edge
    for off in range(1, 7):
        occ_mask = occ_mask | shift(occ_b, -off)     # j s.t. j-off is edge
    prv = shift(p, -1)
    diff2 = jnp.sum((p - prv) ** 2, axis=-1)
    dis = jnp.sum(p * p, axis=-1)
    parallel = (curv > 0.0002 * dis) & (diff2 > 0.0002 * dis)
    picked = picked | occ_mask | parallel

    # ---- per ring×sector greedy selection (reference :645-760) ----------
    S = n_lines * SECTORS_PER_SCAN
    L = max(8, -(-n // S) + 16)   # padded sector window length

    j = jnp.arange(SECTORS_PER_SCAN)
    sp = ((sp_ring[:, None] * (SECTORS_PER_SCAN - j[None, :])
           + ep_ring[:, None] * j[None, :]) // SECTORS_PER_SCAN)
    ep = ((sp_ring[:, None] * (SECTORS_PER_SCAN - 1 - j[None, :])
           + ep_ring[:, None] * (j[None, :] + 1)) // SECTORS_PER_SCAN) - 1
    sp = sp.reshape(S)
    ep = ep.reshape(S)
    win = sp[:, None] + jnp.arange(L)[None, :]         # (S, L) global idx
    win_ok = (win <= ep[:, None]) & (ep[:, None] >= sp[:, None])
    win_c = jnp.clip(win, 0, n - 1)
    wcurv = jnp.where(win_ok, curv[win_c], 0.0)
    wpicked = jnp.where(win_ok, picked[win_c], True)
    wgap = jnp.sum((p[win_c] - shift(p, -1)[win_c]) ** 2, axis=-1)  # |p_i−p_{i−1}|²

    def suppress(sel_onehot, base_picked):
        """Mark ±5 neighbors of the selected slot, stopping at the
        first inter-point gap > 0.05 (reference :682-712)."""
        out = base_picked | sel_onehot
        run = sel_onehot
        for _ in range(5):   # forward: stop when gap(l) > thr
            nxt_ok = jnp.concatenate(
                [jnp.zeros((sel_onehot.shape[0], 1), bool),
                 run[:, :-1] & (wgap[:, 1:] <= SUPPRESS_GAP_SQ)], axis=1)
            out = out | nxt_ok
            run = nxt_ok
        run = sel_onehot
        for _ in range(5):   # backward
            prv_ok = jnp.concatenate(
                [run[:, 1:] & (wgap[:, 1:] <= SUPPRESS_GAP_SQ),
                 jnp.zeros((sel_onehot.shape[0], 1), bool)], axis=1)
            out = out | prv_ok
            run = prv_ok
        return out

    def pick_loop(avail0, want_max: bool, n_picks: int, thr_cmp):
        def step(carry, _):
            avail, chosen = carry
            score = jnp.where(avail, wcurv, -jnp.inf if want_max else jnp.inf)
            best = (jnp.argmax(score, axis=1) if want_max
                    else jnp.argmin(score, axis=1))
            bval = jnp.take_along_axis(wcurv, best[:, None], axis=1)[:, 0]
            ok = thr_cmp(bval) & jnp.take_along_axis(
                avail, best[:, None], axis=1)[:, 0]
            onehot = (jnp.arange(L)[None, :] == best[:, None]) & ok[:, None]
            avail = ~suppress(onehot, ~avail)
            chosen = chosen | onehot
            return (avail, chosen), None

        init = (avail0, jnp.zeros_like(avail0))
        (avail, chosen), _ = lax.scan(step, init, None, length=n_picks)
        return chosen, avail

    avail0 = win_ok & ~wpicked
    sharp, avail1 = pick_loop(
        avail0, True, MAX_SHARP_PER_SECTOR,
        lambda v: v > SHARP_POINT_THRESHOLD * 10)
    flat, _ = pick_loop(
        avail1, False, MAX_FLAT_PER_SECTOR,
        lambda v: v < SHARP_POINT_THRESHOLD)

    corner_sel = jnp.zeros(n, bool).at[win_c.reshape(-1)].max(
        sharp.reshape(-1), mode="drop")
    flat_sel = jnp.zeros(n, bool).at[win_c.reshape(-1)].max(
        flat.reshape(-1), mode="drop")
    # less-flat: every in-sector point that is not sharp (label ≤ 0,
    # reference :761-768)
    insector = jnp.zeros(n, bool).at[win_c.reshape(-1)].max(
        win_ok.reshape(-1), mode="drop")
    lessflat_sel = insector & ~corner_sel & m

    def gather(sel, cap):
        mm, px, pt = compact(sel, p, t, capacity=None)
        return PointBatch(xyz=jnp.where(mm[:, None], px, 0.0), time=pt, mask=mm)

    corners = gather(corner_sel, caps.max_corner)
    surface = gather(lessflat_sel, caps.max_surface)
    surface = voxel_downsample(surface, fe.mapping_plane_resolution / 2.0)
    full = PointBatch(xyz=jnp.where(m[:, None], p, 0.0), time=t, mask=m)

    tmin = jnp.min(jnp.where(m, t, jnp.inf))
    tmax = jnp.max(jnp.where(m, t, -jnp.inf))
    tmin = jnp.where(jnp.isfinite(tmin), tmin, 0.0)
    tmax = jnp.where(jnp.isfinite(tmax), tmax, 0.0)
    return FeatureFrame(corners=corners, surface=surface, full=full,
                        time_min=tmin, time_max=tmax)
