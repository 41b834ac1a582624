"""Multi-LiDAR (Livox Mid-100) front-end: up to three sensor slots
extracted in one vmapped program and merged into a single feature
frame per piecewise window.

The reference subscribes ``/laser_points_0..2``, runs the same
`Livox_laser` per topic, caches per-lidar per-piece feature clouds, and
publishes the merge when lidar 0's frame arrives (reference:
``laser_feature_extractor.hpp:85,173-180, 305-389``).  TPU-native: the
sensor axis is a leading vmap axis — one compiled program processes all
heads — and the "publish merge" is a concatenation of the per-sensor
masked batches.  Optional per-sensor extrinsics rotate each head's
points into the common vehicle frame (the Mid-100 driver publishes a
common frame, so the default is identity — matching the reference,
which applies no transforms)."""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.config import CapacityConfig, FeatureExtractionConfig
from ..core.types import FeatureFrame, PointBatch
from .livox import extract_point_info, select_features


def _merge_batches(batches) -> PointBatch:
    return PointBatch(
        xyz=jnp.concatenate([b.xyz for b in batches]),
        time=jnp.concatenate([b.time for b in batches]),
        mask=jnp.concatenate([b.mask for b in batches]),
    )


@partial(jax.jit, static_argnames=("fe", "caps", "piecewise_number"))
def extract_multi_lidar(
    xyz: jax.Array,            # (S, N, 3) per-sensor raw points
    intensity: jax.Array,      # (S, N)
    mask: jax.Array,           # (S, N)
    base_time: jax.Array,      # () shared frame timestamp
    fe: FeatureExtractionConfig,
    caps: CapacityConfig,
    piecewise_number: int = 1,
    extrinsic_q: Optional[jax.Array] = None,   # (S, 4) wxyz
    extrinsic_t: Optional[jax.Array] = None,   # (S, 3)
):
    """Returns `piecewise_number` merged FeatureFrames (capacities are
    S× the single-sensor capacities)."""
    s = xyz.shape[0]
    bt = jnp.broadcast_to(jnp.asarray(base_time, jnp.float32), (s,))

    info, n_petals = jax.vmap(
        lambda x, i, m, t: extract_point_info(x, i, m, t, fe, caps)
    )(xyz, intensity, mask, bt)

    frames = []
    for p in range(piecewise_number):
        lo = p / piecewise_number
        hi = (p + 1) / piecewise_number
        per_sensor = jax.vmap(
            lambda x, inf, np_: select_features(
                x, inf, np_, lo, hi, fe, caps)
        )(xyz, info, n_petals)

        def sensor_batch(tree, i):
            b = jax.tree_util.tree_map(lambda a: a[i], tree)
            if extrinsic_q is not None:
                pts = se3.quat_rotate(extrinsic_q[i], b.xyz)
                if extrinsic_t is not None:
                    pts = pts + extrinsic_t[i]
                b = b._replace(xyz=jnp.where(b.mask[:, None], pts, 0.0))
            return b

        corners = _merge_batches(
            [sensor_batch(per_sensor.corners, i) for i in range(s)])
        surface = _merge_batches(
            [sensor_batch(per_sensor.surface, i) for i in range(s)])
        full = _merge_batches(
            [sensor_batch(per_sensor.full, i) for i in range(s)])
        tmin = jnp.min(per_sensor.time_min)
        tmax = jnp.max(per_sensor.time_max)
        frames.append(FeatureFrame(corners=corners, surface=surface,
                                   full=full, time_min=tmin, time_max=tmax))
    return frames
