"""Core pytree types: padded point batches, feature frames, poses.

The reference passes dynamically sized PCL clouds between components;
the TPU-native design replaces every cloud with a fixed-capacity
(points, mask) pair so all programs compile once.  The per-point
``time`` channel replaces the reference's trick of smuggling the
timestamp through PCL's ``intensity`` field
(reference: ``source/livox_feature_extractor.hpp:246-264``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3


class PointBatch(NamedTuple):
    """A fixed-capacity masked point set.

    xyz:  (N, 3) float32 — padded entries are zeros.
    time: (N,)  float32 — per-point timestamp (the motion-blur side
          channel; reference keeps it in `intensity`).
    mask: (N,)  bool — True where the slot holds a real point.
    """

    xyz: jax.Array
    time: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "PointBatch":
        return PointBatch(
            xyz=jnp.zeros((capacity, 3), dtype),
            time=jnp.zeros((capacity,), dtype),
            mask=jnp.zeros((capacity,), bool),
        )

    @staticmethod
    def from_xyz(xyz: jax.Array, time: jax.Array | None = None,
                 mask: jax.Array | None = None) -> "PointBatch":
        n = xyz.shape[-2]
        if time is None:
            time = jnp.zeros(xyz.shape[:-1], xyz.dtype)
        if mask is None:
            mask = jnp.ones(xyz.shape[:-1], bool)
        del n
        return PointBatch(xyz=xyz, time=time, mask=mask)

    def pad_to(self, capacity: int) -> "PointBatch":
        n = self.capacity
        if capacity < n:
            raise ValueError(f"cannot pad {n} points into capacity {capacity}")
        pad = capacity - n
        return PointBatch(
            xyz=jnp.pad(self.xyz, ((0, pad), (0, 0))),
            time=jnp.pad(self.time, (0, pad)),
            mask=jnp.pad(self.mask, (0, pad)),
        )

    def transform(self, q: jax.Array, t: jax.Array) -> "PointBatch":
        return self._replace(xyz=se3.pose_transform(q, t, self.xyz))


class Pose(NamedTuple):
    """World pose as (wxyz quaternion, translation)."""

    q: jax.Array
    t: jax.Array

    @staticmethod
    def identity(dtype=jnp.float32) -> "Pose":
        return Pose(q=se3.quat_identity(dtype), t=jnp.zeros(3, dtype))

    def compose(self, other: "Pose") -> "Pose":
        q, t = se3.pose_compose(self.q, self.t, other.q, other.t)
        return Pose(q=q, t=t)

    def inverse(self) -> "Pose":
        q, t = se3.pose_inverse(self.q, self.t)
        return Pose(q=q, t=t)

    def apply(self, pts: jax.Array) -> jax.Array:
        return se3.pose_transform(self.q, self.t, pts)


class FeatureFrame(NamedTuple):
    """Output of the front-end for one (piece of a) frame: the corner /
    surface / full-resolution feature clouds that the reference publishes
    on /pc2_corners, /pc2_surface, /pc2_full
    (reference: ``source/laser_feature_extractor.hpp:367-384``)."""

    corners: PointBatch
    surface: PointBatch
    full: PointBatch
    # Frame-level [min, max] point timestamps used to normalize the
    # motion-blur interpolation fraction
    # (reference: ``laser_mapping.hpp:1330-1352``).
    time_min: jax.Array
    time_max: jax.Array
