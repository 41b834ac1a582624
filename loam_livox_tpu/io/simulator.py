"""Synthetic Livox scan simulator.

The reference is validated by replaying curated rosbags
(reference: ``README.md:76-137``); those bags cannot be shipped here, so
this module provides the equivalent ground-truthed data source: a
rosette (petal) scan pattern matching the Mid-40's geometry — small
~17° half-FoV around +X (reference: ``livox_feature_extractor.hpp:143``),
10 µs per-point spacing (``:145``), petal-shaped polar-distance
oscillation that the front-end's split detector expects (``:529-573``)
— raycast against procedurally generated box scenes from a smooth
6-DoF trajectory, including realistic intra-frame motion blur (every
point is cast from the pose at its own timestamp).

Host-side numpy on purpose: this is the data loader, not the compute
path.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import numpy as np

from ..core import se3
import jax.numpy as jnp


@dataclass
class RosettePattern:
    """Direction generator for a Mid-40-like non-repetitive rosette."""

    max_fov_deg: float = 16.0      # stay inside the 17° circle-edge mask
    petal_hz: float = 100.0        # polar-distance oscillation frequency
    rot_hz: float = 13.7           # petal azimuth rotation (irrational-ish)

    def directions(self, times: np.ndarray) -> np.ndarray:
        """Unit direction vectors in the sensor frame, (N, 3)."""
        r_max = np.tan(np.deg2rad(self.max_fov_deg))
        r = r_max * np.abs(np.sin(np.pi * self.petal_hz * times))
        phi = 2 * np.pi * self.rot_hz * times
        u = r * np.cos(phi)
        v = r * np.sin(phi)
        d = np.stack([np.ones_like(u), u, v], axis=-1)
        return d / np.linalg.norm(d, axis=-1, keepdims=True)


@dataclass
class BoxScene:
    """Axis-aligned boxes; the room walls are six thin slabs."""

    boxes: np.ndarray  # (B, 2, 3): [:, 0] = lo corner, [:, 1] = hi corner
    reflectivity: np.ndarray  # (B,)

    @staticmethod
    def random_room(
        rng: np.random.Generator,
        half_extent: float = 12.0,
        n_boxes: int = 14,
    ) -> "BoxScene":
        e = half_extent
        w = 0.5  # wall thickness
        walls = [
            [[e, -e - w, -e - w], [e + w, e + w, e + w]],     # +x
            [[-e - w, -e - w, -e - w], [-e, e + w, e + w]],   # -x
            [[-e - w, e, -e - w], [e + w, e + w, e + w]],     # +y
            [[-e - w, -e - w, -e - w], [e + w, -e, e + w]],   # -y
            [[-e - w, -e - w, e], [e + w, e + w, e + w]],     # +z (ceiling)
            [[-e - w, -e - w, -e - w], [e + w, e + w, -e]],   # -z (floor)
        ]
        boxes = [np.array(b, np.float64) for b in walls]
        for _ in range(n_boxes):
            c = rng.uniform(-0.7 * e, 0.7 * e, size=3)
            s = rng.uniform(0.4, 2.5, size=3)
            boxes.append(np.stack([c - s / 2, c + s / 2]))
        arr = np.stack(boxes)
        refl = rng.uniform(0.5, 1.5, size=len(arr))
        return BoxScene(arr, refl)

    def raycast(self, origins: np.ndarray, dirs: np.ndarray):
        """First-hit distances along each ray (slab method, vectorized).

        Returns (t_hit (N,), box_idx (N,)); t_hit = inf where no hit.
        """
        o = origins[:, None, :]           # (N, 1, 3)
        d = dirs[:, None, :]
        lo = self.boxes[None, :, 0, :]    # (1, B, 3)
        hi = self.boxes[None, :, 1, :]
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        tmin = np.max(np.minimum(t1, t2), axis=-1)   # (N, B)
        tmax = np.min(np.maximum(t1, t2), axis=-1)
        hit = (tmax >= tmin) & (tmax > 0)
        t_enter = np.where(tmin > 0, tmin, tmax)     # inside a box → exit
        t_enter = np.where(hit, t_enter, np.inf)
        box_idx = np.argmin(t_enter, axis=1)
        t_hit = t_enter[np.arange(len(origins)), box_idx]
        return t_hit, box_idx


@dataclass
class Trajectory:
    """Smooth analytic 6-DoF trajectory (sum of low-frequency sinusoids)."""

    lin_amp: np.ndarray = field(default_factory=lambda: np.array([2.0, 1.5, 0.3]))
    lin_hz: np.ndarray = field(default_factory=lambda: np.array([0.05, 0.04, 0.08]))
    yaw_amp: float = 0.6
    yaw_hz: float = 0.05
    pitch_amp: float = 0.12
    pitch_hz: float = 0.07

    def position(self, t: np.ndarray) -> np.ndarray:
        t = np.atleast_1d(np.asarray(t, np.float64))
        p = self.lin_amp[None, :] * np.sin(2 * np.pi * self.lin_hz[None, :] * t[:, None])
        return p

    def quaternion(self, t: np.ndarray) -> np.ndarray:
        """wxyz quaternions, (N, 4): yaw then pitch, smooth in t."""
        t = np.atleast_1d(np.asarray(t, np.float64))
        yaw = self.yaw_amp * np.sin(2 * np.pi * self.yaw_hz * t)
        pitch = self.pitch_amp * np.sin(2 * np.pi * self.pitch_hz * t + 1.0)
        cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
        cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
        # q = q_yaw(z) ⊗ q_pitch(y)
        return np.stack(
            [cy * cp, -sy * sp, cy * sp, sy * cp], axis=-1
        )

    def pose(self, t):
        return self.quaternion(t), self.position(t)


@dataclass
class SimConfig:
    points_per_frame: int = 10000
    frame_period: float = 0.1
    point_dt: float = 1.0e-5
    noise_std: float = 0.005
    dropout_rate: float = 0.002   # x==0 driver dropouts
    seed: int = 0


class LivoxSimulator:
    def __init__(self, cfg: SimConfig | None = None,
                 scene: BoxScene | None = None,
                 traj: Trajectory | None = None,
                 pattern: RosettePattern | None = None):
        self.cfg = cfg or SimConfig()
        self.rng = np.random.default_rng(self.cfg.seed)
        self.scene = scene or BoxScene.random_room(self.rng)
        self.traj = traj or Trajectory()
        self.pattern = pattern or RosettePattern()

    def frame(self, frame_idx: int) -> Tuple[np.ndarray, np.ndarray, float]:
        """Simulate one frame.

        Returns (xyz (N,3) float32 sensor-frame, intensity (N,), t0).
        Points are cast from the pose at their own timestamp (motion
        blur) but expressed in the sensor frame at their own pose —
        exactly what a real scanning lidar outputs.
        """
        c = self.cfg
        t0 = frame_idx * c.frame_period
        times = t0 + np.arange(c.points_per_frame) * c.point_dt
        dirs_s = self.pattern.directions(times)

        q, p = self.traj.pose(times)
        R = np.asarray(se3.quat_to_matrix(jnp.asarray(q, jnp.float32)))
        dirs_w = np.einsum("nij,nj->ni", R, dirs_s)
        t_hit, box_idx = self.scene.raycast(p, dirs_w)
        hit = np.isfinite(t_hit)
        t_safe = np.where(hit, t_hit, 1.0)
        pts_w = p + dirs_w * t_safe[:, None]
        # back to the sensor frame at each point's own pose
        pts_s = np.einsum("nji,nj->ni", R, pts_w - p)
        pts_s += self.rng.normal(scale=c.noise_std, size=pts_s.shape)

        refl = self.scene.reflectivity[box_idx]
        intensity = (refl * self.rng.uniform(0.8, 1.2, len(refl))).astype(np.float32)

        dropout = self.rng.uniform(size=len(pts_s)) < c.dropout_rate
        bad = dropout | ~hit
        pts_s[bad] = 0.0
        intensity[bad] = 0.0
        return pts_s.astype(np.float32), intensity, float(t0)

    def gt_pose_at(self, t: float):
        """Ground-truth (q_wxyz, position) at time t."""
        q, p = self.traj.pose(np.array([t]))
        return q[0], p[0]
