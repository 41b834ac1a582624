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
        n_pillars: int = 12,
    ) -> "BoxScene":
        """Room walls + random boxes + pillars inside the +X viewing
        frustum.

        The pillars matter: the Livox corner detector fires on *creases*
        (convex edges between two visible faces — local depth minimum,
        continuous depth), not on occlusion edges, which its small-FoV
        outlier rejection deliberately discards (reference:
        ``livox_feature_extractor.hpp:443-452``).  A bare room seen
        through a 17° cone is crease-free, so without pillars the
        front-end correctly emits zero corner features and registration
        never engages (the reference gates on a non-empty corner map,
        ``point_cloud_registration.hpp:29,199``).
        """
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
        # Full-height pillars scattered through the band the (moving,
        # yawing) sensor frustum sweeps; lateral offsets guarantee two
        # faces are visible, so each contributes a vertical crease.
        for _ in range(n_pillars):
            x = rng.uniform(0.3 * e, 0.9 * e)
            y = rng.uniform(-0.55 * e, 0.55 * e)
            sx, sy = rng.uniform(0.3, 0.9, size=2)
            boxes.append(np.array(
                [[x - sx / 2, y - sy / 2, -e], [x + sx / 2, y + sy / 2, e]]))
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
class ConvexScene:
    """Scene of convex polyhedra, each the intersection of half-spaces
    ``n·x ≤ d``.  Generalizes `BoxScene` so surfaces can meet at
    arbitrary angles — required to synthesize the *creases* (convex
    edges between two visible faces) that the Livox corner detector is
    built to find (reference: ``livox_feature_extractor.hpp:443-452``;
    occlusion edges are rejected by its view-angle / depth-jump gates,
    so an axis-aligned-box world yields almost no corner features).

    normals: (B, P, 3) — padded planes have n = 0.
    dists:   (B, P)   — padded planes have d = 1 (always satisfied).
    """

    normals: np.ndarray
    dists: np.ndarray
    reflectivity: np.ndarray

    @staticmethod
    def from_parts(parts, refl):
        """parts: list of (normals (p,3), dists (p,)) per object."""
        pmax = max(len(d) for _, d in parts)
        B = len(parts)
        normals = np.zeros((B, pmax, 3))
        dists = np.ones((B, pmax))
        for i, (n, d) in enumerate(parts):
            normals[i, : len(d)] = n
            dists[i, : len(d)] = d
        return ConvexScene(normals, dists, np.asarray(refl, np.float64))

    @staticmethod
    def box_planes(lo, hi):
        lo = np.asarray(lo, np.float64)
        hi = np.asarray(hi, np.float64)
        n = np.vstack([np.eye(3), -np.eye(3)])
        d = np.concatenate([hi, -lo])
        return n, d

    @staticmethod
    def wedge_planes(apex_xy, span_lo, span_hi, x_back, half_angle_deg,
                     azimuth_deg: float = 0.0, horizontal: bool = False):
        """Sharp triangular prism ridge with apex edge through
        ``(x, y) = apex_xy`` (vertical edge) or ``(x, z) = apex_xy``
        (horizontal edge, ``horizontal=True``), opening away from the
        sensor (toward +x after `azimuth_deg` rotation) with the given
        half-angle.  Small half-angles give the steep depth slopes a
        crease needs to clear `corner_curvature`."""
        th = np.deg2rad(half_angle_deg)
        az = np.deg2rad(azimuth_deg)
        c, s = np.cos(az), np.sin(az)
        if horizontal:
            # Rotate about y: faces split in z, edge runs along y.
            R = np.array([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]])
            lat = np.array([0.0, 0.0, 1.0])      # face-splitting axis
            edge = np.array([0.0, 1.0, 0.0])     # apex edge direction
            ax, aw = apex_xy
            apex = np.array([ax, 0.0, aw])
        else:
            R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
            lat = np.array([0.0, 1.0, 0.0])
            edge = np.array([0.0, 0.0, 1.0])
            ax, aw = apex_xy
            apex = np.array([ax, aw, 0.0])
        n1 = R @ (-np.sin(th) * np.array([1.0, 0, 0]) + np.cos(th) * lat)
        n2 = R @ (-np.sin(th) * np.array([1.0, 0, 0]) - np.cos(th) * lat)
        nb = R @ np.array([1.0, 0.0, 0.0])
        back = apex + R @ np.array([x_back, 0.0, 0.0])
        n = np.stack([n1, n2, nb, edge, -edge])
        d = np.array([n1 @ apex, n2 @ apex, nb @ back, span_hi, -span_lo])
        return n, d

    @staticmethod
    def random_room(
        rng: np.random.Generator,
        half_extent: float = 12.0,
        half_extent_z: float = 2.5,
        n_boxes: int = 10,
        n_pillars: int = 8,
        n_ridges: int = 20,
    ) -> "ConvexScene":
        """Room walls + boxes + frustum pillars + sharp wall ridges.

        The vertical half-extent defaults to a realistic indoor 2.5 m:
        with a tall room the floor/ceiling never enter the 17° Livox
        cone and the vertical axis becomes unobservable — trajectories
        then drift/oscillate in z no matter the estimator."""
        e = half_extent
        ez = half_extent_z
        w = 0.5
        parts = []
        walls = [
            ([e, -e - w, -ez - w], [e + w, e + w, ez + w]),
            ([-e - w, -e - w, -ez - w], [-e, e + w, ez + w]),
            ([-e - w, e, -ez - w], [e + w, e + w, ez + w]),
            ([-e - w, -e - w, -ez - w], [e + w, -e, ez + w]),
            ([-e - w, -e - w, ez], [e + w, e + w, ez + w]),     # ceiling
            ([-e - w, -e - w, -ez - w], [e + w, e + w, -ez]),   # floor
        ]
        for lo, hi in walls:
            parts.append(ConvexScene.box_planes(lo, hi))
        for _ in range(n_boxes):
            c = rng.uniform(-0.7 * e, 0.7 * e, size=3)
            c[2] = rng.uniform(-0.6 * ez, 0.6 * ez)
            s = rng.uniform(0.4, 2.0, size=3)
            parts.append(ConvexScene.box_planes(c - s / 2, c + s / 2))
        for _ in range(n_pillars):
            x = rng.uniform(0.3 * e, 0.9 * e)
            y = rng.uniform(-0.55 * e, 0.55 * e)
            sx, sy = rng.uniform(0.3, 0.9, size=2)
            parts.append(ConvexScene.box_planes(
                [x - sx / 2, y - sy / 2, -ez], [x + sx / 2, y + sy / 2, ez]))
        for i in range(n_ridges):
            # Ridges poking out of the +x wall region the frustum sweeps,
            # apex pointed at the sensor: half-angle 10-20° → depth slope
            # cot(θ) ≈ 2.7-5.7 across the crease.  Alternate vertical and
            # horizontal apex edges so the rosette crosses creases in
            # both scan directions.
            x = rng.uniform(0.5 * e, 0.95 * e)
            y = rng.uniform(-0.6 * e, 0.6 * e)
            half_angle = rng.uniform(10.0, 20.0)
            azim = rng.uniform(-25.0, 25.0)
            depth = rng.uniform(1.0, 2.5)
            parts.append(ConvexScene.wedge_planes(
                (x, y), -ez, ez, depth, half_angle, azim,
                horizontal=bool(i % 2)))
        refl = rng.uniform(0.5, 1.5, size=len(parts))
        return ConvexScene.from_parts(parts, refl)

    @staticmethod
    def rotated_box_planes(rng, center, size):
        """Box at `center` with edge lengths `size`, uniformly random
        orientation (QR of a Gaussian)."""
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        n_local = np.vstack([np.eye(3), -np.eye(3)])
        d_local = np.concatenate([np.asarray(size) / 2,
                                  np.asarray(size) / 2])
        n = n_local @ Q.T
        d = d_local + n @ np.asarray(center, np.float64)
        return n, d

    @staticmethod
    def rock_planes(rng, center, radius, n_faces=10):
        """Random convex polytope ("rock"): `n_faces` half-spaces with
        uniformly random normals at 0.7-1.0·radius from the center —
        every face has a distinct orientation, the cheap synthetic
        stand-in for the orientation diversity of natural clutter."""
        n = rng.normal(size=(n_faces, 3))
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        d = radius * rng.uniform(0.7, 1.0, n_faces) + n @ np.asarray(
            center, np.float64)
        return n, d

    @staticmethod
    def random_rich_world(
        rng: np.random.Generator,
        half_extent: float = 14.0,
        half_extent_z: float = 3.0,
        n_rot_boxes: int = 14,
        n_rocks: int = 22,
        n_ridges: int = 10,
    ) -> "ConvexScene":
        """Orientation-RICH scene: walls + randomly-rotated boxes +
        faceted rocks + crease ridges.

        Purpose: the keyframe place-recognition admission gate requires
        ≥5% of the 60×60 spherical histogram's bins nonzero
        (`loop_closure/avail_ratio_plane` = 0.05 shipped,
        reference laser_mapping.hpp:994-1001) — i.e. ≥180 distinct
        plane-cell orientations per keyframe.  An axis-aligned box
        world concentrates on ~6 normals and can never pass at the
        shipped thresholds; this world's rotated faces and rock facets
        supply the diversity real campus scenes have, so loop closure
        can be validated with the reference's gates UNCHANGED."""
        e = half_extent
        ez = half_extent_z
        w = 0.5
        parts = []
        walls = [
            ([e, -e - w, -ez - w], [e + w, e + w, ez + w]),
            ([-e - w, -e - w, -ez - w], [-e, e + w, ez + w]),
            ([-e - w, e, -ez - w], [e + w, e + w, ez + w]),
            ([-e - w, -e - w, -ez - w], [e + w, -e, ez + w]),
            ([-e - w, -e - w, ez], [e + w, e + w, ez + w]),
            ([-e - w, -e - w, -ez - w], [e + w, e + w, -ez]),
        ]
        for lo, hi in walls:
            parts.append(ConvexScene.box_planes(lo, hi))
        def clear_center(radius):
            # keep a clearance bubble around the trajectory region so
            # the sensor never spawns inside an object
            while True:
                c = rng.uniform(-0.85 * e, 0.85 * e, size=3)
                if np.linalg.norm(c[:2]) > radius + 3.5:
                    return c

        for _ in range(n_rot_boxes):
            c = clear_center(1.5)
            c[2] = rng.uniform(-0.5 * ez, 0.3 * ez)
            parts.append(ConvexScene.rotated_box_planes(
                rng, c, rng.uniform(0.8, 2.6, size=3)))
        for _ in range(n_rocks):
            c = clear_center(1.8)
            c[2] = rng.uniform(-0.7 * ez, 0.1 * ez)
            parts.append(ConvexScene.rock_planes(
                rng, c, rng.uniform(0.8, 1.8), n_faces=10))
        for i in range(n_ridges):
            x = rng.uniform(0.5 * e, 0.95 * e)
            y = rng.uniform(-0.6 * e, 0.6 * e)
            parts.append(ConvexScene.wedge_planes(
                (x, y), -ez, ez, rng.uniform(1.0, 2.5),
                rng.uniform(10.0, 20.0), rng.uniform(-25.0, 25.0),
                horizontal=bool(i % 2)))
        refl = rng.uniform(0.5, 1.5, size=len(parts))
        return ConvexScene.from_parts(parts, refl)

    def raycast(self, origins: np.ndarray, dirs: np.ndarray):
        """First-hit distances (N,), object ids (N,); inf where no hit."""
        o = origins
        d = dirs
        # (N, B, P) plane interactions
        denom = np.einsum("nk,bpk->nbp", d, self.normals)
        num = self.dists[None, :, :] - np.einsum("nk,bpk->nbp", o, self.normals)
        eps = 1e-12
        t = num / np.where(np.abs(denom) < eps, eps, denom)
        entering = denom < -eps
        exiting = denom > eps
        parallel_out = (np.abs(denom) <= eps) & (num < 0)
        tmin = np.max(np.where(entering, t, -np.inf), axis=-1)
        tmax = np.min(np.where(exiting, t, np.inf), axis=-1)
        hit = (tmax >= tmin) & (tmax > 0) & ~np.any(parallel_out, axis=-1)
        t_enter = np.where(tmin > 0, tmin, tmax)
        t_enter = np.where(hit, t_enter, np.inf)
        obj = np.argmin(t_enter, axis=1)
        t_hit = t_enter[np.arange(len(o)), obj]
        return t_hit, obj


@dataclass
class Trajectory:
    """Smooth analytic 6-DoF trajectory (sum of low-frequency sinusoids).

    Starts from standstill: for ``t < ramp_t0`` the pose is frozen and
    motion then ramps in smoothly (zero initial velocity).  Real
    handheld captures begin stationary — the reference's 50-frame
    init-accumulation window (`mapping/init_accumulate_frames`) builds
    its seed map assuming exactly that; a simulator that moves at full
    speed from t = 0 hands the SLAM a smeared seed map no
    implementation could register against (motion-deblur ICP then
    diverges by stretching frames into the smear)."""

    lin_amp: np.ndarray = field(default_factory=lambda: np.array([2.0, 1.5, 0.3]))
    lin_hz: np.ndarray = field(default_factory=lambda: np.array([0.05, 0.04, 0.08]))
    yaw_amp: float = 0.6
    yaw_hz: float = 0.05
    pitch_amp: float = 0.12
    pitch_hz: float = 0.07
    ramp_t0: float = 1.0     # stationary duration (s)

    def _warp(self, t: np.ndarray) -> np.ndarray:
        """Time warp: 0 until ramp_t0, then smoothly approaching t."""
        u = np.maximum(np.asarray(t, np.float64) - self.ramp_t0, 0.0)
        return u * u / (u + 1.0)

    def position(self, t: np.ndarray) -> np.ndarray:
        t = self._warp(np.atleast_1d(np.asarray(t, np.float64)))
        p = self.lin_amp[None, :] * np.sin(2 * np.pi * self.lin_hz[None, :] * t[:, None])
        return p

    def quaternion(self, t: np.ndarray) -> np.ndarray:
        """wxyz quaternions, (N, 4): yaw then pitch, smooth in t."""
        t = self._warp(np.atleast_1d(np.asarray(t, np.float64)))
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
                 scene: "BoxScene | ConvexScene | None" = None,
                 traj: Trajectory | None = None,
                 pattern: RosettePattern | None = None):
        self.cfg = cfg or SimConfig()
        self.rng = np.random.default_rng(self.cfg.seed)
        self.scene = scene or ConvexScene.random_room(self.rng)
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
