"""loam_livox_tpu — a TPU-native LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hku-mars/loam_livox (LOAM-style odometry + mapping for Livox solid-state
LiDARs, with point-cloud loop closure): Livox small-FoV feature
extraction, scan-to-map point-to-line/plane ICP with a Gauss-Newton/LM
solver, a cell-partitioned map, keyframe place recognition, scene
alignment and 3D pose-graph optimization — all as jitted programs over
functional state, sharded across device meshes for multi-chip scaling.
"""

__version__ = "0.1.0"

from . import core
from .core import SlamConfig, PointBatch, Pose, FeatureFrame

__all__ = ["core", "SlamConfig", "PointBatch", "Pose", "FeatureFrame", "__version__"]
