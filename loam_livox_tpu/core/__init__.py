from . import config, se3, types
from .config import SlamConfig, precision_profile, realtime_profile, largescale_profile
from .types import FeatureFrame, PointBatch, Pose

__all__ = [
    "config", "se3", "types",
    "SlamConfig", "precision_profile", "realtime_profile", "largescale_profile",
    "FeatureFrame", "PointBatch", "Pose",
]
