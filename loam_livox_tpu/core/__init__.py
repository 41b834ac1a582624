from . import config, se3, types
from .config import (
    SlamConfig,
    deblur_precision_profile,
    largescale_profile,
    precision_profile,
    realtime_profile,
)
from .types import FeatureFrame, PointBatch, Pose

__all__ = [
    "config", "se3", "types",
    "SlamConfig", "precision_profile", "deblur_precision_profile",
    "realtime_profile", "largescale_profile",
    "FeatureFrame", "PointBatch", "Pose",
]
