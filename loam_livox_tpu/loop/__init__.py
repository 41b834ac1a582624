"""Loop closure: keyframe descriptors, scene alignment, pose-graph
optimization, map refinement (reference: `Maps_keyframe`,
`Scene_alignment`, `Ceres_pose_graph_3d`, `Mapping_refine`)."""
from .keyframe import (  # noqa: F401
    KeyframeDescriptor,
    describe_keyframe,
    max_similarity,
)
from .pose_graph import PoseGraph, optimize_pose_graph  # noqa: F401
