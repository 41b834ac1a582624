"""Multi-device distribution: mesh setup + sharded hot primitives.

The reference's only parallelism is threads + ROS pub/sub on one
machine (SURVEY.md §2.7/§5.8); multi-chip scaling here is new
capability: map/reference points are sharded over the mesh, kNN top-k
and J^T J reductions cross it as collectives.
"""
from .mesh import make_mesh  # noqa: F401
from .sharded import knn_sharded, normal_system_psum  # noqa: F401
from .layout import (  # noqa: F401
    frame_pspecs,
    replicate,
    shard_frame,
    shard_state,
    shard_tree,
    state_pspecs,
)
