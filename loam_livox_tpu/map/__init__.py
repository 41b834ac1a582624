"""Map data structures: the TPU re-design of the reference's grid cell
map (`Points_cloud_cell` / `Points_cloud_map`,
``source/cell_map_keyframe.hpp``)."""
from .cell_map import (  # noqa: F401
    CellMap,
    FEATURE_LINE,
    FEATURE_PLANE,
    FEATURE_SPHERE,
    append_cloud,
    cell_features,
    cells_in_radius,
    empty_cell_map,
    gather_cell_points,
)
