from . import knn, masked, voxel
from .knn import knn as knn_search
from .voxel import voxel_downsample

__all__ = ["knn", "masked", "voxel", "knn_search", "voxel_downsample"]
