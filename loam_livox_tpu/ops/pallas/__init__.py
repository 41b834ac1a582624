from .knn_fused import knn_fused  # noqa: F401
