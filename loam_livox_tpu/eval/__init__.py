from . import ate
from .ate import ate_rmse, umeyama_alignment

__all__ = ["ate", "ate_rmse", "umeyama_alignment"]
