from . import gauss_newton, icp, residuals
from .icp import RegistrationResult, refine_blur, register_frame

__all__ = [
    "gauss_newton", "icp", "residuals",
    "RegistrationResult", "refine_blur", "register_frame",
]
