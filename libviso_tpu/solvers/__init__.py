"""Robust pose estimation: Gauss-Newton + batched RANSAC (SURVEY.md C11, C12)."""

from libviso_tpu.solvers.gauss_newton import (
    stereo_predict,
    residual_jacobian,
    gauss_newton,
    reprojection_errors_sq,
)
from libviso_tpu.solvers.ransac import ransac_pose

__all__ = [
    "stereo_predict",
    "residual_jacobian",
    "gauss_newton",
    "reprojection_errors_sq",
    "ransac_pose",
]
