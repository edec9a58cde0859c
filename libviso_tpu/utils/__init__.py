"""Cross-cutting utilities: metrics, evaluation, debug artifacts."""

from libviso_tpu.utils.metrics import (
    ate_rmse,
    rpe_errors,
    kitti_trajectory_errors,
    MetricsLogger,
)

__all__ = [
    "ate_rmse",
    "rpe_errors",
    "kitti_trajectory_errors",
    "MetricsLogger",
]
