"""Host-side data loading and result writing (SURVEY.md C1, C16)."""

from libviso_tpu.io.kitti import (
    load_calib,
    save_poses_kitti,
    load_poses_kitti,
    StereoImageStream,
    kitti_sequence_paths,
)

__all__ = [
    "load_calib",
    "save_poses_kitti",
    "load_poses_kitti",
    "StereoImageStream",
    "kitti_sequence_paths",
]
