"""Sequence pipelines: stereo odometry and monocular SfM (SURVEY.md C2, C3)."""

from libviso_tpu.pipeline.stereo import (
    FrameState,
    FrameOutput,
    empty_state,
    build_frame_step,
    run_stereo_sequence,
)

__all__ = [
    "FrameState",
    "FrameOutput",
    "empty_state",
    "build_frame_step",
    "run_stereo_sequence",
]
