"""Sequence pipelines: stereo odometry and monocular SfM (SURVEY.md C2, C3)."""

from libviso_tpu.pipeline.stereo import (
    FrameState,
    FrameOutput,
    empty_state,
    build_frame_step,
    build_frame_chunk,
    run_stereo_sequence,
)
from libviso_tpu.pipeline.batched import (
    BatchedOutput,
    build_batched_odometry,
)

__all__ = [
    "FrameState",
    "FrameOutput",
    "empty_state",
    "build_frame_step",
    "build_frame_chunk",
    "run_stereo_sequence",
    "BatchedOutput",
    "build_batched_odometry",
]
