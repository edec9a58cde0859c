"""Scale-out: device meshes and sequence-sharded odometry (SURVEY.md §2.2)."""

from libviso_tpu.parallel.mesh import make_mesh
from libviso_tpu.parallel.odometry import (
    build_chunk_odometry,
    chunk_frames_with_halo,
    run_sharded_odometry,
    stitch_chunk_motions,
)

__all__ = [
    "make_mesh",
    "build_chunk_odometry",
    "chunk_frames_with_halo",
    "run_sharded_odometry",
    "stitch_chunk_motions",
]
