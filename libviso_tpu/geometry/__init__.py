"""Multi-view geometry core (SURVEY.md C7, C9, C10, C13, C14, C15, C18)."""

from libviso_tpu.geometry.se3 import (
    euler_to_rotation,
    pose_vector_to_matrix,
    matrix_to_pose_vector,
    rotation_derivatives,
    invert_se3,
    chain_motions,
)
from libviso_tpu.geometry.mvg import (
    e2h,
    h2e,
    project,
    F_from_P,
    F_from_P_host,
    P_from_KRt,
    algebraic_distance,
    sampson_distance,
)
from libviso_tpu.geometry.triangulate import (
    triangulate_rectified,
    triangulate_dlt,
)
from libviso_tpu.geometry.procrustes import (
    solve_rigid_motion,
    ransac_rigid_motion,
)
from libviso_tpu.geometry.essential import (
    normalize_points,
    eight_point_E,
    decompose_E,
    recover_pose,
    ransac_essential,
)

__all__ = [
    "euler_to_rotation",
    "pose_vector_to_matrix",
    "matrix_to_pose_vector",
    "rotation_derivatives",
    "invert_se3",
    "chain_motions",
    "e2h",
    "h2e",
    "project",
    "F_from_P",
    "F_from_P_host",
    "P_from_KRt",
    "algebraic_distance",
    "sampson_distance",
    "triangulate_rectified",
    "triangulate_dlt",
    "solve_rigid_motion",
    "ransac_rigid_motion",
    "normalize_points",
    "eight_point_E",
    "decompose_E",
    "recover_pose",
    "ransac_essential",
]
