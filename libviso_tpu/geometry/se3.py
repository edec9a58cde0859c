"""SE(3) utilities: Euler-XYZ parameterization and pose chaining.

The motion model matches the reference: a 6-vector ``tr = (rx, ry, rz, tx,
ty, tz)`` maps to a 4x4 rigid transform with rotation R = Rx' Ry' Rz' in the
exact element layout of the reference ``tr2mat`` (src/viso.cpp:109-133) and
``compute_J``'s rotation tables (src/viso.cpp:1414-1424).

Pose chaining (``pose_k = pose_{k-1} @ inv(Tr_k)``, src/viso.cpp:1313-1321)
is exposed as an associative scan so a sharded sequence of per-frame motions
composes in O(log T) depth with XLA inserting the collectives (SURVEY.md P1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def euler_to_rotation(r):
    """Rotation matrix for Euler angles ``r = (rx, ry, rz)``.

    Element-for-element the rotation block written by the reference
    ``tr2mat`` (src/viso.cpp:129-131).  Batched over leading dims.
    """
    r = jnp.asarray(r)
    rx, ry, rz = r[..., 0], r[..., 1], r[..., 2]
    sx, cx = jnp.sin(rx), jnp.cos(rx)
    sy, cy = jnp.sin(ry), jnp.cos(ry)
    sz, cz = jnp.sin(rz), jnp.cos(rz)
    row0 = jnp.stack([cy * cz, -cy * sz, sy], axis=-1)
    row1 = jnp.stack([sx * sy * cz + cx * sz, -sx * sy * sz + cx * cz, -sx * cy], axis=-1)
    row2 = jnp.stack([-cx * sy * cz + sx * sz, cx * sy * sz + sx * cz, cx * cy], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def pose_vector_to_matrix(tr):
    """6-dof motion vector -> 4x4 homogeneous transform (tr2mat analog).

    Batched over leading dims: ``(..., 6) -> (..., 4, 4)``.
    """
    tr = jnp.asarray(tr)
    R = euler_to_rotation(tr[..., :3])
    t = tr[..., 3:6][..., :, None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose_vector(T):
    """Inverse of ``pose_vector_to_matrix``: 4x4 rigid transform -> 6-vector.

    Recovers (rx, ry, rz) from the Euler-XYZ layout of ``tr2mat``
    (R[0,2]=sin ry; R[1,2]=-sin rx cos ry; R[0,1]=-cos ry sin rz) plus the
    translation.  Valid away from the ry = +-pi/2 gimbal lock — per-frame VO
    motions are far from it.  Batched over leading dims.
    """
    T = jnp.asarray(T)
    R = T[..., :3, :3]
    ry = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    rx = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    rz = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return jnp.concatenate(
        [jnp.stack([rx, ry, rz], axis=-1), T[..., :3, 3]], axis=-1)


def rotation_derivatives(r):
    """dR/drx, dR/dry, dR/drz for the Euler-XYZ rotation.

    The analytic tables of reference compute_J (src/viso.cpp:1417-1424),
    assembled as three full 3x3 matrices (the reference leaves structurally
    zero entries implicit).  Returns ``(..., 3, 3, 3)`` with the first
    trailing-group axis indexing the parameter (rx, ry, rz).
    """
    r = jnp.asarray(r)
    rx, ry, rz = r[..., 0], r[..., 1], r[..., 2]
    sx, cx = jnp.sin(rx), jnp.cos(rx)
    sy, cy = jnp.sin(ry), jnp.cos(ry)
    sz, cz = jnp.sin(rz), jnp.cos(rz)
    zero = jnp.zeros_like(rx)

    drx = jnp.stack([
        jnp.stack([zero, zero, zero], axis=-1),
        jnp.stack([cx * sy * cz - sx * sz, -cx * sy * sz - sx * cz, -cx * cy], axis=-1),
        jnp.stack([sx * sy * cz + cx * sz, -sx * sy * sz + cx * cz, -sx * cy], axis=-1),
    ], axis=-2)
    dry = jnp.stack([
        jnp.stack([-sy * cz, sy * sz, cy], axis=-1),
        jnp.stack([sx * cy * cz, -sx * cy * sz, sx * sy], axis=-1),
        jnp.stack([-cx * cy * cz, cx * cy * sz, -cx * sy], axis=-1),
    ], axis=-2)
    drz = jnp.stack([
        jnp.stack([-cy * sz, -cy * cz, zero], axis=-1),
        jnp.stack([-sx * sy * sz + cx * cz, -sx * sy * cz - cx * sz, zero], axis=-1),
        jnp.stack([cx * sy * sz + sx * cz, cx * sy * cz - sx * sz, zero], axis=-1),
    ], axis=-2)
    return jnp.stack([drx, dry, drz], axis=-3)


def invert_se3(T):
    """Closed-form inverse of a rigid transform: [R t]^-1 = [R' -R't].

    Batched ``(..., 4, 4) -> (..., 4, 4)``.  Replaces the reference's
    generic ``Mat::inv()`` (src/viso.cpp:1319) with the structure-aware form
    (exact and cheaper: one 3x3 transpose + one matvec).
    """
    T = jnp.asarray(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    new_t = -jnp.matmul(Rt, t, precision="highest")
    top = jnp.concatenate([Rt, new_t], axis=-1)
    bottom = T[..., 3:4, :]  # (0,0,0,1) row preserved
    return jnp.concatenate([top, bottom], axis=-2)


def chain_motions(motions, valid=None):
    """Compose per-frame motions into global poses.

    Given per-frame relative transforms ``Tr_k`` (current-from-previous, the
    output of the pose solver) with optional validity flags, returns the
    cumulative poses ``pose_k = Tr_1^-1 @ ... @ Tr_k^-1`` matching the
    reference update ``pose = pose * Tr.inv()`` (src/viso.cpp:1319).

    Invalid frames contribute the identity (the reference instead drops the
    frame from its output list, src/viso.cpp:1322-1324; with fixed shapes we
    hold the pose constant — same trajectory semantics, documented
    divergence).

    Implemented with ``jax.lax.associative_scan`` so a sequence sharded over
    a mesh axis composes with O(log T) collective depth instead of a serial
    T-step loop.

    Args:
      motions: (T, 4, 4) per-frame transforms.
      valid: optional (T,) boolean mask.

    Returns:
      (T, 4, 4) cumulative poses (pose of frame k in frame-0 coordinates).
    """
    motions = jnp.asarray(motions)
    inv = invert_se3(motions)
    if valid is not None:
        eye = jnp.broadcast_to(jnp.eye(4, dtype=inv.dtype), inv.shape)
        inv = jnp.where(valid[:, None, None], inv, eye)
    return jax.lax.associative_scan(
        lambda a, b: jnp.matmul(a, b, precision="highest"), inv, axis=0)
