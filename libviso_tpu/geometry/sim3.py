"""Sim(3) utilities: scaled rigid transforms for monocular drift.

Monocular VO observes translation only up to scale, and the propagated
scale DRIFTS (measured r5: ~19% of path over 300 frames,
docs/limitations.md).  A loop closure in a monocular trajectory is
therefore a 7-dof constraint — rotation, translation AND relative scale
— and the pose graph that absorbs it must optimize over Sim(3), not
SE(3) (Strasdat et al., "Scale Drift-Aware Large Scale Monocular
SLAM"; the reference's mono path stops before any pose recovery at all,
src/viso.cpp:1393-1395, so this whole back-end is beyond-parity).

Representation: 4x4 homogeneous matrices whose rotation block carries
the scale, ``S = [[s*R, t], [0, 1]]`` — composition is plain matmul
(``s`` multiplies through: (s1 R1)(s2 R2) = (s1 s2)(R1 R2)), so every
batched einsum written for SE(3) works unchanged.  The 7-vector
coordinates extend the engine's Euler-XYZ 6-vector (geometry/se3.py,
reference tr2mat layout src/viso.cpp:109-133) with a trailing
``log s``: ``xi = (rx, ry, rz, tx, ty, tz, log_s)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from libviso_tpu.geometry.se3 import euler_to_rotation


def sim3_from_parts(s, R, t):
    """Assemble ``[[s*R, t], [0, 1]]``.  Batched over leading dims."""
    s = jnp.asarray(s)
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    top = jnp.concatenate([s[..., None, None] * R, t[..., :, None]],
                          axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def sim3_vector_to_matrix(xi):
    """7-vector ``(rx, ry, rz, tx, ty, tz, log_s)`` -> 4x4 Sim(3).

    The 6-dof prefix matches ``se3.pose_vector_to_matrix`` exactly, so
    ``xi[..., 6] = 0`` reproduces the rigid transform bit-for-bit.
    Batched over leading dims.
    """
    xi = jnp.asarray(xi)
    R = euler_to_rotation(xi[..., :3])
    return sim3_from_parts(jnp.exp(xi[..., 6]), R, xi[..., 3:6])


def sim3_scale(S):
    """Scale factor of a Sim(3) matrix: ``det(s*R)^(1/3) = s``.

    Batched ``(..., 4, 4) -> (...,)``.
    """
    S = jnp.asarray(S)
    return jnp.cbrt(jnp.linalg.det(S[..., :3, :3]))


def matrix_to_sim3_vector(S):
    """Inverse of ``sim3_vector_to_matrix``: 4x4 Sim(3) -> 7-vector.

    Valid away from ry = +-pi/2 (see se3.matrix_to_pose_vector) — graph
    residuals and delta parameters live near the identity, far from it.
    Batched over leading dims.
    """
    S = jnp.asarray(S)
    s = sim3_scale(S)
    R = S[..., :3, :3] / s[..., None, None]
    ry = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    rx = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    rz = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return jnp.concatenate(
        [jnp.stack([rx, ry, rz], axis=-1), S[..., :3, 3],
         jnp.log(s)[..., None]], axis=-1)


def invert_sim3(S):
    """Closed-form inverse: ``[[s R, t]]^-1 = [[(1/s) R', -(1/s) R' t]]``.

    Batched ``(..., 4, 4) -> (..., 4, 4)``.
    """
    S = jnp.asarray(S)
    s = sim3_scale(S)
    A_inv = jnp.swapaxes(S[..., :3, :3], -1, -2) / (s * s)[..., None, None]
    t = S[..., :3, 3:4]
    top = jnp.concatenate([A_inv, -jnp.matmul(A_inv, t,
                                              precision="highest")],
                          axis=-1)
    bottom = S[..., 3:4, :]
    return jnp.concatenate([top, bottom], axis=-2)


def sim3_to_se3(S):
    """Project a Sim(3) to its rigid part: drop the scale off the
    rotation block, KEEP the translation.

    This is the standard trajectory-correction projection: when a
    drift-corrected segment pose is ``S'_k @ (rigid local motion)``, the
    node's scale has already multiplied into the composed translation —
    the rotation block is the only place the factor must be removed to
    yield a valid SE(3) pose.  Batched.
    """
    S = jnp.asarray(S)
    s = sim3_scale(S)
    top = jnp.concatenate(
        [S[..., :3, :3] / s[..., None, None], S[..., :3, 3:4]], axis=-1)
    bottom = S[..., 3:4, :]
    return jnp.concatenate([top, bottom], axis=-2)
