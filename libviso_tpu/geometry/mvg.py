"""Projective multi-view geometry kernels (SURVEY.md C7, C15).

Pure ``jnp`` — every function is shape-polymorphic over leading batch dims
and dtype-preserving, so it vmaps over RANSAC hypotheses, keypoint sets, and
sequence chunks without modification.
"""

from __future__ import annotations

import jax.numpy as jnp


def e2h(x):
    """Euclidean -> homogeneous along the last axis: (..., D) -> (..., D+1).

    Reference: ``e2h`` (src/misc.h:90-105, src/viso.cpp:258-272) appends a
    row of ones to column-vector matrices; here points live on the last axis.
    """
    x = jnp.asarray(x)
    ones = jnp.ones_like(x[..., :1])
    return jnp.concatenate([x, ones], axis=-1)


def h2e(x, eps=0.0):
    """Homogeneous -> Euclidean: divide by the last coordinate.

    The reference raises on a zero divisor (src/misc.h:119); with fixed
    shapes we instead let the caller mask invalid points (``eps`` optionally
    guards the division for padded slots).
    """
    x = jnp.asarray(x)
    w = x[..., -1:]
    if eps:
        w = jnp.where(jnp.abs(w) < eps, jnp.where(w < 0, -eps, eps), w)
    return x[..., :-1] / w


def project(P, X):
    """Central projection of 3D points: (..., N, 3) through (..., 3, 4).

    Reference ``projectPoints`` (src/viso.cpp:320-333): x = h2e(P @ e2h(X)).
    """
    Xh = e2h(X)
    xh = jnp.einsum("...ij,...nj->...ni", jnp.asarray(P), Xh, precision="highest")
    return h2e(xh)


def P_from_KRt(K, R, t):
    """Camera matrix P = K [R | t]  (reference src/mvg.cpp:92-107)."""
    K = jnp.asarray(K)
    R = jnp.asarray(R)
    t = jnp.asarray(t).reshape(R.shape[:-2] + (3, 1))
    return jnp.matmul(K, jnp.concatenate([R, t], axis=-1), precision="highest")


def F_from_P(P1, P2):
    """Fundamental matrix from two camera matrices (x2' F x1 = 0).

    The nine-determinant construction of Hartley & Zisserman pp. 412, as in
    the reference template ``F_from_P`` (src/mvg.h:41-66): F[j, i] is the
    determinant of the 4x4 stack [P1 minus row i ; P2 minus row j] with the
    reference's cyclic row-omission order (1,2), (2,0), (0,1).

    Vectorized: all nine 4x4 determinants are evaluated as one batched
    ``jnp.linalg.det`` call.  Batched over leading dims of P1/P2.
    """
    P1 = jnp.asarray(P1)
    P2 = jnp.asarray(P2)
    # Row pairs that remain after omitting row i, in the reference's order.
    keep = jnp.array([[1, 2], [2, 0], [0, 1]])
    X = P1[..., keep, :]          # (..., 3, 2, 4): X[i] = P1 minus row i
    Y = P2[..., keep, :]          # (..., 3, 2, 4)
    # M[j, i] = vcat(X[i], Y[j]) -> det gives F[j, i]
    Xb = jnp.broadcast_to(X[..., None, :, :, :], X.shape[:-3] + (3, 3, 2, 4))
    Yb = jnp.broadcast_to(Y[..., :, None, :, :], Y.shape[:-3] + (3, 3, 2, 4))
    M = jnp.concatenate([Xb, Yb], axis=-2)  # (..., 3, 3, 4, 4)
    return jnp.linalg.det(M)


def F_from_P_host(P1, P2):
    """Float64 host-side F_from_P for pipeline setup.

    The nine-determinant construction cancels catastrophically in f32 at
    pixel scale (entries ~1e11 cancelling to ~1e8), so the fundamental
    matrix — computed once per sequence from calibration, never inside jit —
    is evaluated in numpy float64 and cast by the caller.  Matches the
    reference's double-precision setup (src/viso.cpp:1176-1180), including
    the guarded F /= F[2,2] normalization.
    """
    import numpy as np

    P1 = np.asarray(P1, dtype=np.float64)
    P2 = np.asarray(P2, dtype=np.float64)
    keep = np.array([[1, 2], [2, 0], [0, 1]])
    F = np.empty((3, 3), dtype=np.float64)
    for j in range(3):
        for i in range(3):
            M = np.concatenate([P1[keep[i]], P2[keep[j]]], axis=0)
            F[j, i] = np.linalg.det(M)
    if F[2, 2] > np.finfo(np.float64).tiny:
        F = F / F[2, 2]
    return F


def algebraic_distance(F, x1, x2):
    """Algebraic epipolar residual x2' F x1 per point.

    Reference ``algebricDistance`` (src/viso.cpp:390-407).  ``x1``/``x2`` are
    (..., 2) pixel coordinates; broadcast against F (..., 3, 3).
    """
    x1h = e2h(x1)
    x2h = e2h(x2)
    Fx1 = jnp.einsum("...ij,...j->...i", jnp.asarray(F), x1h, precision="highest")
    return jnp.einsum("...i,...i->...", x2h, Fx1, precision="highest")


def sampson_distance(F, x1, x2):
    """First-order (Sampson) epipolar distance.

    Reference ``sampsonDistance`` (src/viso.cpp:655-666):
    (x2'Fx1)^2 / ((Fx1)_0^2 + (Fx1)_1^2 + (F'x2)_0^2 + (F'x2)_1^2).
    """
    F = jnp.asarray(F)
    x1h = e2h(x1)
    x2h = e2h(x2)
    Fx1 = jnp.einsum("...ij,...j->...i", F, x1h, precision="highest")
    Ftx2 = jnp.einsum("...ji,...j->...i", F, x2h, precision="highest")
    num = jnp.einsum("...i,...i->...", x2h, Fx1, precision="highest") ** 2
    den = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return num / den
