"""Projective multi-view geometry kernels (SURVEY.md C7, C15).

Pure ``jnp`` — every function is shape-polymorphic over leading batch dims
and dtype-preserving, so it vmaps over RANSAC hypotheses, keypoint sets, and
sequence chunks without modification.
"""

from __future__ import annotations

import dataclasses

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


def rms(X1, X2):
    """Per-column root-sum-of-squares of the difference (mvg.cpp:12-30).

    The reference's "rms" sums squared differences down each column and
    takes the square root (no mean); preserved as-is for parity.
    """
    d = jnp.asarray(X1) - jnp.asarray(X2)
    return jnp.sqrt(jnp.sum(d * d, axis=-2))


@dataclasses.dataclass
class Camera:
    """Central-projection camera: intrinsics + distortion (mvg.h:89-95)."""

    K: object                 # (3, 3) intrinsics
    D: object = None          # (4,) distortion params (None = zero)

    def __post_init__(self):
        self.K = jnp.asarray(self.K)
        if self.D is None:
            self.D = jnp.zeros((4,), self.K.dtype)
        else:
            self.D = jnp.asarray(self.D)


@dataclasses.dataclass
class StereoCam:
    """Stereo rig (mvg.h:96-118): two cameras, the c1->c2 transform, and
    optional rectification data (R1, R2, P1, P2, Q).

    Derived quantities mirror the reference's methods: ``p1()`` is
    [K1 | 0], ``p2()`` is K2 [R | t], ``F()`` the fundamental matrix of
    the pair (mvg.h:102-110).
    """

    c1: Camera
    c2: Camera
    R: object                 # (3, 3) rotation c1 -> c2
    t: object                 # (3,) translation c1 -> c2
    R1: object = None         # rectifying rotations
    R2: object = None
    P1: object = None         # rectified projection matrices
    P2: object = None
    Q: object = None          # disparity-to-depth matrix

    def __post_init__(self):
        self.R = jnp.asarray(self.R)
        self.t = jnp.asarray(self.t).reshape(3)

    def p1(self):
        eye = jnp.eye(3, dtype=self.c1.K.dtype)
        zero = jnp.zeros((3,), self.c1.K.dtype)
        return P_from_KRt(self.c1.K, eye, zero)

    def p2(self):
        return P_from_KRt(self.c2.K, self.R, self.t)

    def F(self):
        return F_from_P(self.p1(), self.p2())


def _rodrigues(axis_angle):
    """Rotation matrix from an axis-angle vector (Rodrigues)."""
    v = jnp.asarray(axis_angle)
    theta = jnp.linalg.norm(v)
    safe = jnp.where(theta > 1e-12, theta, 1.0)
    k = v / safe
    K = jnp.array([[0.0, -k[2], k[1]],
                   [k[2], 0.0, -k[0]],
                   [-k[1], k[0], 0.0]], v.dtype)
    R = (jnp.eye(3, dtype=v.dtype) + jnp.sin(theta) * K
         + (1.0 - jnp.cos(theta)) * (K @ K))
    return jnp.where(theta > 1e-12, R, jnp.eye(3, dtype=v.dtype))


def _log_so3(R):
    """Axis-angle vector of a rotation matrix."""
    R = jnp.asarray(R)
    cos = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    w = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                   R[1, 0] - R[0, 1]], R.dtype)
    s = jnp.where(theta > 1e-12, 2.0 * jnp.sin(theta), 1.0)
    return jnp.where(theta > 1e-12, w * theta / s, 0.5 * w)


def stereo_rectify(rig):
    """Compute the rectification a StereoCam carries but the reference
    never derives (mvg.h:112-118 declares R1, R2, P1, P2, Q; OpenCV's
    stereoRectify filled them upstream).  Bouguet's method:

      - split the inter-camera rotation evenly: each camera rotates by
        half of R (so both images distort equally),
      - rotate both so the new x-axis aligns with the (rotated) baseline,
      - rectified intrinsics share f, cv AND cu (the averaged principal
        point — both projections use one shared Kr, so disparity at
        infinity is exactly zero and Q needs no cx-cx' term).

    Returns a new StereoCam with R1, R2, P1, P2, Q populated.  After
    rectification x2 = R2 (R x1 + t), x1' = R1 x1 have identical v
    coordinates for corresponding points (tested) — the precondition for
    triangulate_rectified and the stereo pipeline's epipolar gate.
    """
    import dataclasses as _dc

    R = jnp.asarray(rig.R)
    t = jnp.asarray(rig.t).reshape(3)

    # Balanced split: R1 = A B1, R2 = A B2 with B1 = exp(r/2),
    # B2 = exp(-r/2) = B1 R^-1 (same axis, angles add), so both cameras
    # rotate by half the relative rotation and R2 R = R1 holds — the
    # condition that makes the rectified pair differ only by the baseline.
    r = _log_so3(R)
    B1 = _rodrigues(0.5 * r)
    B2 = _rodrigues(-0.5 * r)

    # The rectified x-axis must align with R2 t (the baseline as seen by
    # the half-rotated second camera); sign chosen so x2' = x1' - b*x_hat
    # (positive disparity).
    u = B2 @ t
    e1 = -u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
    up = jnp.array([0.0, 0.0, 1.0], R.dtype)
    e2 = jnp.cross(up, e1)
    e2 = e2 / jnp.maximum(jnp.linalg.norm(e2), 1e-12)
    e3 = jnp.cross(e1, e2)
    R_align = jnp.stack([e1, e2, e3])     # rows

    R1 = R_align @ B1
    R2 = R_align @ B2

    K1 = jnp.asarray(rig.c1.K)
    K2 = jnp.asarray(rig.c2.K)
    f = (K1[1, 1] + K2[1, 1]) / 2.0
    cv = (K1[1, 2] + K2[1, 2]) / 2.0
    cu = (K1[0, 2] + K2[0, 2]) / 2.0
    baseline = jnp.linalg.norm(t)

    Kr = jnp.array([[f, 0.0, cu], [0.0, f, cv], [0.0, 0.0, 1.0]], R.dtype)
    P1 = jnp.concatenate([Kr, jnp.zeros((3, 1), R.dtype)], axis=1)
    P2 = jnp.concatenate(
        [Kr, jnp.array([[-f * baseline], [0.0], [0.0]], R.dtype)], axis=1)
    Q = jnp.array([
        [1.0, 0.0, 0.0, -cu],
        [0.0, 1.0, 0.0, -cv],
        [0.0, 0.0, 0.0, f],
        [0.0, 0.0, 1.0 / baseline, 0.0],
    ], R.dtype)
    return _dc.replace(rig, R1=R1, R2=R2, P1=P1, P2=P2, Q=Q)


def _bilinear_sample(img, x, y):
    """Bilinear sample of (H, W) ``img`` at float coords; zero outside."""
    img = jnp.asarray(img)
    H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    out = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
           + fy * ((1 - fx) * v10 + fx * v11))
    inside = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    return jnp.where(inside, out, 0.0)


def rectification_warp(img, K_src, R_rect, K_rect):
    """Warp an image into its rectified frame (inverse homography map).

    For a pure rotation the source pixel of rectified pixel p is
    ``K_src R_rect^T K_rect^-1 p`` — each output pixel bilinearly samples
    the source there (zero outside).  Apply with (rig.c1.K, rig.R1,
    rig.P1[:, :3]) and (rig.c2.K, rig.R2, ...) from stereo_rectify to feed
    unrectified rigs into the rectified stereo pipeline.
    """
    img = jnp.asarray(img, jnp.float32)
    H, W = img.shape
    Hmat = (jnp.asarray(K_src) @ jnp.asarray(R_rect).T
            @ jnp.linalg.inv(jnp.asarray(K_rect)))
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(xs)
    src = jnp.einsum("ij,jhw->ihw", Hmat, jnp.stack([xs, ys, ones]))
    sx = src[0] / src[2]
    sy = src[1] / src[2]
    return _bilinear_sample(img, sx, sy)
