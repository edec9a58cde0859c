"""Essential/fundamental matrix estimation and pose recovery (SURVEY.md C3).

The reference's mono path calls OpenCV's ``findEssentialMat`` (5-point +
RANSAC, src/viso.cpp:1384) and then *stops* — it never recovers R, t or
chains poses (src/viso.cpp:1393-1395).  The TPU build offers both minimal
solvers inside a fully batched RANSAC — the **8-point** estimator (one
batched SVD over all hypotheses) and the **Nister 5-point**
(geometry/five_point.py, exact reference parity, robust to planar scenes) —
and completes the pipeline: E -> (R, t) by cheirality voting,
scale-ambiguous pose chaining.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from libviso_tpu.geometry.mvg import e2h, sampson_distance


def normalize_points(x, K):
    """Pixel -> normalized camera coordinates via K^-1 (zero distortion).

    The ``undistortPoints(x, K, dist=None)`` analog (src/viso.cpp:1382-1383).
    """
    K = jnp.asarray(K)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    skew = K[0, 1]
    y = (jnp.asarray(x)[..., 1] - cy) / fy
    xn = (jnp.asarray(x)[..., 0] - cx - skew * y) / fx
    return jnp.stack([xn, y], axis=-1)


def eight_point_E(x1, x2, weights=None):
    """Essential matrix from >= 8 normalized correspondences (batched).

    Hartley's normalized 8-point algorithm with the essential-matrix
    projection (singular values -> (s, s, 0), s = mean of the two largest).
    ``x1``/``x2`` are (..., N, 2) normalized coordinates with x2' E x1 = 0.
    ``weights`` (0/1 mask or soft weights) excludes rows with fixed shapes.
    """
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    h1 = e2h(x1)
    h2 = e2h(x2)
    # rows of the DLT system: kron(x1_h, x2_h) ordered for vec(E) row-major
    A = jnp.einsum("...ni,...nj->...nij", h2, h1).reshape(
        x1.shape[:-1] + (9,))
    if weights is not None:
        A = A * weights[..., None]
    # least-squares null vector via SVD of A (batched).  full_matrices=True
    # is required: a minimal 8x9 system's null vector lives in the 9th right
    # singular vector, which the thin SVD omits.
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    E = vt[..., -1, :].reshape(x1.shape[:-2] + (3, 3))
    # project onto the essential manifold
    U, s, Vt = jnp.linalg.svd(E)
    sm = (s[..., 0] + s[..., 1]) / 2.0
    S = jnp.zeros_like(E).at[..., 0, 0].set(sm).at[..., 1, 1].set(sm)
    E = jnp.matmul(jnp.matmul(U, S, precision="highest"), Vt,
                   precision="highest")
    return E


def decompose_E(E):
    """The four (R, t) candidates of an essential matrix.

    Returns (Rs (..., 4, 3, 3), ts (..., 4, 3)), ||t|| = 1.  Convention:
    x2 ~ R x1 + t (motion of points from camera 1 into camera 2 frame).
    """
    E = jnp.asarray(E)
    U, _, Vt = jnp.linalg.svd(E)
    # make U, Vt proper rotations (the sign flips on U's last column are
    # absorbed by the +-t candidates)
    U = U.at[..., :, 2].multiply(jnp.where(jnp.linalg.det(U) < 0, -1.0, 1.0)[..., None])
    Vt = Vt.at[..., 2, :].multiply(jnp.where(jnp.linalg.det(Vt) < 0, -1.0, 1.0)[..., None])
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)
    Ra = jnp.matmul(jnp.matmul(U, W, precision="highest"), Vt,
                    precision="highest")
    Rb = jnp.matmul(jnp.matmul(U, W.T, precision="highest"), Vt,
                    precision="highest")
    t = U[..., :, 2]
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    Rs = jnp.stack([Ra, Ra, Rb, Rb], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def _depths(R, t, x1, x2):
    """Depths of triangulated points in both cameras for candidate (R, t).

    Midpoint-free linear triangulation specialized for normalized cameras
    P1 = [I|0], P2 = [R|t]: solve per point for z1 from
    x2_h x (R x1_h z1 + t) = 0 in least squares.
    """
    h1 = e2h(x1)  # (..., N, 3)
    Rx1 = jnp.einsum("...ij,...nj->...ni", R, h1)
    h2 = e2h(x2)
    # cross-product matrix application: c = h2 x (Rx1 * z + t) = 0
    cross_R = jnp.cross(h2, Rx1)
    cross_t = jnp.cross(h2, jnp.broadcast_to(t[..., None, :], h2.shape))
    # z * cross_R + cross_t = 0 -> z = -<cross_R, cross_t>/<cross_R, cross_R>
    num = -jnp.sum(cross_R * cross_t, axis=-1)
    den = jnp.sum(cross_R * cross_R, axis=-1)
    z1 = num / jnp.maximum(den, 1e-12)
    X1 = h1 * z1[..., None]
    X2 = jnp.einsum("...ij,...nj->...ni", R, X1) + t[..., None, :]
    return z1, X2[..., 2]


def recover_pose(E, x1, x2, valid=None):
    """Select the (R, t) candidate with the most points in front of both
    cameras (OpenCV recoverPose analog — the step the reference never
    implemented, SURVEY.md C3).

    Args:
      E: (3, 3) essential matrix (x2' E x1 = 0).
      x1, x2: (N, 2) normalized correspondences.
      valid: optional (N,) mask.

    Returns (R (3,3), t (3,), good (N,) cheirality mask, n_good ()).
    """
    if valid is None:
        valid = jnp.ones(x1.shape[-2], bool)
    Rs, ts = decompose_E(E)  # (4, 3, 3), (4, 3)
    z1, z2 = jax.vmap(lambda R, t: _depths(R, t, x1, x2))(Rs, ts)
    front = (z1 > 0) & (z2 > 0) & valid[None, :]
    counts = jnp.sum(front, axis=-1)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], front[best], counts[best]


class EssentialResult(NamedTuple):
    E: jax.Array          # (3, 3)
    inliers: jax.Array    # (N,) bool
    num_inliers: jax.Array
    ok: jax.Array


def ransac_essential(key, x1, x2, valid=None, num_hypotheses=128,
                     sampson_thresh=1e-5, min_inliers=16,
                     sample_size=8, method="8pt") -> EssentialResult:
    """Batched RANSAC essential-matrix estimation on normalized points.

    All hypotheses evaluated simultaneously: Gumbel-top-k sampling,
    batched minimal solve, Sampson-distance scoring in normalized
    coordinates, final refit on the best support set (weighted 8-point
    over all inliers).

    ``method``: '8pt' (default — one SVD per hypothesis) or '5pt' (the
    Nister minimal solver, geometry/five_point.py — exact reference
    parity with OpenCV findEssentialMat, src/viso.cpp:1384, and immune to
    the planar-scene degeneracy of the 8-point solver).  With '5pt' every
    hypothesis contributes up to 22 candidate models, all scored.
    """
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    N = x1.shape[0]
    if valid is None:
        valid = jnp.ones(N, bool)
    if method == "5pt":
        sample_size = 5

    gumbel = jax.random.gumbel(key, (num_hypotheses, N), dtype=x1.dtype)
    scores = jnp.where(valid[None, :], gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(scores, sample_size)

    if method == "5pt":
        from libviso_tpu.geometry.five_point import five_point_E

        Ec, cand_ok = five_point_E(x1[idx], x2[idx])   # (H, 22, 3, 3)
        E = Ec.reshape((-1, 3, 3))                     # (H*22, 3, 3)
        cand_ok = cand_ok.reshape(-1)
        s = sampson_distance(E[:, None], x1[None], x2[None])
        inl = (s < sampson_thresh) & valid[None, :] & cand_ok[:, None]
    elif method == "8pt":
        E = eight_point_E(x1[idx], x2[idx])  # (H, 3, 3)
        s = sampson_distance(E[:, None], x1[None], x2[None])  # (H, N)
        inl = (s < sampson_thresh) & valid[None, :]
    else:
        raise ValueError(f"unknown method {method!r}")
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    w = inl[best].astype(x1.dtype)
    E_refit = eight_point_E(x1, x2, weights=w)
    # second refit round on the refreshed support set (IRLS-style): the
    # enlarged inlier set after round 1 sharpens the estimate
    s_1 = sampson_distance(E_refit, x1, x2)
    w2 = ((s_1 < sampson_thresh) & valid).astype(x1.dtype)
    E_refit = eight_point_E(x1, x2, weights=w2)
    s_f = sampson_distance(E_refit, x1, x2)
    final = (s_f < sampson_thresh) & valid
    n = jnp.sum(final)
    # LO-RANSAC guard: a least-squares refit can DEGRADE the model (e.g.
    # the linear system goes rank-deficient on planar scenes, where the
    # 5-point minimal model is fine).  The refit is usually slightly more
    # accurate, so keep it unless it LOSES a meaningful fraction of the
    # minimal model's support (degeneracy collapses support catastrophically,
    # not marginally).
    keep_refit = n.astype(x1.dtype) >= 0.8 * counts[best].astype(x1.dtype)
    E_out = jnp.where(keep_refit, E_refit, E[best])
    final = jnp.where(keep_refit, final, inl[best])
    n = jnp.where(keep_refit, n, counts[best])
    return EssentialResult(E=E_out, inliers=final, num_inliers=n,
                           ok=n >= min_inliers)


def undistort_points(x, K, D, iters: int = 5):
    """Pixel -> normalized coordinates with Brown-Conrady undistortion.

    OpenCV undistortPoints semantics with dist = (k1, k2, p1, p2): fixed-
    point iteration inverting the distortion model.  With D = 0 this
    reduces exactly to normalize_points (the reference always passes an
    empty distortion, src/viso.cpp:1382-1383; real cameras need this).
    """
    D = jnp.zeros(4) if D is None else jnp.asarray(D)
    k1, k2, p1, p2 = D[0], D[1], D[2], D[3]
    xd = normalize_points(x, K)  # distorted normalized coords
    u = xd
    for _ in range(iters):  # static unroll: tiny
        r2 = jnp.sum(u * u, axis=-1, keepdims=True)
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        ux = u[..., 0:1]
        uy = u[..., 1:2]
        tang = jnp.concatenate(
            [2 * p1 * ux * uy + p2 * (r2 + 2 * ux * ux),
             p1 * (r2 + 2 * uy * uy) + 2 * p2 * ux * uy], axis=-1)
        u = (xd - tang) / radial
    return u
