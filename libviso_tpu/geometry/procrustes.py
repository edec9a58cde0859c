"""3D-3D rigid alignment: Procrustes/Kabsch + vmapped RANSAC (SURVEY.md C14).

The reference's alternative pose estimator (src/estimation.cpp:29-51 with the
RANSAC wrapper src/viso.cpp:1101-1135).  Here the SVD is batched over RANSAC
hypotheses with ``vmap`` — all hypotheses solve simultaneously — and masked
weights replace ragged inlier subsets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_rigid_motion(A, B, weights=None):
    """Weighted orthogonal Procrustes: find R, t minimizing sum w |R b + t - a|^2.

    Convention matches the reference ``solveRigidMotion``
    (src/estimation.cpp:29-51): the returned transform maps the second cloud
    onto the first, ``T @ B ~= A``.

    Args:
      A: (..., N, 3) target points.
      B: (..., N, 3) source points.
      weights: optional (..., N) nonnegative weights (0 masks a point out).

    Returns:
      (..., 4, 4) rigid transform.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    if weights is None:
        weights = jnp.ones_like(A[..., 0])
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
    mean_a = jnp.sum(A * w, axis=-2, keepdims=True) / wsum
    mean_b = jnp.sum(B * w, axis=-2, keepdims=True) / wsum
    Ac = (A - mean_a) * jnp.sqrt(w)
    Bc = (B - mean_b) * jnp.sqrt(w)
    # Cross-covariance: rows of C follow the A axes, cols the B axes, so the
    # SVD factors give R mapping B-frame vectors into the A frame.
    C = jnp.einsum("...ni,...nj->...ij", Ac, Bc, precision="highest")
    U, _, Vt = jnp.linalg.svd(C)
    det = jnp.linalg.det(jnp.matmul(U, Vt, precision="highest"))
    D = jnp.zeros_like(U).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    D = D.at[..., 2, 2].set(det)
    R = jnp.matmul(jnp.matmul(U, D, precision="highest"), Vt, precision="highest")
    t = mean_a[..., 0, :] - jnp.einsum("...ij,...j->...i", R, mean_b[..., 0, :], precision="highest")
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def _apply(T, X):
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], X, precision="highest") + T[..., None, :3, 3]


def ransac_rigid_motion(key, A, B, valid=None, num_hypotheses=100,
                        inlier_thresh=0.1, model_size=3):
    """RANSAC over rigid alignments, all hypotheses as one vmapped batch.

    Mirrors the reference ``ransacRigidMotion`` (src/viso.cpp:1101-1135):
    N 3-point hypotheses, inliers are points with residual < thresh, best
    support set wins.  TPU-native: sampling uses the Gumbel-top-k trick over
    the validity mask, the Procrustes solve batches over the hypothesis axis.

    Args:
      key: jax PRNG key.
      A, B: (N, 3) clouds; solves T @ B ~= A.
      valid: optional (N,) mask of real (non-padded) points.
      num_hypotheses: RANSAC iterations (reference N=100, viso.cpp:1106).
      inlier_thresh: residual threshold (reference .1, viso.cpp:1123).
      model_size: points per sample (reference 3).

    Returns:
      (T_best (4,4), inlier_mask (N,), num_inliers ()).
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    N = A.shape[0]
    if valid is None:
        valid = jnp.ones((N,), dtype=bool)

    # Sample `model_size` distinct valid indices per hypothesis.
    gumbel = jax.random.gumbel(key, (num_hypotheses, N))
    scores = jnp.where(valid[None, :], gumbel, -jnp.inf)
    _, sample_idx = jax.lax.top_k(scores, model_size)  # (H, model_size)

    sampleA = A[sample_idx]  # (H, model_size, 3)
    sampleB = B[sample_idx]
    T = solve_rigid_motion(sampleA, sampleB)  # (H, 4, 4)

    resid = jnp.sum((_apply(T, B[None]) - A[None]) ** 2, axis=-1)  # (H, N)
    inl = (resid < inlier_thresh**2) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    # Final refit on the best support set (masked weights, fixed shape).
    best_mask = inl[best]
    T_refit = solve_rigid_motion(A, B, weights=best_mask.astype(A.dtype))
    resid_f = jnp.sum((_apply(T_refit, B) - A) ** 2, axis=-1)
    final_mask = (resid_f < inlier_thresh**2) & valid
    return T_refit, final_mask, jnp.sum(final_mask)
