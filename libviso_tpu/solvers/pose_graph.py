"""Pose-graph optimization (loop closure back-end; beyond-reference).

Neither the reference nor its sliding-window BA can remove accumulated
drift once a place is revisited: every constraint they use is local in
time.  This solver takes a trajectory plus pairwise relative-pose
constraints — the sequential odometry edges and any loop-closure edges
(pipeline/loop.py detects them) — and finds the pose assignment that
minimizes the weighted residual over ALL edges simultaneously:

    r_ij = vec( inv(Z_ij) @ inv(T_i) @ T_j )          (6-dof per edge)

TPU-first shape: all edges evaluate as one batched gather + matmul
(no per-edge loop), the Jacobian of the full residual vector comes from
``jax.jacfwd`` (exact, no hand-derived adjoints), and the normal
equations solve densely — a (6T, 6T) Cholesky is trivial MXU work for
the ≤ few-hundred-keyframe graphs VO produces.  Gauge freedom is fixed
by freezing pose 0.

The residual is parameterized with the same Euler-XYZ 6-vectors as the
rest of the engine (geometry/se3.py): for the SMALL residuals of a
near-consistent graph, Euler and twist coordinates agree to first order,
which is all Gauss-Newton needs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from libviso_tpu.geometry.se3 import (
    invert_se3,
    matrix_to_pose_vector,
    pose_vector_to_matrix,
)


class PoseGraphResult(NamedTuple):
    poses: jax.Array      # (T, 4, 4) optimized absolute poses
    cost0: jax.Array      # () initial weighted squared residual
    cost: jax.Array       # () final
    ok: jax.Array         # () bool — solve stayed finite and reduced cost


def _edge_residuals(x, edges_i, edges_j, z_inv):
    """(M, 6) residual vectors for all edges at parameter x (T, 6)."""
    T = pose_vector_to_matrix(x)                      # (T, 4, 4)
    Ti_inv = invert_se3(T[edges_i])                   # (M, 4, 4)
    Tj = T[edges_j]
    rel = jnp.einsum("mij,mjk,mkl->mil", z_inv, Ti_inv, Tj,
                     precision="highest")
    return matrix_to_pose_vector(rel)                 # (M, 6)


def optimize_pose_graph(poses, edges_i, edges_j, z, weights=None,
                        iters: int = 10, damping: float = 1e-6):
    """Gauss-Newton over the pose graph.

    Args:
      poses: (T, 4, 4) initial absolute poses (pose 0 is the gauge and
        stays fixed).
      edges_i, edges_j: (M,) int32 endpoint indices per constraint.
      z: (M, 4, 4) measured relative poses, ``T_i^-1 T_j ~= z``.
      weights: optional (M,) per-edge weights (loop edges can be
        down/up-weighted against odometry edges).
      iters: Gauss-Newton iterations (each is one linearize + dense
        (6T, 6T) Cholesky solve).

    Returns PoseGraphResult.  Fixed shapes throughout; jit-compatible.
    """
    poses = jnp.asarray(poses)
    Tn = poses.shape[0]
    edges_i = jnp.asarray(edges_i, jnp.int32)
    edges_j = jnp.asarray(edges_j, jnp.int32)
    z_inv = invert_se3(jnp.asarray(z))
    M = edges_i.shape[0]
    if weights is None:
        weights = jnp.ones((M,), poses.dtype)
    w = jnp.sqrt(jnp.asarray(weights, poses.dtype))[:, None]  # (M, 1)

    x0 = matrix_to_pose_vector(poses)                 # (T, 6)

    def flat_res(xf):
        x = xf.reshape(Tn, 6)
        # gauge: pose 0 pinned to its initial value
        x = x.at[0].set(x0[0])
        return (w * _edge_residuals(x, edges_i, edges_j, z_inv)).reshape(-1)

    def cost_of(xf):
        r = flat_res(xf)
        return jnp.sum(r * r)

    jac = jax.jacfwd(flat_res)

    def gn_step(xf, _):
        r = flat_res(xf)                              # (6M,)
        J = jac(xf)                                   # (6M, 6T)
        A = J.T @ r
        H = J.T @ J + damping * jnp.eye(6 * Tn, dtype=xf.dtype)
        step = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(H), A)
        x_new = xf - step
        # keep the update only while it stays finite and non-increasing
        better = (jnp.isfinite(cost_of(x_new))
                  & (cost_of(x_new) <= cost_of(xf)))
        return jnp.where(better, x_new, xf), None

    xf0 = x0.reshape(-1)
    cost0 = cost_of(xf0)
    xf, _ = jax.lax.scan(gn_step, xf0, None, length=iters)
    cost = cost_of(xf)

    x = xf.reshape(Tn, 6).at[0].set(x0[0])
    out = pose_vector_to_matrix(x)
    ok = jnp.isfinite(cost) & (cost <= cost0)
    out = jnp.where(ok, out, poses)
    return PoseGraphResult(poses=out, cost0=cost0, cost=cost, ok=ok)


def odometry_edges(poses):
    """Sequential edges (i, i+1) with z from the trajectory itself."""
    Tn = poses.shape[0]
    i = jnp.arange(Tn - 1, dtype=jnp.int32)
    j = i + 1
    z = jnp.einsum("mij,mjk->mik", invert_se3(poses[:-1]), poses[1:],
                   precision="highest")
    return i, j, z
