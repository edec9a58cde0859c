"""Pose-graph optimization (loop closure back-end; beyond-reference).

Neither the reference nor its sliding-window BA can remove accumulated
drift once a place is revisited: every constraint they use is local in
time.  This solver takes a trajectory plus pairwise relative-pose
constraints — the sequential odometry edges and any loop-closure edges
(pipeline/loop.py detects them) — and finds the pose assignment that
minimizes the weighted residual over ALL edges simultaneously:

    r_ij = vec( inv(Z_ij) @ inv(T_i) @ T_j )          (6-dof per edge)

Parameterization: per-node DELTA poses, ``T_i = T0_i @ M(xi_i)`` with
``xi`` starting at zero.  Drift corrections are small, so every ``xi``
stays near the identity throughout the solve — the Euler-XYZ coordinates
(shared with the rest of the engine, geometry/se3.py) are then far from
gimbal lock no matter what absolute headings the trajectory visits (a
closed loop necessarily passes +-90 deg, where an absolute-Euler
parameterization degenerates).

TPU-first shape: all edges evaluate as one batched gather + matmul, the
Jacobian of the full residual vector comes from ``jax.jacfwd`` (exact,
no hand-derived adjoints), and the normal equations solve densely with
Levenberg-Marquardt scaling — a (6T, 6T) Cholesky is trivial MXU work at
the ≤ few-hundred-NODE graphs pipeline/loop.py builds (it optimizes over
keyframe nodes, not raw frames, and re-anchors the in-between frames
afterwards).  Gauge freedom is fixed by freezing node 0's delta at zero.
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


def optimize_pose_graph(poses, edges_i, edges_j, z, weights=None,
                        iters: int = 10, damping: float = 1e-4):
    """Gauss-Newton (LM-damped) over the pose graph.

    Args:
      poses: (T, 4, 4) initial absolute poses (node 0 is the gauge and
        stays fixed).
      edges_i, edges_j: (M,) int32 endpoint indices per constraint.
      z: (M, 4, 4) measured relative poses, ``T_i^-1 T_j ~= z``.
      weights: optional (M,) per-edge weights (loop edges can be
        down/up-weighted against odometry edges).
      iters: Gauss-Newton iterations (each is one linearize + dense
        (6T, 6T) Cholesky solve).
      damping: Levenberg-Marquardt factor on diag(H) — scale-aware, so
        meter-scale translations and radian-scale rotations are both
        regularized proportionally.

    Returns PoseGraphResult.  Fixed shapes throughout; jit-compatible.
    """
    T0 = jnp.asarray(poses)
    Tn = T0.shape[0]
    edges_i = jnp.asarray(edges_i, jnp.int32)
    edges_j = jnp.asarray(edges_j, jnp.int32)
    z_inv = invert_se3(jnp.asarray(z))
    M = edges_i.shape[0]
    if weights is None:
        weights = jnp.ones((M,), T0.dtype)
    w = jnp.sqrt(jnp.asarray(weights, T0.dtype))[:, None]  # (M, 1)

    def apply_delta(xf):
        xi = xf.reshape(Tn, 6)
        xi = xi.at[0].set(0.0)            # gauge: node 0 pinned
        return jnp.einsum("tij,tjk->tik", T0, pose_vector_to_matrix(xi),
                          precision="highest")

    def flat_res(xf):
        T = apply_delta(xf)
        rel = jnp.einsum("mij,mjk,mkl->mil", z_inv,
                         invert_se3(T[edges_i]), T[edges_j],
                         precision="highest")
        return (w * matrix_to_pose_vector(rel)).reshape(-1)

    def cost_of(xf):
        r = flat_res(xf)
        return jnp.sum(r * r)

    jac = jax.jacfwd(flat_res)

    def gn_step(xf, _):
        r = flat_res(xf)                              # (6M,)
        J = jac(xf)                                   # (6M, 6T)
        A = J.T @ r
        H = J.T @ J
        # LM scaling: damp relative to each parameter's own curvature
        H = H + damping * jnp.diag(jnp.diag(H)) \
            + 1e-8 * jnp.eye(6 * Tn, dtype=xf.dtype)
        step = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(H), A)
        x_new = xf - step
        # keep the update only while it stays finite and non-increasing
        better = (jnp.isfinite(cost_of(x_new))
                  & (cost_of(x_new) <= cost_of(xf)))
        return jnp.where(better, x_new, xf), None

    xf0 = jnp.zeros((6 * Tn,), T0.dtype)
    cost0 = cost_of(xf0)
    xf, _ = jax.lax.scan(gn_step, xf0, None, length=iters)
    cost = cost_of(xf)

    out = apply_delta(xf)
    ok = jnp.isfinite(cost) & (cost <= cost0)
    out = jnp.where(ok, out, T0)
    return PoseGraphResult(poses=out, cost0=cost0, cost=cost, ok=ok)


def odometry_edges(poses):
    """Sequential edges (i, i+1) with z from the trajectory itself."""
    Tn = poses.shape[0]
    i = jnp.arange(Tn - 1, dtype=jnp.int32)
    j = i + 1
    z = jnp.einsum("mij,mjk->mik", invert_se3(poses[:-1]), poses[1:],
                   precision="highest")
    return i, j, z


def reanchor_segments(poses_full, node_frames, node_poses_opt):
    """Propagate optimized NODE poses to every frame in between.

    Frames in segment [node_k, node_{k+1}) keep their original relative
    motion to node_k: ``T_f' = P_k' @ inv(P_k) @ T_f``.  Frames past the
    last node anchor to it.

    Args:
      poses_full: (T, 4, 4) original trajectory.
      node_frames: (K,) increasing frame indices of the graph nodes.
      node_poses_opt: (K, 4, 4) optimized node poses.

    Returns (T, 4, 4).
    """
    poses_full = jnp.asarray(poses_full)
    node_frames = jnp.asarray(node_frames, jnp.int32)
    Tn = poses_full.shape[0]
    # segment index of every frame: number of nodes at-or-before it, -1
    seg = jnp.clip(
        jnp.searchsorted(node_frames, jnp.arange(Tn), side="right") - 1,
        0, node_frames.shape[0] - 1)
    anchor_old = poses_full[node_frames[seg]]          # (T, 4, 4)
    anchor_new = jnp.asarray(node_poses_opt)[seg]
    fix = jnp.einsum("tij,tjk->tik", anchor_new, invert_se3(anchor_old),
                     precision="highest")
    return jnp.einsum("tij,tjk->tik", fix, poses_full,
                      precision="highest")
