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
    edge_scale: jax.Array  # (M,) final robust IRLS scaling per edge
    #   (1 everywhere when robust='none'; a rejected outlier edge ends
    #   near 0 — callers can report which loop closures were disbelieved)


def optimize_pose_graph(poses, edges_i, edges_j, z, weights=None,
                        iters: int = 10, damping: float = 1e-4,
                        robust: str = "cauchy", robust_mask=None,
                        robust_delta: float = 0.05):
    """Gauss-Newton (LM-damped) over the pose graph.

    Robustness (VERDICT r1 next #4a): under a plain squared loss ONE
    false loop edge — an aliased revisit that passed geometric
    verification — poisons the whole graph: the optimum splits the bogus
    constraint's error across every node.  Edges selected by
    ``robust_mask`` (typically the loop edges; odometry edges are
    trusted) therefore pass through a robust kernel, implemented as
    IRLS: each Gauss-Newton iteration scales the edge's weight by
    ``k(|r|)/|r|^2``-style attenuation computed from the CURRENT
    residual, so a grossly inconsistent edge sees its influence decay
    toward zero over the iterations while consistent edges keep ~unit
    scale (their residuals sit far below ``robust_delta``).  Cauchy
    (default) redescends — gross outliers are effectively switched off,
    the switchable-constraints behavior — while 'huber' only caps them.

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
      robust: 'cauchy' | 'huber' | 'none' — kernel applied to the edges
        selected by ``robust_mask``.
      robust_mask: optional (M,) bool; True = edge goes through the
        robust kernel.  None = ALL edges (safe default: a consistent
        edge's residual stays well under ``robust_delta``, where every
        kernel is quadratic, so the solve matches 'none' on clean
        graphs).
      robust_delta: kernel knee on the 6-dof residual norm (weighted
        units: meters + radians mixed).  Consistent post-optimization
        edges sit at ~1e-3; a false edge's residual is the loop error
        itself, orders of magnitude above.

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
    if robust_mask is None:
        rmask = jnp.ones((M,), bool)
    else:
        rmask = jnp.asarray(robust_mask, bool)
    if robust == "none":
        rmask = jnp.zeros((M,), bool)
    elif robust not in ("cauchy", "huber"):
        raise ValueError(f"unknown robust kernel {robust!r}")

    def apply_delta(xf):
        xi = xf.reshape(Tn, 6)
        xi = xi.at[0].set(0.0)            # gauge: node 0 pinned
        return jnp.einsum("tij,tjk->tik", T0, pose_vector_to_matrix(xi),
                          precision="highest")

    def edge_res(xf):
        """(M, 6) weighted per-edge residuals."""
        T = apply_delta(xf)
        rel = jnp.einsum("mij,mjk,mkl->mil", z_inv,
                         invert_se3(T[edges_i]), T[edges_j],
                         precision="highest")
        return w * matrix_to_pose_vector(rel)

    def irls_scale(r6):
        """(M,) sqrt IRLS weight from each edge's current residual norm.

        Derived from the kernel's influence function: GN on
        ``sqrt(w_irls) * r`` with w_irls = rho'(s)/s, s = |r|^2.
        """
        s = jnp.sum(r6 * r6, axis=-1)
        d2 = robust_delta * robust_delta
        if robust == "huber":
            # rho = s for s <= d2 else 2 d sqrt(s) - d2
            wr = jnp.minimum(1.0, jnp.sqrt(d2 / jnp.maximum(s, 1e-18)))
        else:  # cauchy: rho = d2 log(1 + s/d2)
            wr = 1.0 / (1.0 + s / d2)
        return jnp.where(rmask, jnp.sqrt(wr), 1.0)

    def cost_of(xf, sc):
        r = (sc[:, None] * edge_res(xf)).reshape(-1)
        return jnp.sum(r * r)

    def gn_step(xf, _):
        # IRLS: freeze the robust scaling at the current residuals, take
        # one damped GN step on the reweighted quadratic, guard by the
        # SAME frozen weights (a step must not be judged across a weight
        # change).
        sc = irls_scale(edge_res(xf))

        def flat_res(x):
            return (sc[:, None] * edge_res(x)).reshape(-1)

        r = flat_res(xf)                              # (6M,)
        J = jax.jacfwd(flat_res)(xf)                  # (6M, 6T)
        A = J.T @ r
        H = J.T @ J
        # LM scaling: damp relative to each parameter's own curvature
        H = H + damping * jnp.diag(jnp.diag(H)) \
            + 1e-8 * jnp.eye(6 * Tn, dtype=xf.dtype)
        step = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(H), A)
        x_new = xf - step
        # keep the update only while it stays finite and non-increasing
        better = (jnp.isfinite(cost_of(x_new, sc))
                  & (cost_of(x_new, sc) <= cost_of(xf, sc)))
        return jnp.where(better, x_new, xf), None

    xf0 = jnp.zeros((6 * Tn,), T0.dtype)
    xf, _ = jax.lax.scan(gn_step, xf0, None, length=iters)
    sc = irls_scale(edge_res(xf))
    cost = cost_of(xf, sc)
    # acceptance compares initial and final cost under the SAME (final)
    # IRLS scaling — comparing costs under different scalings is not an
    # ordering (a genuinely better solution whose scaling changed could
    # be rejected, and vice versa).  cost0 is still REPORTED under the
    # final scaling for the same reason: callers read (cost0, cost) as
    # one consistent objective.
    cost0 = cost_of(xf0, sc)

    out = apply_delta(xf)
    ok = jnp.isfinite(cost) & (cost <= cost0)
    out = jnp.where(ok, out, T0)
    return PoseGraphResult(poses=out, cost0=cost0, cost=cost, ok=ok,
                           edge_scale=sc * sc)


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
