"""Pose-graph optimization: drift removal under loop-closure constraints
(beyond-reference back-end, solvers/pose_graph.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libviso_tpu.geometry.se3 import invert_se3, pose_vector_to_matrix
from libviso_tpu.solvers.pose_graph import (
    odometry_edges,
    optimize_pose_graph,
)


def _circle_trajectory(T, radius=20.0):
    """Ground-truth poses driving a closed circle in the xz plane."""
    poses = []
    for k in range(T):
        th = 2 * np.pi * k / (T - 1)
        c, s = np.cos(th), np.sin(th)
        P = np.eye(4)
        P[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
        P[0, 3] = radius * np.sin(th)
        P[2, 3] = radius * (1 - np.cos(th))
        poses.append(P)
    return jnp.asarray(np.stack(poses), jnp.float32)


def test_exact_graph_is_fixed_point(rng):
    gt = _circle_trajectory(24)
    i, j, z = odometry_edges(gt)
    res = optimize_pose_graph(gt, i, j, z, iters=3)
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.poses), np.asarray(gt),
                               atol=1e-4)


def test_loop_closure_removes_drift(rng):
    T = 24
    gt = _circle_trajectory(T)
    # corrupt odometry: small bias on every relative motion -> the chain
    # drifts and the loop does not close
    i, j, z = odometry_edges(gt)
    bias = pose_vector_to_matrix(
        jnp.asarray([2e-3, 0.0, 0.0, 0.04, 0.0, 0.02], jnp.float32))
    # bias only the first half of the edges: a constant local-frame bias
    # applied all the way around a closed loop largely cancels
    half = (T - 1) // 2
    z_biased = jnp.einsum("mij,jk->mik", z[:half], bias)
    z_noisy = jnp.concatenate([z_biased, z[half:]])
    # integrate the noisy odometry for the drifted initial trajectory
    drifted = [np.asarray(gt[0])]
    for k in range(T - 1):
        drifted.append(drifted[-1] @ np.asarray(z_noisy[k]))
    drifted = jnp.asarray(np.stack(drifted), jnp.float32)
    gap0 = float(jnp.linalg.norm(drifted[-1, :3, 3] - gt[-1, :3, 3]))
    assert gap0 > 0.3  # the drift is real

    # one loop-closure edge: first frame observed again at the end, with
    # the TRUE relative pose (a verified revisit)
    z_loop = invert_se3(gt[0])[None] @ gt[-1][None]
    ei = jnp.concatenate([i, jnp.asarray([0], jnp.int32)])
    ej = jnp.concatenate([j, jnp.asarray([T - 1], jnp.int32)])
    ez = jnp.concatenate([z_noisy, z_loop])
    wts = jnp.concatenate([jnp.ones((T - 1,)), jnp.asarray([50.0])])

    res = optimize_pose_graph(drifted, ei, ej, ez, weights=wts, iters=15)
    assert bool(res.ok)
    assert float(res.cost) < float(res.cost0)
    gap1 = float(jnp.linalg.norm(
        res.poses[-1, :3, 3] - gt[-1, :3, 3]))
    # the loop edge pulls the endpoint back onto the start
    assert gap1 < gap0 * 0.2


def test_reanchor_segments_propagates_between_nodes(rng):
    from libviso_tpu.solvers.pose_graph import reanchor_segments

    gt = _circle_trajectory(12)
    nodes = jnp.asarray([0, 4, 8, 11], jnp.int32)
    # identity correction: re-anchoring with unchanged node poses is a no-op
    out = reanchor_segments(gt, nodes, gt[np.asarray(nodes)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(gt), atol=1e-5)
    # shift node 1's pose by +1m in x: frames 4..7 shift with it, 0..3 not
    shifted = jnp.asarray(np.asarray(gt[np.asarray(nodes)]))
    shifted = shifted.at[1, 0, 3].add(1.0)
    out = np.asarray(reanchor_segments(gt, nodes, shifted))
    np.testing.assert_allclose(out[0, 0, 3], np.asarray(gt)[0, 0, 3],
                               atol=1e-5)
    assert abs(out[5, 0, 3] - np.asarray(gt)[5, 0, 3] - 1.0) < 1e-4


def _drifted_loop_setup(T=24):
    """Drifted circle + TRUE closing edge (shared by the robust tests)."""
    gt = _circle_trajectory(T)
    i, j, z = odometry_edges(gt)
    bias = pose_vector_to_matrix(
        jnp.asarray([2e-3, 0.0, 0.0, 0.04, 0.0, 0.02], jnp.float32))
    half = (T - 1) // 2
    z_noisy = jnp.concatenate(
        [jnp.einsum("mij,jk->mik", z[:half], bias), z[half:]])
    drifted = [np.asarray(gt[0])]
    for k in range(T - 1):
        drifted.append(drifted[-1] @ np.asarray(z_noisy[k]))
    drifted = jnp.asarray(np.stack(drifted), jnp.float32)
    z_true = invert_se3(gt[0])[None] @ gt[-1][None]
    return gt, i, j, z_noisy, drifted, z_true


def test_false_loop_edge_rejected_by_robust_kernel(rng):
    """VERDICT r1 #4a: one FALSE loop edge (an aliased revisit that passed
    verification) must not poison the graph — the Cauchy kernel drives its
    influence to ~0 while the true closing edge stays believed."""
    T = 24
    gt, i, j, z_noisy, drifted, z_true = _drifted_loop_setup(T)
    # false edge: claims frame T-1 re-observed frame 8 at the pose frame 0
    # actually has — a gross, self-inconsistent constraint
    z_false = invert_se3(gt[8])[None] @ (
        gt[-1] @ pose_vector_to_matrix(
            jnp.asarray([0.0, 0.6, 0.0, 4.0, 0.0, 3.0], jnp.float32)))[None]
    ei = jnp.concatenate([i, jnp.asarray([0, 8], jnp.int32)])
    ej = jnp.concatenate([j, jnp.asarray([T - 1, T - 1], jnp.int32)])
    ez = jnp.concatenate([z_noisy, z_true, z_false])
    wts = jnp.concatenate([jnp.ones((T - 1,)), jnp.asarray([50.0, 50.0])])
    rmask = jnp.concatenate([jnp.zeros((T - 1,), bool),
                             jnp.asarray([True, True])])

    gap0 = float(jnp.linalg.norm(drifted[-1, :3, 3] - gt[-1, :3, 3]))

    # plain squared loss: the false edge poisons the solution
    naive = optimize_pose_graph(drifted, ei, ej, ez, weights=wts,
                                iters=15, robust="none")
    gap_naive = float(jnp.linalg.norm(
        naive.poses[-1, :3, 3] - gt[-1, :3, 3]))

    robust = optimize_pose_graph(drifted, ei, ej, ez, weights=wts,
                                 iters=15, robust="cauchy",
                                 robust_mask=rmask)
    assert bool(robust.ok)
    gap_rob = float(jnp.linalg.norm(
        robust.poses[-1, :3, 3] - gt[-1, :3, 3]))

    # robust closes the loop; naive is dragged far off by the false edge
    assert gap_rob < 0.2 * gap0, (gap_rob, gap0)
    assert gap_rob < 0.25 * gap_naive, (gap_rob, gap_naive)
    # the kernel's verdict is legible: true edge believed, false rejected
    scale_true = float(robust.edge_scale[T - 1])
    scale_false = float(robust.edge_scale[T])
    assert scale_true > 0.5, scale_true
    assert scale_false < 0.05, scale_false


def test_robust_matches_plain_on_clean_graph(rng):
    """With only consistent edges the robust solve must reproduce the
    plain solve (residuals stay in the kernel's quadratic region)."""
    T = 24
    gt, i, j, z_noisy, drifted, z_true = _drifted_loop_setup(T)
    ei = jnp.concatenate([i, jnp.asarray([0], jnp.int32)])
    ej = jnp.concatenate([j, jnp.asarray([T - 1], jnp.int32)])
    ez = jnp.concatenate([z_noisy, z_true])
    wts = jnp.concatenate([jnp.ones((T - 1,)), jnp.asarray([50.0])])

    plain = optimize_pose_graph(drifted, ei, ej, ez, weights=wts,
                                iters=15, robust="none")
    rob = optimize_pose_graph(drifted, ei, ej, ez, weights=wts,
                              iters=15, robust="cauchy")
    assert bool(plain.ok) and bool(rob.ok)
    # robust_delta=0.05 sits far above the ~1e-3 consistent residuals on
    # the ODOMETRY edges, but the big closing correction passes through
    # the kernel early on — allow a small tolerance, not bit equality
    np.testing.assert_allclose(np.asarray(rob.poses),
                               np.asarray(plain.poses), atol=0.06)
    gap = float(jnp.linalg.norm(rob.poses[-1, :3, 3] - gt[-1, :3, 3]))
    gap0 = float(jnp.linalg.norm(drifted[-1, :3, 3] - gt[-1, :3, 3]))
    assert gap < 0.2 * gap0
