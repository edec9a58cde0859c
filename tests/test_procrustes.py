"""Procrustes / rigid-motion oracle tests.

Ports the reference's commented-out ``test_solveRigidMotion``
(test/test.cpp:171-205): a known R,t applied to a random cloud must be
recovered near-exactly; the RANSAC wrapper must reject outliers.
"""

import jax
import jax.numpy as jnp
import numpy as np

from libviso_tpu.geometry import (
    euler_to_rotation,
    pose_vector_to_matrix,
    ransac_rigid_motion,
    solve_rigid_motion,
)


def make_cloud_pair(rng, n=60, noise=0.0):
    tr = jnp.array([0.04, -0.07, 0.02, 0.5, -0.2, 1.0])
    T = pose_vector_to_matrix(tr)
    B = jnp.asarray(rng.normal(size=(n, 3)) * 5.0)
    A = B @ T[:3, :3].T + T[:3, 3]
    if noise:
        A = A + noise * jnp.asarray(rng.normal(size=A.shape))
    return A, B, T


def test_solve_rigid_motion_exact(rng):
    A, B, T = make_cloud_pair(rng)
    T_est = solve_rigid_motion(A, B)
    np.testing.assert_allclose(T_est, T, atol=1e-5)


def test_solve_rigid_motion_weighted(rng):
    A, B, T = make_cloud_pair(rng, n=80)
    # corrupt half the points; weights mask them out
    A_bad = A.at[40:].add(100.0)
    w = jnp.concatenate([jnp.ones(40), jnp.zeros(40)])
    T_est = solve_rigid_motion(A_bad, B, weights=w)
    np.testing.assert_allclose(T_est, T, atol=1e-5)


def test_ransac_rigid_motion_rejects_outliers(rng):
    A, B, T = make_cloud_pair(rng, n=100, noise=0.005)
    # 30% outliers
    outliers = jnp.asarray(rng.uniform(size=(100,)) < 0.3)
    A_corrupt = jnp.where(outliers[:, None],
                          A + jnp.asarray(rng.normal(size=A.shape)) * 10.0, A)
    key = jax.random.PRNGKey(0)
    T_est, inl_mask, n_inl = ransac_rigid_motion(
        key, A_corrupt, B, num_hypotheses=100, inlier_thresh=0.1)
    assert int(n_inl) > 50
    np.testing.assert_allclose(T_est, T, atol=0.02)
    # inliers should mostly be the uncorrupted points
    assert float(jnp.mean(outliers[inl_mask].astype(jnp.float32))) < 0.05


def test_ransac_rigid_motion_respects_valid_mask(rng):
    A, B, T = make_cloud_pair(rng, n=64)
    # garbage in padded slots
    A_pad = A.at[48:].set(1e6)
    valid = jnp.arange(64) < 48
    key = jax.random.PRNGKey(1)
    T_est, inl_mask, n_inl = ransac_rigid_motion(key, A_pad, B, valid=valid)
    assert int(n_inl) == 48
    assert not bool(jnp.any(inl_mask[48:]))
    np.testing.assert_allclose(T_est, T, atol=1e-4)


def test_horn_matches_svd_kabsch(rng):
    """Horn-quaternion Kabsch agrees with the SVD solve on batched
    well-posed problems."""
    from libviso_tpu.geometry.procrustes import (
        solve_rigid_motion,
        solve_rigid_motion_horn,
    )
    from libviso_tpu.geometry.se3 import pose_vector_to_matrix

    H, n = 16, 3
    trs = jnp.asarray(rng.uniform(-0.2, 0.2, (H, 6)), jnp.float32)
    T_true = pose_vector_to_matrix(trs)
    B = jnp.asarray(rng.uniform(-5, 5, (H, n, 3)) + [0, 0, 12],
                    jnp.float32)
    A = jnp.einsum("hij,hnj->hni", T_true[:, :3, :3], B) \
        + T_true[:, None, :3, 3]
    T_svd = solve_rigid_motion(A, B)
    T_horn = solve_rigid_motion_horn(A, B)
    np.testing.assert_allclose(np.asarray(T_horn), np.asarray(T_svd),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(T_horn), np.asarray(T_true),
                               atol=5e-5)


def test_horn_near_180_degree_rotations(rng):
    """Rotations near 180 deg have qw ~ 0 — the classic failure for a
    fixed power-iteration start vector; the dominant-column extraction
    must stay accurate there."""
    import numpy as np

    from libviso_tpu.geometry.procrustes import solve_rigid_motion_horn

    H, n = 32, 3
    axes = rng.normal(size=(H, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = np.pi - rng.uniform(0, 1e-3, H)
    Rs = []
    for a, th in zip(axes, angles):
        Kx = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]],
                       [-a[1], a[0], 0]])
        Rs.append(np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx)
    Rs = jnp.asarray(np.stack(Rs), jnp.float32)
    B = jnp.asarray(rng.uniform(-5, 5, (H, n, 3)), jnp.float32)
    A = jnp.einsum("hij,hnj->hni", Rs, B)
    T = solve_rigid_motion_horn(A, B)
    resid = jnp.einsum("hij,hnj->hni", T[:, :3, :3], B) \
        + T[:, None, :3, 3] - A
    assert float(jnp.max(jnp.abs(resid))) < 2e-4


def test_horn_huge_coordinates_no_overflow(rng):
    """Clouds at ~1e6 coordinates (clamped-disparity triangulations) must
    not overflow the squaring chain into an identity rotation."""
    from libviso_tpu.geometry.procrustes import solve_rigid_motion_horn
    from libviso_tpu.geometry.se3 import pose_vector_to_matrix

    H, n = 8, 3
    trs = jnp.asarray(rng.uniform(-0.2, 0.2, (H, 6)), jnp.float32)
    T_true = pose_vector_to_matrix(trs)
    B = jnp.asarray(rng.uniform(-5e5, 5e5, (H, n, 3)), jnp.float32)
    A = jnp.einsum("hij,hnj->hni", T_true[:, :3, :3], B) \
        + T_true[:, None, :3, 3]
    T = solve_rigid_motion_horn(A, B)
    np.testing.assert_allclose(np.asarray(T[:, :3, :3]),
                               np.asarray(T_true[:, :3, :3]), atol=1e-3)
