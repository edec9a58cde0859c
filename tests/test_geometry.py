"""Geometry-core oracle tests.

Ports the reference's disabled/unreachable test knowledge (SURVEY.md §4):
  - F_from_P algebraic identity on the canonical camera pair
    (reference src/mvg.cpp:73-89).
  - projection <-> triangulation roundtrips (test/test.cpp:9-39).
  - epipolar constraint x2' F x1 = 0 for projected points.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libviso_tpu.geometry import (
    F_from_P,
    F_from_P_host,
    P_from_KRt,
    algebraic_distance,
    chain_motions,
    e2h,
    h2e,
    invert_se3,
    pose_vector_to_matrix,
    project,
    rotation_derivatives,
    sampson_distance,
    triangulate_dlt,
    triangulate_rectified,
    euler_to_rotation,
)


def kitti_like_projections():
    """A KITTI-style rectified pair (f, cu, cv, baseline)."""
    f, cu, cv, base = 718.856, 607.1928, 185.2157, 0.5371657
    P1 = np.array([[f, 0, cu, 0], [0, f, cv, 0], [0, 0, 1, 0]])
    P2 = P1.copy()
    P2[0, 3] = -f * base
    return jnp.array(P1), jnp.array(P2), (f, cu, cv, base)


def test_e2h_h2e_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(7, 3)))
    np.testing.assert_allclose(h2e(e2h(x)), x, rtol=1e-6)


def test_f_from_p_canonical():
    # Reference oracle: src/mvg.cpp:73-89.
    P1 = jnp.array([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]])
    P2 = jnp.array([[1.0, 0, 0, 1], [0, 1, 0, 0], [0, 0, 1, 0]])
    F = F_from_P(P1, P2)
    F_true = jnp.array([[0.0, 0, 0], [0, 0, 1], [0, -1, 0]])
    np.testing.assert_allclose(F, F_true, atol=1e-7)


def test_f_from_p_epipolar_constraint(rng):
    # Setup-path F (host, float64): pixel-scale accuracy required since the
    # matcher's Sampson gate uses threshold 1.0 (src/viso.cpp:63).
    P1, P2, _ = kitti_like_projections()
    F = jnp.asarray(F_from_P_host(np.asarray(P1), np.asarray(P2)),
                    dtype=jnp.float32)
    X = jnp.asarray(rng.uniform(0.5, 30.0, size=(50, 3)) * np.array([1, 1, 3]))
    x1 = project(P1, X)
    x2 = project(P2, X)
    # F[2,2] is 0 for a rectified pair; normalize by max-abs for the test.
    Fn = F / jnp.max(jnp.abs(F))
    d = algebraic_distance(Fn, x1, x2)
    np.testing.assert_allclose(d, 0.0, atol=1e-2)
    s = sampson_distance(Fn, x1, x2)
    np.testing.assert_allclose(s, 0.0, atol=1e-4)


def test_f_from_p_host_matches_device_small_scale():
    # The jittable 9-determinant form agrees with the host path when the
    # camera entries are O(1) (no cancellation).
    P1 = jnp.array([[1.0, 0, 0.5, 0], [0, 1, 0.2, 0], [0, 0, 1, 0]])
    P2 = jnp.array([[1.0, 0.1, 0.5, 0.3], [0, 1, 0.2, 0.1], [0, 0.05, 1, 0]])
    Fd = F_from_P(P1, P2)
    Fh = F_from_P_host(np.asarray(P1), np.asarray(P2))
    np.testing.assert_allclose(Fd / jnp.max(jnp.abs(Fd)),
                               Fh / np.max(np.abs(Fh)), atol=1e-5)


def test_p_from_krt():
    K = jnp.array([[700.0, 0, 600], [0, 700, 180], [0, 0, 1]])
    R = euler_to_rotation(jnp.array([0.01, -0.02, 0.03]))
    t = jnp.array([0.5, -0.1, 0.2])
    P = P_from_KRt(K, R, t)
    np.testing.assert_allclose(P, K @ jnp.concatenate([R, t[:, None]], axis=1),
                               rtol=1e-6)


def test_triangulate_rectified_roundtrip(rng):
    P1, P2, (f, cu, cv, base) = kitti_like_projections()
    X = jnp.asarray(
        np.stack([rng.uniform(-10, 10, 40), rng.uniform(-2, 2, 40),
                  rng.uniform(4, 40, 40)], axis=-1))
    x1 = project(P1, X)
    x2 = project(P2, X)
    obs = jnp.concatenate([x1, x2], axis=-1)
    Xr = triangulate_rectified(obs, f, base, cu, cv)
    np.testing.assert_allclose(Xr, X, rtol=1e-3, atol=1e-3)


def test_triangulate_dlt_roundtrip(rng):
    # Reference oracle pattern: test/test.cpp:9-39 (disabled test).
    P1, P2, _ = kitti_like_projections()
    X = jnp.asarray(
        np.stack([rng.uniform(-10, 10, 25), rng.uniform(-2, 2, 25),
                  rng.uniform(4, 40, 25)], axis=-1))
    x1 = project(P1, X)
    x2 = project(P2, X)
    Xd = triangulate_dlt(x1, x2, P1, P2)
    np.testing.assert_allclose(Xd, X, rtol=1e-2, atol=1e-2)


def test_pose_vector_roundtrip():
    tr = jnp.array([0.01, -0.02, 0.005, 0.3, -0.1, 1.2])
    T = pose_vector_to_matrix(tr)
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, jnp.eye(3), atol=1e-6)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-6)
    np.testing.assert_allclose(T[3], jnp.array([0, 0, 0, 1.0]), atol=0)
    Tinv = invert_se3(T)
    np.testing.assert_allclose(T @ Tinv, jnp.eye(4), atol=1e-6)


def test_rotation_derivatives_match_autodiff():
    r = jnp.array([0.07, -0.13, 0.21])
    analytic = rotation_derivatives(r)
    auto = jax.jacfwd(euler_to_rotation)(r)  # (3, 3, 3) with param axis last
    np.testing.assert_allclose(analytic, jnp.moveaxis(auto, -1, 0), atol=1e-6)


def test_chain_motions_matches_serial():
    trs = jnp.array([
        [0.0, 0, 0, 0, 0, 0],
        [0.01, 0.0, 0.0, 0.0, 0.0, 0.8],
        [0.0, 0.02, 0.0, 0.1, 0.0, 0.9],
        [0.0, 0.0, -0.01, 0.0, 0.05, 1.1],
    ])
    Ts = pose_vector_to_matrix(trs)
    valid = jnp.array([True, True, False, True])
    poses = chain_motions(Ts, valid)
    # serial reference: pose = pose @ inv(T) for valid frames
    pose = jnp.eye(4)
    expected = []
    for i in range(4):
        if valid[i]:
            pose = pose @ jnp.linalg.inv(Ts[i])
        expected.append(pose)
    np.testing.assert_allclose(poses, jnp.stack(expected), atol=1e-5)


def test_batched_f_from_p(rng):
    P1, P2, _ = kitti_like_projections()
    P1b = jnp.broadcast_to(P1, (4, 3, 4))
    P2b = jnp.broadcast_to(P2, (4, 3, 4))
    Fb = F_from_P(P1b, P2b)
    assert Fb.shape == (4, 3, 3)
    np.testing.assert_allclose(Fb[0], F_from_P(P1, P2), rtol=1e-6)


def test_rms_matches_reference_semantics():
    """mvg.cpp:12-30: column-wise sqrt of SUM of squared differences."""
    from libviso_tpu.geometry.mvg import rms

    X1 = jnp.asarray([[1.0, 2.0], [4.0, 6.0]])
    X2 = jnp.asarray([[0.0, 0.0], [0.0, 0.0]])
    out = np.asarray(rms(X1, X2))
    np.testing.assert_allclose(out, [np.sqrt(17.0), np.sqrt(40.0)],
                               rtol=1e-6)


def test_stereocam_derived_projections():
    """mvg.h:96-118: p1 = [K1|0], p2 = K2 [R|t], F consistent."""
    from libviso_tpu.geometry.mvg import Camera, StereoCam, project, e2h

    rng = np.random.default_rng(0)
    K = jnp.asarray([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    # small stereo rig: pure x-translation
    rig = StereoCam(c1=Camera(K=K), c2=Camera(K=K),
                    R=jnp.eye(3), t=jnp.asarray([-0.5, 0.0, 0.0]))
    P1 = np.asarray(rig.p1())
    P2 = np.asarray(rig.p2())
    np.testing.assert_allclose(P1[:, :3], np.asarray(K), rtol=1e-6)
    np.testing.assert_allclose(P1[:, 3], 0.0, atol=1e-9)
    np.testing.assert_allclose(P2[:, 3], np.asarray(K) @ [-0.5, 0, 0],
                               rtol=1e-6)
    # F annihilates corresponding points: x2' F x1 = 0
    F = np.asarray(rig.F())
    X = np.stack([rng.uniform(-2, 2, 20), rng.uniform(-2, 2, 20),
                  rng.uniform(3, 10, 20), np.ones(20)], axis=-1)
    x1 = np.asarray(project(jnp.asarray(P1), jnp.asarray(X[:, :3])))
    x2 = np.asarray(project(jnp.asarray(P2), jnp.asarray(X[:, :3])))
    h1 = np.concatenate([x1, np.ones((20, 1))], axis=1)
    h2 = np.concatenate([x2, np.ones((20, 1))], axis=1)
    Fn = F / np.linalg.norm(F)
    resid = np.abs(np.einsum("ni,ij,nj->n", h2, Fn, h1))
    # pixel-homogeneous magnitudes ~1e5; exact correspondences -> tiny
    assert resid.max() < 1e-2, resid.max()


def test_camera_default_distortion():
    from libviso_tpu.geometry.mvg import Camera

    cam = Camera(K=jnp.eye(3))
    assert cam.D.shape == (4,)
    assert float(jnp.abs(cam.D).max()) == 0.0


def test_stereo_rectify_oracle(rng):
    """Bouguet rectification: rectified projections of corresponding
    points share v exactly, disparity is positive, the P2 baseline model
    holds, and Q recovers depth — the precondition for the pipeline's
    rectified triangulation (mvg.h:112-118 fields, computed here)."""
    from libviso_tpu.geometry.mvg import (
        Camera,
        StereoCam,
        _rodrigues,
        stereo_rectify,
    )

    K = jnp.asarray([[500.0, 0, 320], [0, 510, 240], [0, 0, 1]])
    Rw = np.asarray(_rodrigues(jnp.asarray([0.02, -0.05, 0.01])))
    t = np.array([-0.54, 0.01, -0.02])
    rig = stereo_rectify(StereoCam(c1=Camera(K=K), c2=Camera(K=K),
                                   R=Rw, t=t))
    R1 = np.asarray(rig.R1)
    R2 = np.asarray(rig.R2)
    assert np.allclose(R1 @ R1.T, np.eye(3), atol=1e-5)
    assert np.allclose(R2 @ Rw, R1, atol=1e-5)

    X = np.stack([rng.uniform(-2, 2, 50), rng.uniform(-1, 1, 50),
                  rng.uniform(3, 10, 50)], -1)
    x1r = (R1 @ X.T).T
    x2r = (R2 @ ((Rw @ X.T).T + t).T).T
    Kr = np.asarray(rig.P1)[:, :3]
    p1 = (Kr @ x1r.T).T
    p1 = p1[:, :2] / p1[:, 2:3]
    p2 = (Kr @ x2r.T).T
    p2 = p2[:, :2] / p2[:, 2:3]
    assert np.abs(p1[:, 1] - p2[:, 1]).max() < 1e-3     # epipolar rows
    d = p1[:, 0] - p2[:, 0]
    assert (d > 0).all()                                # positive disparity
    base = np.linalg.norm(t)
    Z = float(np.asarray(rig.Q)[2, 3]) * base / d       # f*b/d
    assert np.abs(Z - x1r[:, 2]).max() < 1e-3


def test_rodrigues_log_roundtrip(rng):
    from libviso_tpu.geometry.mvg import _log_so3, _rodrigues

    for _ in range(5):
        v = jnp.asarray(rng.uniform(-1.5, 1.5, 3))
        R = _rodrigues(v)
        np.testing.assert_allclose(np.asarray(_log_so3(R)), np.asarray(v),
                                   atol=1e-5)
    # identity edge case
    np.testing.assert_allclose(
        np.asarray(_rodrigues(jnp.zeros(3))), np.eye(3), atol=1e-7)


def test_rectification_warp_roundtrip(rng):
    """Warping with the identity rectification is the identity; warping by
    a known rotation moves a bright dot where the homography predicts."""
    from libviso_tpu.geometry.mvg import (
        _rodrigues,
        rectification_warp,
    )

    K = jnp.asarray([[100.0, 0, 64], [0, 100, 32], [0, 0, 1]])
    img = jnp.asarray(rng.uniform(0, 255, (64, 128)), jnp.float32)
    out = rectification_warp(img, K, jnp.eye(3), K)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)

    # dot test: place a spike, warp by small rotation, locate the spike
    img2 = jnp.zeros((64, 128)).at[30:32, 70:72].set(255.0)
    R = _rodrigues(jnp.asarray([0.0, 0.02, 0.0]))
    out2 = np.asarray(rectification_warp(img2, K, R, K))
    yy, xx = np.unravel_index(np.argmax(out2), out2.shape)
    # predicted: p_rect = K R K^-1 p_src
    p = np.asarray(K) @ np.asarray(R) @ np.linalg.inv(np.asarray(K)) @ [71, 31, 1]
    assert abs(xx - p[0] / p[2]) < 2 and abs(yy - p[1] / p[2]) < 2


def test_euler_round_trip_near_gimbal_lock(rng):
    """Matrix-level round trip pose->matrix->pose->matrix near AND AT the
    ry=+-90deg singularity.  The VECTOR is not unique there (rx/rz
    couple), but the reconstructed MATRIX must still reproduce: measured
    worst f32 error 1.2e-7 away from the singularity, ~4e-5 within 0.1
    deg of it, exact-at-singularity fine (atan2(0,0)=0 picks a valid
    member of the gimbal family).  Loop-closure edges at ~90 deg heading
    difference ride this path (pipeline/loop.py LoopEdge.tr)."""
    from libviso_tpu.geometry.se3 import (
        matrix_to_pose_vector,
        pose_vector_to_matrix,
    )

    for dist_deg, tol in [(10.0, 1e-5), (1.0, 1e-5), (0.1, 2e-4),
                          (0.0, 1e-5)]:
        for _ in range(20):
            ry = np.radians(90 - dist_deg) * (1 if rng.random() < .5
                                              else -1)
            tr = np.array([rng.uniform(-3, 3), ry, rng.uniform(-3, 3),
                           *rng.uniform(-5, 5, 3)], np.float32)
            T = pose_vector_to_matrix(jnp.asarray(tr))
            T2 = pose_vector_to_matrix(matrix_to_pose_vector(T))
            assert float(jnp.abs(T - T2).max()) < tol, (dist_deg, tr)
