"""Essential-matrix estimation and pose recovery oracle tests."""

import jax
import jax.numpy as jnp
import numpy as np

from libviso_tpu.geometry.essential import (
    decompose_E,
    eight_point_E,
    normalize_points,
    ransac_essential,
    recover_pose,
)
from libviso_tpu.geometry.mvg import sampson_distance
from libviso_tpu.geometry.se3 import euler_to_rotation


def make_mono_problem(rng, n=100, noise=0.0):
    """Known (R, t): x2 ~ R x1 + t in normalized coordinates."""
    R = euler_to_rotation(jnp.array([0.03, -0.05, 0.01]))
    t = jnp.array([0.3, -0.1, 0.9])
    t = t / jnp.linalg.norm(t)
    X1 = jnp.asarray(np.stack([
        rng.uniform(-5, 5, n), rng.uniform(-2, 2, n), rng.uniform(4, 30, n),
    ], axis=-1))
    X2 = X1 @ R.T + t
    x1 = X1[:, :2] / X1[:, 2:]
    x2 = X2[:, :2] / X2[:, 2:]
    if noise:
        x1 = x1 + noise * jnp.asarray(rng.normal(size=x1.shape))
        x2 = x2 + noise * jnp.asarray(rng.normal(size=x2.shape))
    return x1, x2, R, t


def essential_from_Rt(R, t):
    tx = jnp.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    return tx @ R


def test_normalize_points():
    K = jnp.array([[700.0, 0, 600], [0, 650, 180], [0, 0, 1]])
    x = jnp.array([[600.0, 180.0], [1300.0, 830.0]])
    xn = normalize_points(x, K)
    np.testing.assert_allclose(xn, jnp.array([[0.0, 0.0], [1.0, 1.0]]),
                               atol=1e-6)


def test_eight_point_recovers_E(rng):
    x1, x2, R, t = make_mono_problem(rng, n=60)
    E = eight_point_E(x1, x2)
    E_true = essential_from_Rt(R, t)
    s = sampson_distance(E, x1, x2)
    np.testing.assert_allclose(np.asarray(s), 0.0, atol=1e-9)
    # up to scale/sign
    En = E / jnp.linalg.norm(E)
    Etn = E_true / jnp.linalg.norm(E_true)
    err = min(float(jnp.max(jnp.abs(En - Etn))),
              float(jnp.max(jnp.abs(En + Etn))))
    assert err < 1e-4


def test_decompose_and_recover(rng):
    x1, x2, R, t = make_mono_problem(rng, n=80)
    E = essential_from_Rt(R, t)
    R_est, t_est, good, n_good = recover_pose(E, x1, x2)
    assert int(n_good) > 75
    np.testing.assert_allclose(R_est, R, atol=1e-4)
    np.testing.assert_allclose(t_est, t, atol=1e-4)


def test_ransac_essential_with_outliers(rng):
    x1, x2, R, t = make_mono_problem(rng, n=150, noise=1e-4)
    bad = jnp.asarray(rng.uniform(size=(150,)) < 0.3)
    x2c = jnp.where(bad[:, None],
                    x2 + jnp.asarray(rng.normal(size=x2.shape)) * 0.3, x2)
    res = ransac_essential(jax.random.PRNGKey(0), x1, x2c,
                           sampson_thresh=1e-6, num_hypotheses=256)
    assert bool(res.ok)
    # outliers rejected
    assert float(jnp.mean(bad[res.inliers].astype(jnp.float32))) < 0.05
    R_est, t_est, _, n_good = recover_pose(res.E, x1, x2c,
                                           valid=res.inliers)
    np.testing.assert_allclose(R_est, R, atol=0.01)
    np.testing.assert_allclose(t_est, t, atol=0.05)


def test_ransac_essential_respects_padding(rng):
    x1, x2, R, t = make_mono_problem(rng, n=64)
    x1p = jnp.concatenate([x1, jnp.full((64, 2), 77.0)])
    x2p = jnp.concatenate([x2, jnp.full((64, 2), -55.0)])
    valid = jnp.arange(128) < 64
    res = ransac_essential(jax.random.PRNGKey(1), x1p, x2p, valid=valid,
                           sampson_thresh=1e-7)
    assert bool(res.ok)
    assert not bool(jnp.any(res.inliers[64:]))


def test_undistort_points_zero_distortion_is_normalize():
    from libviso_tpu.geometry.essential import (
        normalize_points,
        undistort_points,
    )

    rng = np.random.default_rng(0)
    K = jnp.asarray([[700.0, 0, 600], [0, 700, 180], [0, 0, 1]])
    x = jnp.asarray(rng.uniform(0, [1200, 370], (50, 2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(undistort_points(x, K, None)),
        np.asarray(normalize_points(x, K)), rtol=1e-6)


def test_undistort_points_inverts_distortion():
    from libviso_tpu.geometry.essential import undistort_points

    rng = np.random.default_rng(1)
    K = jnp.asarray([[700.0, 0, 600], [0, 700, 180], [0, 0, 1]])
    D = jnp.asarray([-0.3, 0.1, 1e-3, -5e-4])
    k1, k2, p1, p2 = [float(v) for v in D]
    # forward-distort known normalized points, project to pixels
    u = rng.uniform(-0.4, 0.4, (100, 2))
    r2 = np.sum(u * u, axis=-1, keepdims=True)
    radial = 1 + k1 * r2 + k2 * r2 * r2
    ux, uy = u[:, 0:1], u[:, 1:2]
    tang = np.concatenate(
        [2 * p1 * ux * uy + p2 * (r2 + 2 * ux * ux),
         p1 * (r2 + 2 * uy * uy) + 2 * p2 * ux * uy], axis=1)
    xd = u * radial + tang
    pix = xd * [700, 700] + [600, 180]
    got = np.asarray(undistort_points(jnp.asarray(pix, jnp.float32), K, D,
                                      iters=8))
    np.testing.assert_allclose(got, u, atol=2e-4)


import pytest as _pytest


@_pytest.mark.slow
def test_magsac_scoring_beats_msac_on_rich_mono_regime():
    """r5 estimator round (VERDICT r4 #5): sigma-marginalized scoring +
    soft chi^2 refit weights cut the default mono path's overall median
    sim3 ATE 37% over 25 paired (regime, seed) rows
    (benchmarks/mono_estimator_battery_r5.jsonl).  Pins the clearest
    pair (rich regime, seed 3: 0.0556 -> 0.0194, a 2.9x improvement)
    plus a no-harm bound on a near-tied pair (seed 11)."""
    import pytest

    pytest.importorskip("scipy")
    from libviso_tpu.config import MonoConfig
    from libviso_tpu.pipeline.mono import run_mono_sequence
    from libviso_tpu.synthetic import generate_sequence
    from libviso_tpu.utils.metrics import ate_rmse

    K = np.array([[360.0, 0.0, 208.0], [0.0, 360.0, 80.0],
                  [0.0, 0.0, 1.0]])
    T = 8
    speeds = np.array([0.0, 0.8, 0.5, 1.1, 0.7, 1.2, 0.6, 1.0])
    traj = np.zeros((T, 6))
    traj[:, 5] = speeds
    traj[1:, 1] = 0.004
    out = {}
    for seed in (3, 11):
        seq = generate_sequence(num_frames=T, num_points=1200, seed=seed,
                                width=416, height=160, f=360.0,
                                trajectory=traj, subpixel_render=True,
                                pattern_smooth=1.0, patch=9)
        frames = [f[0] for f in seq.frames]
        for name, mono in (("msac", MonoConfig(scoring="msac",
                                               soft_refit=False)),
                           ("mag", MonoConfig(scoring="magsac",
                                              soft_refit=True))):
            res = run_mono_sequence(frames, K, seed=seed, mono=mono)
            assert res.frame_ok[1:].all(), (name, seed)
            out[(name, seed)] = float(ate_rmse(res.poses, seq.gt_poses,
                                               align="sim3"))
    # the measured 2.9x win, generous margin for draw shifts
    assert out[("mag", 3)] < out[("msac", 3)] * 0.7, out
    # no harm where the r4 estimator was already good
    assert out[("mag", 11)] < out[("msac", 11)] * 1.6 + 0.01, out
