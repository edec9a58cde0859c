"""Gauss-Newton + RANSAC solver oracle tests.

Ports the reference's disabled gold-standard test ``test_nl_rigid_motion``
(test/test.cpp:51-114): draw random 3D points, move the camera by a known
6-dof motion, project through real KITTI-style stereo calibration, and
require the solver to recover the motion from a zero initialization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libviso_tpu.config import Calib, RansacConfig
from libviso_tpu.solvers import (
    gauss_newton,
    ransac_pose,
    reprojection_errors_sq,
    residual_jacobian,
    stereo_predict,
)

# Calibration used by the reference's active test (test/test.cpp:158-161).
CALIB = Calib(f=645.24, cu=635.96, cv=194.13, base=0.5707)


def make_problem(rng, n=200, tr=None, pixel_noise=0.0, outlier_frac=0.0):
    """Known-motion synthetic stereo problem."""
    if tr is None:
        tr = jnp.array([0.01, -0.02, 0.005, 0.05, -0.03, 0.9])
    X = jnp.asarray(np.stack([
        rng.uniform(-10, 10, n),
        rng.uniform(-3, 3, n),
        rng.uniform(5, 50, n),
    ], axis=-1))
    observe, _ = stereo_predict(tr, X, CALIB)
    if pixel_noise:
        observe = observe + pixel_noise * jnp.asarray(
            rng.normal(size=observe.shape))
    if outlier_frac:
        bad = jnp.asarray(rng.uniform(size=(n,)) < outlier_frac)
        observe = jnp.where(bad[:, None],
                            observe + jnp.asarray(rng.normal(size=observe.shape)) * 50.0,
                            observe)
    return X, observe, tr


def test_jacobian_matches_autodiff(rng):
    X, observe, tr = make_problem(rng, n=16)
    _, J, _ = residual_jacobian(tr, X, observe, CALIB)

    def weighted_pred(t):
        r, _, _ = residual_jacobian(t, X, observe, CALIB)
        return r

    # residual = w * (observe - predict)  =>  d(residual)/dtr = -w*dpredict = -J...
    # J in the code is +w*dpredict/dtr, so d(residual)/dtr == -J.
    Jauto = jax.jacfwd(weighted_pred)(tr)  # (N, 4, 6)
    np.testing.assert_allclose(-Jauto, J, rtol=1e-3, atol=1e-4)


def test_gauss_newton_recovers_known_motion(rng):
    # Reference oracle: test/test.cpp:51-114 asserts recovery within 1e-4.
    X, observe, tr_true = make_problem(rng, n=100)
    w = jnp.ones(X.shape[0])
    res = gauss_newton(X, observe, w, jnp.zeros(6), CALIB)
    assert bool(res.converged)
    np.testing.assert_allclose(res.tr, tr_true, atol=2e-4)


def test_gauss_newton_minimal_sample(rng):
    X, observe, tr_true = make_problem(rng, n=3)
    res = gauss_newton(X, observe, jnp.ones(3), jnp.zeros(6), CALIB)
    assert bool(res.converged)
    np.testing.assert_allclose(res.tr, tr_true, atol=1e-3)


def test_gauss_newton_masked_equals_subset(rng):
    X, observe, tr_true = make_problem(rng, n=50)
    mask = jnp.asarray(rng.uniform(size=(50,)) < 0.5).astype(X.dtype)
    # corrupt the masked-out points: must have zero influence
    observe_bad = jnp.where(mask[:, None] > 0, observe, observe + 1e3)
    res = gauss_newton(X, observe_bad, mask, jnp.zeros(6), CALIB)
    assert bool(res.converged)
    np.testing.assert_allclose(res.tr, tr_true, atol=1e-3)


def test_gauss_newton_vmapped_hypotheses(rng):
    X, observe, tr_true = make_problem(rng, n=30)
    H = 8
    Xb = jnp.broadcast_to(X, (H,) + X.shape)
    ob = jnp.broadcast_to(observe, (H,) + observe.shape)
    wb = jnp.ones((H, 30))
    tr0 = jnp.zeros((H, 6))
    res = gauss_newton(Xb, ob, wb, tr0, CALIB)
    assert res.tr.shape == (H, 6)
    assert bool(jnp.all(res.converged))
    np.testing.assert_allclose(res.tr, jnp.broadcast_to(tr_true, (H, 6)),
                               atol=1e-3)


def test_gauss_newton_fails_on_degenerate(rng):
    # All points identical -> singular normal equations -> converged=False.
    X = jnp.ones((10, 3)) * jnp.array([1.0, 1.0, 10.0])
    observe, _ = stereo_predict(jnp.zeros(6), X, CALIB)
    res = gauss_newton(X, observe, jnp.ones(10), jnp.zeros(6), CALIB)
    assert not bool(res.converged)


@pytest.mark.slow
def test_ransac_pose_clean(rng):
    X, observe, tr_true = make_problem(rng, n=150)
    valid = jnp.ones(150, dtype=bool)
    out = ransac_pose(jax.random.PRNGKey(0), X, observe, valid, CALIB)
    assert bool(out.ok)
    assert int(out.num_inliers) > 140
    np.testing.assert_allclose(out.tr, tr_true, atol=1e-3)


@pytest.mark.slow
def test_ransac_pose_with_outliers_and_padding(rng):
    n_real, n_pad = 120, 40
    X, observe, tr_true = make_problem(rng, n=n_real, pixel_noise=0.3,
                                       outlier_frac=0.3)
    Xp = jnp.concatenate([X, jnp.full((n_pad, 3), 1e6, X.dtype)])
    op = jnp.concatenate([observe, jnp.zeros((n_pad, 4), observe.dtype)])
    valid = jnp.arange(n_real + n_pad) < n_real
    out = ransac_pose(jax.random.PRNGKey(1), Xp, op, valid, CALIB,
                      RansacConfig(num_hypotheses=128))
    assert bool(out.ok)
    assert not bool(jnp.any(out.inliers[n_real:]))
    np.testing.assert_allclose(out.tr, tr_true, atol=0.01)


def test_ransac_pose_fails_gracefully(rng):
    # Too few valid points for a 6-point support -> ok must be False.
    X, observe, _ = make_problem(rng, n=4)
    Xp = jnp.concatenate([X, jnp.zeros((60, 3))])
    op = jnp.concatenate([observe, jnp.zeros((60, 4))])
    valid = jnp.arange(64) < 4
    out = ransac_pose(jax.random.PRNGKey(2), Xp, op, valid, CALIB)
    assert not bool(out.ok)


def test_reprojection_error_zero_at_truth(rng):
    X, observe, tr_true = make_problem(rng, n=40)
    err2 = reprojection_errors_sq(tr_true, X, observe, CALIB)
    np.testing.assert_allclose(err2, 0.0, atol=1e-4)


def test_ransac_pose_procrustes_hypotheses(rng):
    """Closed-form Kabsch hypothesis mode (RansacConfig.hypothesis_method)
    recovers the same pose as the reference-style GN fit: the polish +
    identical inlier refit converge to the same optimum."""
    X, observe, tr_true = make_problem(rng, n=150, pixel_noise=0.3,
                                       outlier_frac=0.25)
    valid = jnp.ones(150, dtype=bool)
    key = jax.random.PRNGKey(3)
    gn = ransac_pose(key, X, observe, valid, CALIB,
                     RansacConfig(num_hypotheses=64))
    pro = ransac_pose(key, X, observe, valid, CALIB,
                      RansacConfig(num_hypotheses=64,
                                   hypothesis_method="procrustes"))
    assert bool(pro.ok)
    np.testing.assert_allclose(pro.tr, tr_true, atol=0.01)
    np.testing.assert_allclose(pro.tr, gn.tr, atol=1e-3)
