"""Trajectory-metric tests: ATE alignment modes (VERDICT r1 #9).

The reference never evaluates trajectories in-repo (src/kitti.cpp:49-64
defers to the external devkit); `utils/metrics.py` provides ATE/RPE, and
these tests pin the optional Horn/Umeyama SE(3)/Sim(3) alignment used for
devkit-comparable numbers on real data.
"""

import numpy as np
import pytest

from libviso_tpu.utils.metrics import (
    align_trajectory,
    ate_rmse,
    rpe_errors,
)


def _traj(T=40, seed=0):
    """A smooth synthetic trajectory of (T, 4, 4) poses."""
    rng = np.random.default_rng(seed)
    poses = np.tile(np.eye(4), (T, 1, 1))
    pos = np.cumsum(
        np.stack([0.05 * np.sin(np.arange(T) / 5.0),
                  0.01 * rng.standard_normal(T),
                  0.8 + 0.05 * np.cos(np.arange(T) / 7.0)], axis=-1),
        axis=0)
    poses[:, :3, 3] = pos
    return poses


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.cross(np.eye(3), axis)
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def test_ate_identity():
    p = _traj()
    assert ate_rmse(p, p) == 0.0
    assert ate_rmse(p, p, align="se3") == pytest.approx(0.0, abs=1e-12)


def test_se3_alignment_removes_rigid_offset():
    gt = _traj()
    R = _rot([0.2, 1.0, 0.1], 0.7)
    t = np.array([3.0, -1.0, 5.0])
    est = gt.copy()
    est[:, :3, 3] = gt[:, :3, 3] @ R.T + t
    # raw ATE sees the full offset; aligned ATE is ~0
    assert ate_rmse(est, gt) > 1.0
    assert ate_rmse(est, gt, align="se3") < 1e-9


def test_sim3_alignment_removes_scale():
    gt = _traj()
    est = gt.copy()
    est[:, :3, 3] = 0.37 * gt[:, :3, 3]  # mono-style global scale error
    assert ate_rmse(est, gt, align="se3") > 0.1   # rigid cannot fix scale
    assert ate_rmse(est, gt, align="sim3") < 1e-9


def test_sim3_recovers_parameters():
    gt = _traj(seed=3)
    R = _rot([0, 1, 0], -1.2)
    s, t = 2.5, np.array([1.0, 2.0, 3.0])
    est_t = gt[:, :3, 3].copy()
    gt_t = s * est_t @ R.T + t
    s_hat, R_hat, t_hat = align_trajectory(est_t, gt_t, with_scale=True)
    assert s_hat == pytest.approx(s, rel=1e-9)
    np.testing.assert_allclose(R_hat, R, atol=1e-9)
    np.testing.assert_allclose(t_hat, t, atol=1e-9)


def test_alignment_reflection_guard():
    """Degenerate/noisy clouds must still yield a proper rotation."""
    rng = np.random.default_rng(1)
    a = rng.standard_normal((10, 3))
    b = a.copy()
    b[:, 2] *= -1  # a reflection, not achievable by rotation
    _, R, _ = align_trajectory(a, b)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-9)


def test_align_rejects_unknown_mode():
    p = _traj(T=4)
    with pytest.raises(ValueError):
        ate_rmse(p, p, align="procrustes")


def test_rpe_invariant_to_global_transform():
    gt = _traj()
    R = _rot([1, 0, 0], 0.4)
    g = np.eye(4)
    g[:3, :3] = R
    g[:3, 3] = [10, 0, -3]
    est = np.einsum("ij,tjk->tik", g, gt)
    terr, rerr = rpe_errors(est, gt)
    assert terr.max() < 1e-9
    assert rerr.max() < 1e-9
