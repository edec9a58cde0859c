"""Photographic texture classes (VERDICT r4 #3; synthetic_world.py).

Pins the statistical contract (1/f^beta spectra in the natural-image
range) and the measured engine envelope per class
(docs/realism.md "Photographic texture classes").
"""

import numpy as np
import pytest

from libviso_tpu.synthetic_world import (
    _pink_noise,
    make_brick_texture,
    make_foliage_texture,
    make_glass_texture,
)


def _spectrum_slope(img):
    img = np.asarray(img, np.float64)
    img = img - img.mean()
    F = np.abs(np.fft.rfft2(img)) ** 2
    fy = np.fft.fftfreq(img.shape[0])[:, None]
    fx = np.fft.rfftfreq(img.shape[1])[None, :]
    f = np.sqrt(fy * fy + fx * fx).ravel()
    P = F.ravel()
    m = (f > 0.01) & (f < 0.4)
    A = np.vstack([np.log(f[m]), np.ones(int(m.sum()))]).T
    return float(np.linalg.lstsq(A, np.log(P[m] + 1e-12), rcond=None)[0][0])


def test_pink_noise_spectrum_matches_beta():
    rng = np.random.default_rng(0)
    for beta in (1.5, 2.0, 2.5):
        t = _pink_noise(rng, 256, 256, beta=beta, amp=20.0)
        slope = _spectrum_slope(t)
        assert abs(slope + beta) < 0.25, (beta, slope)
        assert abs(t.std() - 20.0) < 0.5


def test_texture_classes_in_natural_image_range():
    """Photographs have power-spectrum slopes ~ -1.5 to -3; the r3
    facade measured -3.9 (band-limited — the gap this round closes)."""
    rng = np.random.default_rng(1)
    for fn in (make_brick_texture, make_foliage_texture,
               make_glass_texture):
        t = fn(rng, 256, 256)
        slope = _spectrum_slope(t)
        assert -3.0 < slope < -1.4, (fn.__name__, slope)
        assert t.dtype == np.float32
        assert 4.0 <= t.min() and t.max() <= 251.0


def test_glass_is_texture_starved_vs_brick():
    """The class contract: glass panels carry far less corner energy
    than brick (its budget lives on the sparse mullion grid)."""
    from scipy.ndimage import sobel

    rng = np.random.default_rng(2)
    g = make_glass_texture(rng, 256, 256)
    b = make_brick_texture(rng, 256, 256)
    # interior gradient energy, excluding the top-decile (grid lines)
    def interior_grad(t):
        e = np.abs(sobel(t.astype(np.float64), axis=1))
        return np.mean(e[e < np.quantile(e, 0.9)])

    assert interior_grad(g) < 0.5 * interior_grad(b)


@pytest.mark.slow
def test_glass_world_trips_support_alarm_and_nms_defends():
    """End-to-end on the starved class (docs/realism.md r5 table):
    the support-ratio alarm fires while every frame reports ok, and
    nms_radius=2 (+subpixel) recovers most of the ATE."""
    import dataclasses

    import jax

    from libviso_tpu.config import (
        DetectorConfig,
        PipelineConfig,
        RansacConfig,
    )
    from libviso_tpu.pipeline.stereo import run_stereo_sequence
    from libviso_tpu.synthetic_world import generate_world_sequence
    from libviso_tpu.utils.metrics import ate_rmse, health_summary

    det = dict(max_features=480, nbinx=12, nbiny=4, num_slots=512)
    cfg = PipelineConfig(detector=DetectorConfig(**det),
                         ransac=RansacConfig(num_hypotheses=32))
    seq = generate_world_sequence(seed=2, wall_texture="glass",
                                  width=416, height=160, num_frames=12)
    res = run_stereo_sequence(seq.frames, seq.P1, seq.P2, cfg, seed=2)
    h = health_summary(res.stats, res.frame_ok)
    assert h["failed_frames"] == 0          # silent...
    assert "support_ratio" in h["alarms"]   # ...but alarmed
    ate = float(ate_rmse(res.poses, seq.gt_poses))

    cfg_d = PipelineConfig(
        detector=DetectorConfig(**det, nms_radius=2, subpixel=True),
        ransac=RansacConfig(num_hypotheses=32))
    res_d = run_stereo_sequence(seq.frames, seq.P1, seq.P2, cfg_d, seed=2)
    ate_d = float(ate_rmse(res_d.poses, seq.gt_poses))
    assert ate_d < ate  # measured: 0.644 -> 0.557 on this seed; other
    #                     seeds recover 3-10x (docs/realism.md)


@pytest.mark.slow
def test_loop_verification_rejects_brick_aliases():
    """Loop closure on a brick-walled plaza — the repetitive-lattice
    worst case for appearance aliasing (docs/realism.md r5: 8 runs
    across texture classes produced ZERO false edges).  Pins the brick
    case: the circuit closes through a geometrically TRUE edge."""
    import jax

    from libviso_tpu.config import (
        DetectorConfig,
        PipelineConfig,
        RansacConfig,
    )
    from libviso_tpu.pipeline.loop import run_with_loop_closure
    from libviso_tpu.synthetic import _pose_matrix_np
    from libviso_tpu.synthetic_world import generate_plaza_sequence

    cfg = PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                                num_slots=512),
        ransac=RansacConfig(num_hypotheses=32))
    seq = generate_plaza_sequence(num_frames=41, seed=0,
                                  wall_texture="brick")
    res = run_with_loop_closure(list(seq.frames), seq.P1, seq.P2,
                                cfg=cfg, keyframe_every=4, min_gap=20,
                                min_matches=60, min_inliers=30, seed=0)
    assert len(res.loops) >= 1
    gt = seq.gt_poses
    for le in res.loops:
        T_true = np.linalg.inv(gt[le.frame_new]) @ gt[le.frame_old]
        T_est = _pose_matrix_np(le.tr)
        assert np.linalg.norm(T_est[:3, 3] - T_true[:3, 3]) < 0.2, \
            (le.frame_new, le.frame_old)
    # and the closure actually lands the endpoint
    ep_vo = np.linalg.norm(res.poses_vo[-1, :3, 3] - gt[-1, :3, 3])
    ep = np.linalg.norm(res.poses[-1, :3, 3] - gt[-1, :3, 3])
    assert ep < 0.2 * ep_vo, (ep_vo, ep)
