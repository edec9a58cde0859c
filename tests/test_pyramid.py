"""Multi-scale pyramid detection + subpixel refinement (BASELINE config 3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from libviso_tpu.config import DetectorConfig, PipelineConfig, RansacConfig
from libviso_tpu.ops.features import Keypoints, detect_and_describe
from libviso_tpu.ops.pyramid import (
    build_pyramid,
    detect_and_describe_multiscale,
    downsample2,
    subpixel_refine,
)
from libviso_tpu.pipeline import run_stereo_sequence
from libviso_tpu.synthetic import generate_sequence
from libviso_tpu.utils.metrics import ate_rmse


def test_downsample2():
    img = jnp.arange(16.0).reshape(4, 4)
    out = downsample2(img)
    np.testing.assert_allclose(out, jnp.array([[2.5, 4.5], [10.5, 12.5]]))


def test_pyramid_shapes(rng):
    img = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    pyr = build_pyramid(img, 3)
    assert [p.shape for p in pyr] == [(64, 96), (32, 48), (16, 24)]


def test_subpixel_refine_recovers_fractional_peak():
    # paraboloid with a known fractional maximum at (10.3, 7.6-ish)
    H, W = 16, 24
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    cx, cy = 10.3, 7.6
    resp = jnp.asarray(100.0 - (xx - cx) ** 2 - 0.5 * (yy - cy) ** 2
                       - 0.3 * (xx - cx) * (yy - cy))
    kp = Keypoints(xy=jnp.array([[10.0, 8.0]], jnp.float32),
                   response=jnp.ones(1), valid=jnp.ones(1, bool))
    refined = subpixel_refine(resp, kp)
    np.testing.assert_allclose(np.asarray(refined.xy[0]), [cx, cy],
                               atol=0.05)


def test_multiscale_detects_coarse_corners(rng):
    # one large checkerboard square only resolvable as a corner structure
    # at a coarser level, plus fine texture
    img = rng.normal(12, 2, size=(128, 192)).astype(np.float32)
    img[40:80, 60:120] = 220.0
    cfg = DetectorConfig(max_features=120, nbinx=6, nbiny=2, num_slots=256)
    kp, desc, scales = detect_and_describe_multiscale(
        jnp.asarray(img), cfg, levels=2, subpixel=False)
    assert kp.xy.shape == (256, 2)
    v = np.asarray(kp.valid)
    s = np.asarray(scales)
    assert (s[v] == 1).sum() > 0  # coarse level contributes corners
    # coarse-level coordinates map inside the image in level-0 pixels
    xy = np.asarray(kp.xy)[v & (s == 1)]
    assert (xy[:, 0] < 192).all() and (xy[:, 1] < 128).all()
    # descriptors of valid slots are populated
    assert np.abs(np.asarray(desc)[v]).sum() > 0


@pytest.mark.slow
def test_pipeline_with_subpixel_improves_on_fractional_scene():
    seq = generate_sequence(num_frames=8, num_points=500, seed=3,
                            width=416, height=160, speed=0.7,
                            subpixel_render=True)
    base_det = DetectorConfig(max_features=480, nbinx=8, nbiny=4,
                              num_slots=512)
    cfg_int = PipelineConfig(detector=base_det,
                             ransac=RansacConfig(num_hypotheses=32,
                                                 gn_iters=50))
    cfg_sub = PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=8, nbiny=4,
                                num_slots=512, subpixel=True),
        ransac=RansacConfig(num_hypotheses=32, gn_iters=50))
    res_int = run_stereo_sequence(seq.frames, seq.P1, seq.P2, cfg_int)
    res_sub = run_stereo_sequence(seq.frames, seq.P1, seq.P2, cfg_sub)
    assert res_sub.frame_ok[1:].all()
    ate_int = ate_rmse(res_int.poses, seq.gt_poses)
    ate_sub = ate_rmse(res_sub.poses, seq.gt_poses)
    # sub-pixel observations beat integer quantization on this scene
    assert ate_sub < ate_int, (ate_int, ate_sub)


def test_pipeline_with_pyramid_runs():
    seq = generate_sequence(num_frames=4, num_points=400, seed=9,
                            width=320, height=128, speed=0.5, f=280.0)
    cfg = PipelineConfig(
        detector=DetectorConfig(max_features=240, nbinx=6, nbiny=3,
                                num_slots=384, pyramid_levels=2,
                                subpixel=True),
        ransac=RansacConfig(num_hypotheses=32, gn_iters=50))
    res = run_stereo_sequence(seq.frames, seq.P1, seq.P2, cfg)
    assert res.frame_ok[1:].all(), res.stats
    assert ate_rmse(res.poses, seq.gt_poses) < 0.2


@pytest.mark.slow
def test_deep_pyramid_small_budgets_no_crash(rng):
    """Regression: levels >= 4 with the default 1280-slot budget used to
    raise (level-3 budget 85 < 120 bins forced max_features > num_slots)."""
    from libviso_tpu.config import DetectorConfig
    from libviso_tpu.ops.pyramid import detect_and_describe_multiscale

    img = jnp.asarray(rng.integers(0, 255, (376, 1241)), jnp.float32)
    cfg = DetectorConfig(pyramid_levels=4)
    kp, desc, scales = detect_and_describe_multiscale(img, cfg, levels=4)
    assert kp.xy.shape[0] == cfg.num_slots
    assert desc.shape[0] == cfg.num_slots
    assert bool(kp.valid.any())
    # all four levels represented among valid keypoints
    lv = np.asarray(scales)[np.asarray(kp.valid)]
    assert set(np.unique(lv)) >= {0, 1, 2, 3}


@pytest.mark.slow
def test_pyramid_tiny_slots_no_crash(rng):
    from libviso_tpu.config import DetectorConfig
    from libviso_tpu.ops.pyramid import detect_and_describe_multiscale

    img = jnp.asarray(rng.integers(0, 255, (96, 160)), jnp.float32)
    cfg = DetectorConfig(max_features=24, nbinx=6, nbiny=2, num_slots=32)
    kp, desc, scales = detect_and_describe_multiscale(img, cfg, levels=3)
    assert kp.xy.shape[0] == 32
