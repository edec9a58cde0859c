"""Robustness battery over the synthetic imaging model (VERDICT r1 #2).

The reference's operating domain is real KITTI imagery
(src/kitti.cpp:79-118) with exposure variation, sensor noise, optical
blur, and dynamic objects; no real dataset ships in this container, so
`synthetic.Imaging` models those effects over the geometry-true renderer
and this battery pins pass/fail accuracy bounds per perturbation regime.

Bounds are calibrated from the measured sweep (benchmarks/realism_sweep.py,
docs/realism.md): clean median ATE ~0.038 m with max ~0.06 over seeds;
every perturbation regime stays in the same 0.03-0.07 band except
repetitive texture (~0.11-0.12).  Bounds below allow ~2x headroom over
the measured MAX so they catch regressions, not seed noise.

All regimes share one image/slot geometry: one compile serves the whole
battery.
"""

import numpy as np
import pytest

from libviso_tpu.config import DetectorConfig, PipelineConfig, RansacConfig
from libviso_tpu.pipeline.stereo import run_stereo_sequence
from libviso_tpu.synthetic import Imaging, generate_sequence
from libviso_tpu.utils.metrics import ate_rmse

SHAPE = dict(width=620, height=188, num_frames=8, num_points=400,
             patch=9, subpixel_render=True, pattern_smooth=1.0)

CFG = PipelineConfig(
    detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                            num_slots=512, subpixel=True),
    ransac=RansacConfig(num_hypotheses=32),
)

# regime -> (generate_sequence overrides, ATE bound [m])
REGIMES = {
    "clean": ({}, 0.12),
    "noise3": (dict(imaging=Imaging(noise_sigma=3.0)), 0.14),
    "noise6": (dict(imaging=Imaging(noise_sigma=6.0)), 0.14),
    "exposure": (dict(imaging=Imaging(exposure_drift=0.10,
                                      lr_gain_mismatch=0.05)), 0.12),
    "bias": (dict(imaging=Imaging(bias_drift=4.0)), 0.12),
    "blur1": (dict(imaging=Imaging(blur_sigma=1.0)), 0.14),
    "occluders4": (dict(imaging=Imaging(num_occluders=4)), 0.14),
    "repetitive": (dict(num_patterns=16), 0.25),
    "quantized": (dict(imaging=Imaging(quantize=True, noise_sigma=2.0)),
                  0.12),
    "hard": (dict(imaging=Imaging(exposure_drift=0.08,
                                  lr_gain_mismatch=0.04, noise_sigma=3.0,
                                  blur_sigma=0.7, num_occluders=3,
                                  quantize=True)), 0.15),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", list(REGIMES))
def test_perturbation_regime_within_bounds(name):
    kw, bound = REGIMES[name]
    worst = 0.0
    for seed in (100, 101):
        seq = generate_sequence(seed=seed, **SHAPE, **kw)
        res = run_stereo_sequence(seq.frames, seq.P1, seq.P2, CFG,
                                  seed=seed)
        assert res.frame_ok[1:].all(), (name, seed,
                                        np.where(~res.frame_ok[1:]))
        worst = max(worst, ate_rmse(res.poses, seq.gt_poses))
    assert worst < bound, (name, worst, bound)


def test_imaging_does_not_touch_geometry():
    """Perturbations must not disturb the scene RNG: identical seeds give
    bit-identical ground truth (and identical frames when imaging=None)."""
    a = generate_sequence(num_frames=3, num_points=80, seed=5,
                          width=256, height=128)
    b = generate_sequence(num_frames=3, num_points=80, seed=5,
                          width=256, height=128,
                          imaging=Imaging(noise_sigma=4.0,
                                          num_occluders=2))
    np.testing.assert_array_equal(a.gt_poses, b.gt_poses)
    for pa, pb in zip(a.gt_projections, b.gt_projections):
        np.testing.assert_array_equal(pa, pb)
    c = generate_sequence(num_frames=3, num_points=80, seed=5,
                          width=256, height=128)
    for fa, fc in zip(a.frames, c.frames):
        np.testing.assert_array_equal(fa[0], fc[0])
        np.testing.assert_array_equal(fa[1], fc[1])


def test_occluders_paint_both_views():
    img = Imaging(num_occluders=3, occluder_size=20)
    a = generate_sequence(num_frames=2, num_points=80, seed=5,
                          width=256, height=128)
    b = generate_sequence(num_frames=2, num_points=80, seed=5,
                          width=256, height=128, imaging=img)
    assert not np.array_equal(a.frames[0][0], b.frames[0][0])
    assert not np.array_equal(a.frames[0][1], b.frames[0][1])
    # occluders MOVE between frames: the frame-to-frame difference of the
    # perturbed sequence differs from the clean one's
    d_clean = a.frames[1][0] - a.frames[0][0]
    d_pert = b.frames[1][0] - b.frames[0][0]
    assert not np.array_equal(d_clean, d_pert)


@pytest.mark.slow
def test_sharpness_health_signal_trips_on_defocus():
    """The per-frame `sharpness` stat (mean Harris response over detected
    corners, pipeline/stereo.py::FrameOutput) must catch the one measured
    silent-failure regime: heavy defocus biases corner localization
    CONSISTENTLY, so the solver's ok/rms consistency checks stay green
    while the trajectory walks off (docs/realism.md "Breaking points":
    blur sigma=3 -> meters of ATE, frames still ok).

    Measured (seed 100, this config): clean mean sharpness 0.80,
    noise sigma=6 -> 0.81 (UNCHANGED: the alarm is blur-specific, sensor
    noise must not fake it), blur sigma=3 -> 0.0023 (~350x collapse).
    Bounds leave ~2x headroom over those measurements."""
    out = {}
    for name, img in [("clean", None),
                      ("blur3", Imaging(blur_sigma=3.0)),
                      ("noise6", Imaging(noise_sigma=6.0))]:
        seq = generate_sequence(seed=100, **SHAPE, imaging=img)
        res = run_stereo_sequence(seq.frames, seq.P1, seq.P2, CFG, seed=100)
        sharp = np.mean([s["sharpness"] for s in res.stats])
        out[name] = (sharp, ate_rmse(res.poses, seq.gt_poses),
                     int(res.frame_ok[1:].sum()), len(res.frame_ok) - 1)

    clean, blur3, noise6 = out["clean"], out["blur3"], out["noise6"]
    # the dangerous regime: trajectory is wrong, flags mostly green...
    assert blur3[1] > 0.3, blur3
    assert blur3[2] >= blur3[3] - 1, blur3
    # ...and sharpness is the observable that trips (>50x collapse)
    assert blur3[0] < 0.02 * clean[0], (blur3[0], clean[0])
    # sensor noise must NOT trip the blur alarm
    assert 0.75 * clean[0] < noise6[0] < 1.25 * clean[0], (noise6[0],
                                                           clean[0])


@pytest.mark.slow
@pytest.mark.parametrize("name", ["f+2%", "cu+3px", "base+2%", "base+10%"])
def test_miscalibration_sensitivity(name):
    """Robustness to calibration error (real rigs drift): measured —
    focal/principal-point errors barely move the trajectory (stereo
    depth and motion both scale consistently), while a baseline error
    scales translation nearly 1:1 (10% baseline -> ~0.28 m ATE on this
    sequence, ~5x the true-calib level).  Every case must keep SOLVING
    every frame; the accuracy bounds pin the measured degradation."""
    seq = generate_sequence(seed=100, **SHAPE)
    P1, P2 = seq.P1.copy(), seq.P2.copy()
    if name == "f+2%":
        for P in (P1, P2):
            P[0, 0] *= 1.02
            P[1, 1] *= 1.02
        bound = 0.12
    elif name == "cu+3px":
        P1[0, 2] += 3.0
        P2[0, 2] += 3.0
        bound = 0.13
    elif name == "base+2%":
        P2[0, 3] *= 1.02
        bound = 0.12
    else:  # base+10%: translation scale error ~10% of path length
        P2[0, 3] *= 1.10
        bound = 0.5
    res = run_stereo_sequence(seq.frames, P1, P2, CFG, seed=0)
    assert res.frame_ok[1:].all(), name
    assert ate_rmse(res.poses, seq.gt_poses) < bound, name


def test_sharpen_recovers_defocus_regime():
    """The --sharpen preconditioner must restore the silent heavy-blur
    failure: blur sigma=3 walks to ~0.6 m ATE with flags green
    (test_sharpness_health_signal_trips_on_defocus); with the in-graph
    unsharp mask (sigma=3, amount=4) the measured recovery is ~0.08 m
    with every frame solving.  Bound leaves ~2.5x headroom."""
    import dataclasses

    seq = generate_sequence(seed=100, **SHAPE,
                            imaging=Imaging(blur_sigma=3.0))
    cfg = dataclasses.replace(
        CFG, detector=dataclasses.replace(CFG.detector, sharpen_sigma=3.0,
                                          sharpen_amount=4.0))
    res = run_stereo_sequence(seq.frames, seq.P1, seq.P2, cfg, seed=100)
    assert res.frame_ok[1:].all()
    assert ate_rmse(res.poses, seq.gt_poses) < 0.2


def test_blur_metric_scene_and_noise_independent():
    """blur_metric must separate defocus from everything else: measured
    ~0.37 on sharp frames regardless of texture smoothness AND of sensor
    noise up to sigma 12 (sigma-1 pre-smoothing cancels the noise floor),
    vs ~0.19-0.24 under blur sigma 2-3 even when noisy.  The default
    sharpen_trigger=0.28 sits in the measured gap."""
    from libviso_tpu.ops.features import blur_metric

    def m(img_model, smooth=1.0):
        seq = generate_sequence(seed=100, width=620, height=188,
                                num_frames=2, num_points=400, patch=9,
                                subpixel_render=True,
                                pattern_smooth=smooth, imaging=img_model)
        return float(blur_metric(np.asarray(seq.frames[1][0],
                                            np.float32)))

    for smooth in (0.5, 2.0):
        assert m(None, smooth) > 0.32, smooth
    assert m(Imaging(noise_sigma=12.0)) > 0.32
    assert m(Imaging(blur_sigma=2.0)) < 0.28
    assert m(Imaging(blur_sigma=3.0)) < 0.25
    assert m(Imaging(blur_sigma=3.0, noise_sigma=12.0)) < 0.25


@pytest.mark.slow
def test_sharpen_auto_noop_on_sharp_and_recovers_defocus():
    """sharpen_auto must be a bit-exact no-op on sharp frames (the
    select picks the raw image) and must still recover the silent
    defocus regime when frames measure blurred."""
    import dataclasses

    auto = dataclasses.replace(
        CFG, detector=dataclasses.replace(
            CFG.detector, sharpen_sigma=3.0, sharpen_amount=4.0,
            sharpen_auto=True))

    seq = generate_sequence(seed=100, **SHAPE)
    base = run_stereo_sequence(seq.frames, seq.P1, seq.P2, CFG, seed=100)
    res = run_stereo_sequence(seq.frames, seq.P1, seq.P2, auto, seed=100)
    np.testing.assert_array_equal(res.motions, base.motions)
    np.testing.assert_array_equal(res.frame_ok, base.frame_ok)

    blurred = generate_sequence(seed=100, **SHAPE,
                                imaging=Imaging(blur_sigma=3.0))
    res = run_stereo_sequence(blurred.frames, blurred.P1, blurred.P2,
                              auto, seed=100)
    assert res.frame_ok[1:].all()
    assert ate_rmse(res.poses, blurred.gt_poses) < 0.2


def _black(frames, idxs):
    out = list(frames)
    for i in idxs:
        out[i] = (np.zeros_like(frames[i][0]), np.zeros_like(frames[i][1]))
    return out


@pytest.mark.slow
def test_keep_on_failure_recovers_dropout():
    """Transient-dropout recovery (cfg.keep_features_on_failure): one
    black frame costs TWO motions without it (the bad frame fails, then
    the next frame matches against the bad frame's features); holding
    the last good state recovers the spanning motion.  Measured: ATE
    1.11 -> 0.29 m, failures 2 -> 1 (bounds with ~1.5x headroom).
    On clean sequences the flag must be a bit-exact no-op."""
    import dataclasses

    keep = dataclasses.replace(CFG, keep_features_on_failure=True)
    sh = dict(SHAPE)
    sh["num_frames"] = 10
    seq = generate_sequence(seed=100, **sh)

    base_clean = run_stereo_sequence(seq.frames, seq.P1, seq.P2, CFG,
                                     seed=100)
    keep_clean = run_stereo_sequence(seq.frames, seq.P1, seq.P2, keep,
                                     seed=100)
    np.testing.assert_array_equal(keep_clean.motions, base_clean.motions)
    np.testing.assert_array_equal(keep_clean.frame_ok, base_clean.frame_ok)

    bad = _black(seq.frames, [5])
    base = run_stereo_sequence(bad, seq.P1, seq.P2, CFG, seed=100)
    rec = run_stereo_sequence(bad, seq.P1, seq.P2, keep, seed=100)
    assert (~base.frame_ok[1:]).sum() >= 2
    assert (~rec.frame_ok[1:]).sum() == 1
    assert ate_rmse(rec.poses, seq.gt_poses) < 0.45
    assert ate_rmse(rec.poses, seq.gt_poses) < ate_rmse(base.poses,
                                                        seq.gt_poses) / 2


@pytest.mark.slow
def test_keep_on_failure_age_cap_resyncs():
    """A dropout longer than max_keep_age must re-sync instead of
    pinning to stale features forever: after the black run ends, the
    engine solves again within two frames."""
    import dataclasses

    keep = dataclasses.replace(CFG, keep_features_on_failure=True,
                               max_keep_age=2)
    sh = dict(SHAPE)
    sh["num_frames"] = 12
    seq = generate_sequence(seed=100, **sh)
    bad = _black(seq.frames, [4, 5, 6, 7])
    rec = run_stereo_sequence(bad, seq.P1, seq.P2, keep, seed=100)
    # frames 10/11 (two past the dropout) must solve
    assert rec.frame_ok[10] and rec.frame_ok[11]


def test_keep_on_failure_rejected_by_parallel_drivers():
    import dataclasses

    import jax
    import pytest

    from libviso_tpu.config import Calib
    from libviso_tpu.geometry.mvg import F_from_P_host
    from libviso_tpu.pipeline.batched import build_batched_odometry

    keep = dataclasses.replace(CFG, keep_features_on_failure=True)
    seq = generate_sequence(seed=0, num_frames=2, num_points=50,
                            width=256, height=96)
    calib = Calib.from_projections(seq.P1, seq.P2)
    F = F_from_P_host(seq.P1, seq.P2)
    with pytest.raises(ValueError, match="streaming"):
        build_batched_odometry(calib, F, keep)

    from jax.sharding import Mesh

    from libviso_tpu.parallel.pp_odometry import build_pipelined_program

    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    with pytest.raises(ValueError, match="streaming"):
        build_pipelined_program(calib, F, keep, mesh)


@pytest.mark.slow
def test_sharpen_auto_never_misfires_and_recovers_noisy_blur():
    """Safe-to-leave-on evidence: across representative non-defocus
    regimes auto-sharpen must be bit-identical to baseline (the trigger
    never fires), and it must also recover MODERATE noise on blur
    (measured: blur2+noise3 ATE 0.219 -> 0.076)."""
    import dataclasses

    auto = dataclasses.replace(CFG, detector=dataclasses.replace(
        CFG.detector, sharpen_sigma=3.0, sharpen_auto=True))
    for kw in ({}, dict(imaging=Imaging(noise_sigma=6.0)),
               dict(num_patterns=16),
               dict(imaging=Imaging(exposure_drift=0.10,
                                    lr_gain_mismatch=0.05))):
        seq = generate_sequence(seed=100, **SHAPE, **kw)
        base = run_stereo_sequence(seq.frames, seq.P1, seq.P2, CFG,
                                   seed=100)
        res = run_stereo_sequence(seq.frames, seq.P1, seq.P2, auto,
                                  seed=100)
        np.testing.assert_array_equal(res.motions, base.motions)

    seq = generate_sequence(seed=100, **SHAPE,
                            imaging=Imaging(blur_sigma=2.0,
                                            noise_sigma=3.0))
    base = run_stereo_sequence(seq.frames, seq.P1, seq.P2, CFG, seed=100)
    res = run_stereo_sequence(seq.frames, seq.P1, seq.P2, auto, seed=100)
    assert res.frame_ok[1:].all()
    assert ate_rmse(res.poses, seq.gt_poses) < 0.15
    assert ate_rmse(res.poses, seq.gt_poses) < 0.6 * ate_rmse(
        base.poses, seq.gt_poses)
