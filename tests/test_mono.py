"""End-to-end monocular pipeline on synthetic data (BASELINE config 2)."""

import dataclasses

import numpy as np
import pytest

from libviso_tpu.config import DetectorConfig, MatchConfig, PipelineConfig
from libviso_tpu.pipeline.mono import run_mono_sequence
from libviso_tpu.synthetic import generate_sequence


def mono_config():
    # radius large enough to track the synthetic inter-frame flow
    return PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=8, nbiny=4,
                                num_slots=512, descriptor_radius=5),
        temporal_match=MatchConfig(radius=60.0, use_ratio=True, ratio=0.9),
    )


@pytest.fixture(scope="module")
def mono_run():
    seq = generate_sequence(num_frames=8, num_points=600, seed=13,
                            width=416, height=160, speed=0.6,
                            yaw_rate=0.01)
    K = seq.P1[:, :3]
    result = run_mono_sequence([f[0] for f in seq.frames], K, mono_config(),
                               seed=0)
    return seq, result


def test_mono_solves_frames(mono_run):
    seq, result = mono_run
    assert result.frame_ok[1:].all(), result.stats


@pytest.mark.slow
def test_mono_scale_propagation_variable_speed():
    """VERDICT r1 #3: a variable-speed sequence must be recovered up to ONE
    global scale (<5% relative drift), not per-step unit norms."""
    T = 10
    speeds_gt = np.array([0.0, 0.8, 0.5, 1.1, 0.7, 1.2, 0.6, 1.0, 0.9,
                          1.15])
    traj = np.zeros((T, 6))
    traj[:, 5] = speeds_gt                       # forward steps, varying
    traj[1:, 1] = 0.004                          # gentle yaw
    # realistic rendering regime: band-limited texture at true subpixel
    # positions (real optics never snap image content to integer pixels)
    # and moderate landmark density — heavily overlapping stamps give
    # non-rigid corner drift that corrupts the scale evidence
    seq = generate_sequence(num_frames=T, num_points=400, seed=21,
                            width=620, height=188, patch=9,
                            subpixel_render=True, pattern_smooth=1.0,
                            trajectory=traj)
    K = seq.P1[:, :3]
    cfg = mono_config()
    cfg = dataclasses.replace(
        cfg, detector=dataclasses.replace(cfg.detector, subpixel=True))
    res = run_mono_sequence([f[0] for f in seq.frames], K, cfg, seed=0)
    assert res.frame_ok[1:].all(), res.stats
    # per-step translation norms vs ground truth, up to one global scale
    est = res.speeds[1:]
    gt = speeds_gt[1:]
    ratio = est / gt
    drift = np.abs(ratio / ratio[0] - 1.0)
    assert drift.max() < 0.05, (ratio, drift)
    # scale evidence must actually flow (not the constant-speed fallback)
    assert all(s["scale_support"] >= 12 for s in res.stats[2:]), res.stats


@pytest.mark.slow
def test_mono_scale_propagation_off_is_unit_norm():
    from libviso_tpu.config import MonoConfig

    seq = generate_sequence(num_frames=5, num_points=600, seed=13,
                            width=416, height=160, speed=0.6,
                            yaw_rate=0.01)
    K = seq.P1[:, :3]
    res = run_mono_sequence([f[0] for f in seq.frames], K, mono_config(),
                            seed=0,
                            mono=MonoConfig(scale_propagation=False))
    for k in range(1, 5):
        d = np.linalg.inv(res.poses[k - 1]) @ res.poses[k]
        assert np.linalg.norm(d[:3, 3]) == pytest.approx(1.0, abs=1e-5)


def test_mono_direction_accuracy(mono_run):
    # monocular VO is scale-ambiguous: compare per-step direction + rotation
    seq, result = mono_run
    for k in range(1, len(seq.gt_poses)):
        d_est = np.linalg.inv(result.poses[k - 1]) @ result.poses[k]
        d_gt = np.linalg.inv(seq.gt_poses[k - 1]) @ seq.gt_poses[k]
        t_est = d_est[:3, 3]
        t_gt = d_gt[:3, 3]
        cos = abs(t_est @ t_gt) / (np.linalg.norm(t_est)
                                   * np.linalg.norm(t_gt) + 1e-12)
        assert cos > 0.995, (k, cos)
        dR = d_est[:3, :3].T @ d_gt[:3, :3]
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.01, (k, ang)


@pytest.mark.slow
def test_mono_scale_propagation_under_sensor_noise():
    """Scale propagation must survive realistic sensor noise: measured
    drift 1.4-3.1% at sigma 2-4 DN on the variable-speed sequence (the
    three-view bundle's Tukey weighting absorbs the observation noise).
    Bound at 6% — above the measured worst, below anything a broken
    estimator produces (constant-speed fallback alone drifts 20%+ on
    this speed profile)."""
    from libviso_tpu.synthetic import Imaging

    T = 10
    speeds_gt = np.array([0.0, 0.8, 0.5, 1.1, 0.7, 1.2, 0.6, 1.0, 0.9,
                          1.15])
    traj = np.zeros((T, 6))
    traj[:, 5] = speeds_gt
    traj[1:, 1] = 0.004
    seq = generate_sequence(num_frames=T, num_points=400, seed=21,
                            width=620, height=188, patch=9,
                            subpixel_render=True, pattern_smooth=1.0,
                            trajectory=traj,
                            imaging=Imaging(noise_sigma=4.0))
    cfg = mono_config()
    cfg = dataclasses.replace(
        cfg, detector=dataclasses.replace(cfg.detector, subpixel=True))
    res = run_mono_sequence([f[0] for f in seq.frames], seq.P1[:, :3],
                            cfg, seed=0)
    assert res.frame_ok[1:].all(), res.stats
    ratio = res.speeds[1:] / speeds_gt[1:]
    assert np.abs(ratio / ratio[0] - 1.0).max() < 0.06, ratio


@pytest.mark.slow
def test_mono_keep_on_failure_recovers_dropout():
    """Mono dropout recovery (cfg.keep_features_on_failure): a black
    frame costs two steps without it; holding the last good state lets
    the next frame recover the SPANNING motion including its scale (the
    ratio estimator measures the held pair's translation directly).
    Measured: endpoint path length 8.88 vs the clean run's 8.86 (vs
    6.95 unrecovered); clean sequences are bit-exact."""
    seq = generate_sequence(num_frames=10, num_points=600, seed=13,
                            width=416, height=160, speed=0.6,
                            yaw_rate=0.01)
    K = seq.P1[:, :3]
    frames = [np.asarray(f[0]) for f in seq.frames]
    bad = list(frames)
    bad[5] = np.zeros_like(frames[5])
    cfg = mono_config()
    keep = dataclasses.replace(cfg, keep_features_on_failure=True)

    clean_base = run_mono_sequence(frames, K, cfg, seed=0)
    clean_keep = run_mono_sequence(frames, K, keep, seed=0)
    np.testing.assert_array_equal(
        np.stack([p for p in clean_keep.poses]),
        np.stack([p for p in clean_base.poses]))

    base = run_mono_sequence(bad, K, cfg, seed=0)
    rec = run_mono_sequence(bad, K, keep, seed=0)
    assert rec.frame_ok[1:].sum() == base.frame_ok[1:].sum() + 1
    ref_len = np.linalg.norm(clean_base.poses[-1][:3, 3])
    rec_len = np.linalg.norm(rec.poses[-1][:3, 3])
    base_len = np.linalg.norm(base.poses[-1][:3, 3])
    assert abs(rec_len - ref_len) < 0.05 * ref_len, (rec_len, ref_len)
    assert abs(base_len - ref_len) > 0.15 * ref_len  # the gap it closes


@pytest.mark.slow
def test_mono_recovery_span_scales_constant_velocity_fallback():
    """When the spanning recovery step has no usable scale evidence
    (scale propagation off here), the constant-velocity fallback must
    cover ALL bridged frames: the span-2 step counts two unit steps.
    Measured |endpoint| 8.990 vs clean 8.989 (a single-step fallback
    would under-advance to ~8.0)."""
    from libviso_tpu.config import MonoConfig

    seq = generate_sequence(num_frames=10, num_points=600, seed=13,
                            width=416, height=160, speed=0.6,
                            yaw_rate=0.01)
    K = seq.P1[:, :3]
    frames = [np.asarray(f[0]) for f in seq.frames]
    bad = list(frames)
    bad[5] = np.zeros_like(frames[5])
    keep = dataclasses.replace(mono_config(), keep_features_on_failure=True)
    noscale = MonoConfig(scale_propagation=False)

    clean = run_mono_sequence(frames, K, mono_config(), seed=0,
                              mono=noscale)
    rec = run_mono_sequence(bad, K, keep, seed=0, mono=noscale)
    assert [s["span"] for s in rec.stats].count(2) == 1
    ref_len = np.linalg.norm(clean.poses[-1][:3, 3])
    rec_len = np.linalg.norm(rec.poses[-1][:3, 3])
    assert abs(rec_len - ref_len) < 0.03 * ref_len, (rec_len, ref_len)


@pytest.mark.slow
def test_mono_first_pass_modes():
    """MonoConfig.first_pass (round 4): the 8-point gate pass is the
    measured fast mode (49.5 -> 70.4 fps), NOT the default — on
    feature-rich configs it is ATE-equivalent to the double-5pt
    default, but on this sparser 900-point config it measured up to
    ~4x worse (medians 0.094 vs 0.023 — the cheap gate's F admits
    worse re-matches when correspondences are thin), which is exactly
    why 'same' stays the default.  This pins the operational contract
    of BOTH modes: every frame solves and trajectories stay inside the
    absolute envelope observed across all measured configs."""
    import numpy as np

    from libviso_tpu.config import MonoConfig
    from libviso_tpu.pipeline.mono import run_mono_sequence
    from libviso_tpu.synthetic import generate_sequence
    from libviso_tpu.utils.metrics import ate_rmse

    K = np.array([[360.0, 0.0, 208.0], [0.0, 360.0, 80.0],
                  [0.0, 0.0, 1.0]])
    T = 8
    speeds = np.array([0.0, 0.8, 0.5, 1.1, 0.7, 1.2, 0.6, 1.0])
    ates = {"8pt": [], "same": []}
    for seed in (3, 11, 21):
        traj = np.zeros((T, 6))
        traj[:, 5] = speeds
        traj[1:, 1] = 0.004
        seq = generate_sequence(num_frames=T, num_points=900, seed=seed,
                                width=416, height=160, f=360.0,
                                trajectory=traj, subpixel_render=True,
                                pattern_smooth=1.0, patch=9)
        frames = [f[0] for f in seq.frames]
        for fp in ("8pt", "same"):
            res = run_mono_sequence(frames, K, seed=seed,
                                    mono=MonoConfig(first_pass=fp))
            assert res.frame_ok[1:].all(), (fp, seed)
            ates[fp].append(float(ate_rmse(res.poses, seq.gt_poses,
                                           align="sim3")))
    # default: the accuracy class the docs claim (measured 0.019-0.058)
    assert np.median(ates["same"]) < 0.10, ates
    # fast mode: degraded but bounded (measured 0.019-0.102)
    assert np.median(ates["8pt"]) < 0.20, ates
