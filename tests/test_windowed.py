"""Sequence-level sliding-window BA driver test (BASELINE config 4)."""

import dataclasses

import numpy as np
import pytest

from libviso_tpu.config import DetectorConfig, PipelineConfig, RansacConfig
from libviso_tpu.pipeline.windowed import run_windowed_ba
from libviso_tpu.synthetic import generate_sequence
from libviso_tpu.utils.metrics import ate_rmse


def tiny_config():
    return PipelineConfig(
        detector=DetectorConfig(max_features=240, nbinx=8, nbiny=3,
                                num_slots=256),
        ransac=RansacConfig(num_hypotheses=32),
    )


@pytest.mark.slow
def test_windowed_ba_sequence():
    seq = generate_sequence(num_frames=12, num_points=500, seed=31,
                            width=416, height=160, speed=0.6, f=360.0)
    cfg = PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=8, nbiny=4,
                                num_slots=512),
        ransac=RansacConfig(num_hypotheses=32, gn_iters=50),
    )
    # gate=False: this test pins the BA SOLVER's improvement on the
    # sprite oracle (fixed 3D landmarks).  The acceptance gate is
    # deliberately conservative — its frozen-X0 statistic cannot see
    # improvements mediated by landmark corrections, which is exactly
    # what sprite-oracle BA does — and is pinned separately on world
    # frames (tests/test_world.py::test_world_windowed_ba_never_worse).
    res = run_windowed_ba(seq.frames, seq.P1, seq.P2, cfg, window=6,
                          stride=3, ba_iters=10, gate=False)
    assert res.frame_ok[1:].all()
    for c0, c1, ok, half0, half1 in res.window_costs:
        assert ok
        assert c1 <= c0
    ate_vo = ate_rmse(res.poses_vo, seq.gt_poses)
    ate_ba = ate_rmse(res.poses, seq.gt_poses)
    # BA with robust re-gating beats the front-end trajectory
    # (measured: 0.11 -> 0.038 on this sequence)
    assert ate_vo < 0.15, ate_vo
    assert ate_ba < ate_vo, (ate_vo, ate_ba)
    assert ate_ba < 0.06, ate_ba


def test_windowed_ba_checkpoint_resume(tmp_path):
    """Interrupted windowed-BA run resumed from its checkpoint matches the
    uninterrupted run exactly (per-window keys are fold_in(key, w))."""
    from libviso_tpu.utils.checkpoint import CheckpointManager

    cfg = PipelineConfig(
        detector=DetectorConfig(max_features=120, nbinx=6, nbiny=2,
                                num_slots=128),
        ransac=RansacConfig(num_hypotheses=8, gn_iters=10),
    )
    seq = generate_sequence(num_frames=8, num_points=200, width=160,
                            height=96, f=120.0, seed=5)
    frames = seq.frames
    full = run_windowed_ba(frames, seq.P1, seq.P2, cfg, window=4, stride=2,
                           ba_iters=4, seed=0)

    mgr = CheckpointManager(str(tmp_path / "ck"), every=1)
    # interrupted: only the first 5 frames -> fewer windows completed
    run_windowed_ba(frames[:5], seq.P1, seq.P2, cfg, window=4, stride=2,
                    ba_iters=4, seed=0, checkpoint=mgr)
    assert mgr.latest() is not None

    with pytest.raises(ValueError, match="fingerprint"):
        run_windowed_ba(frames, seq.P1, seq.P2, cfg, window=4, stride=2,
                        ba_iters=4, seed=1, checkpoint=mgr)

    # NOTE: resuming with the full sequence changes the window-start list,
    # so a real resume must use the same frames; emulate by rerunning the
    # full sequence with a fresh manager and interrupt mid-run instead.
    mgr2 = CheckpointManager(str(tmp_path / "ck2"), every=1)
    run_windowed_ba(frames, seq.P1, seq.P2, cfg, window=4, stride=2,
                    ba_iters=4, seed=0, checkpoint=mgr2)
    # rerun with the populated manager: every window is skipped, output
    # must be identical to the uninterrupted run
    again = run_windowed_ba(frames, seq.P1, seq.P2, cfg, window=4,
                            stride=2, ba_iters=4, seed=0, checkpoint=mgr2)
    np.testing.assert_array_equal(again.motions, full.motions)
    np.testing.assert_array_equal(again.frame_ok, full.frame_ok)
    np.testing.assert_allclose(again.poses, full.poses, rtol=0, atol=0)
    assert again.window_costs == full.window_costs


@pytest.mark.slow
def test_windowed_ba_no_harm_in_hard_regime():
    """The per-camera observation gate (pipeline/refine.py cam_obs) must
    keep windowed BA from DEGRADING the trajectory when tracks are
    contaminated: measured without it, a weakly-observed camera's refined
    motion lands meters off while the window cost still drops (band-
    limited texture + sensor noise regime).  BA may fall back to VO, but
    must not end up meaningfully worse."""
    from libviso_tpu.synthetic import Imaging
    from libviso_tpu.utils.metrics import ate_rmse

    seq = generate_sequence(num_frames=16, num_points=400, seed=5,
                            width=416, height=160, patch=9,
                            subpixel_render=True, pattern_smooth=1.0,
                            imaging=Imaging(noise_sigma=3.0))
    cfg = dataclasses.replace(
        tiny_config(),
        detector=dataclasses.replace(tiny_config().detector,
                                     subpixel=True))
    res = run_windowed_ba(seq.frames, seq.P1, seq.P2, cfg, window=8,
                          stride=4, seed=0)
    a_ba = ate_rmse(res.poses, seq.gt_poses)
    a_vo = ate_rmse(res.poses_vo, seq.gt_poses)
    assert a_ba <= a_vo * 1.1 + 0.02, (a_ba, a_vo)


@pytest.mark.slow
def test_windowed_ba_prior_consistency():
    """VERDICT r1 #5: with the cross-window prior the stitched overlap
    cannot disagree with what the earlier window established — measured
    as end-to-end ATE not worse than the independent-window mode on a
    clean sequence (where BA itself improves VO ~2.6x)."""
    from libviso_tpu.utils.metrics import ate_rmse

    seq = generate_sequence(num_frames=16, num_points=400, seed=3,
                            width=416, height=160)
    # gate=False: pins the PRIOR's effect on the solver output (see
    # test_windowed_ba_sequence for why sprite BA tests bypass the gate)
    r0 = run_windowed_ba(seq.frames, seq.P1, seq.P2, tiny_config(),
                         window=8, stride=4, seed=0, prior_strength=0.0,
                         gate=False)
    r1 = run_windowed_ba(seq.frames, seq.P1, seq.P2, tiny_config(),
                         window=8, stride=4, seed=0, prior_strength=1.0,
                         gate=False)
    a0 = ate_rmse(r0.poses, seq.gt_poses)
    a1 = ate_rmse(r1.poses, seq.gt_poses)
    a_vo = ate_rmse(r1.poses_vo, seq.gt_poses)
    assert a1 < a_vo, (a1, a_vo)            # BA still improves VO
    assert a1 <= a0 * 1.25 + 0.01, (a1, a0)  # prior never much worse


def test_stride_larger_than_window_rejected():
    """stride > window leaves frames covered by no BA window (their
    motions would stay zero-initialized — silent corruption); must raise
    instead."""
    import numpy as np
    import pytest

    from libviso_tpu.pipeline.windowed import run_windowed_ba

    with pytest.raises(ValueError, match="stride"):
        run_windowed_ba([], np.eye(3, 4), np.eye(3, 4),
                        window=8, stride=12)
