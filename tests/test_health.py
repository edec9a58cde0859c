"""Run-level health summary + alarms (VERDICT r4 #4).

The calibrated silent-failure signals (docs/operations.md) must reach
the `health` block every driver prints — an operator consuming the
summary must see the support-ratio alarm that catches dominant-mover
capture (fired on 17/17 locked rows of the r4 mover sweep) without
reading per-frame metrics.jsonl.
"""

import numpy as np
import pytest

from libviso_tpu.config import HealthConfig
from libviso_tpu.utils.metrics import health_summary


def _stats(rows):
    """rows: list of (ok, inl, circ, jump, sharp)."""
    out = [{"frame": 0, "ok": False}]
    for ok, inl, circ, jump, sharp in rows:
        out.append({"frame": len(out), "ok": ok, "num_inliers": inl,
                    "num_circle": circ, "motion_jump": jump,
                    "sharpness": sharp})
    return out


def _ok_flags(stats):
    return np.array([s["ok"] for s in stats])


def test_healthy_run_no_alarms():
    st = _stats([(True, 80, 100, 0.05, 0.8)] * 5)
    h = health_summary(st, _ok_flags(st))
    assert h["alarms"] == []
    assert h["failed_frames"] == 0
    assert h["support_ratio_min"] == 0.8
    assert h["motion_jump_max"] == 0.05
    assert h["inliers_mean"] == 80.0


def test_support_ratio_alarm_trips():
    rows = [(True, 80, 100, 0.05, 0.8)] * 4 + [(True, 55, 100, 0.1, 0.8)]
    st = _stats(rows)
    h = health_summary(st, _ok_flags(st))
    assert h["support_ratio_min"] == 0.55
    assert "support_ratio" in h["alarms"]
    assert "motion_jump" not in h["alarms"]


def test_motion_jump_alarm_trips():
    rows = [(True, 80, 100, 0.05, 0.8)] * 4 + [(True, 80, 100, 0.45, 0.8)]
    st = _stats(rows)
    h = health_summary(st, _ok_flags(st))
    assert h["motion_jump_max"] == 0.45
    assert h["alarms"] == ["motion_jump"]


def test_failed_frames_excluded_from_support_ratio():
    """A failed frame's 0-ish ratio must not latch the alarm that exists
    to catch SILENT (ok=true) capture — failure is already loud."""
    rows = [(True, 80, 100, 0.05, 0.8)] * 4 + [(False, 0, 100, 0.0, 0.8)]
    st = _stats(rows)
    h = health_summary(st, _ok_flags(st))
    assert h["failed_frames"] == 1
    assert h["support_ratio_min"] == 0.8
    assert h["alarms"] == []


def test_missing_signals_yield_null_not_missing_keys():
    """BA/loop-mode stats carry no sharpness/jump; keys must stay."""
    st = [{"frame": 0, "ok": False}] + [
        {"frame": t, "ok": True} for t in range(1, 4)]
    h = health_summary(st, np.array([False, True, True, True]))
    for k in ("failed_frames", "sharpness_mean", "sharpness_min",
              "inliers_mean", "support_ratio_min", "motion_jump_max",
              "alarms"):
        assert k in h
    assert h["support_ratio_min"] is None
    assert h["motion_jump_max"] is None
    assert h["alarms"] == []


def test_threshold_config_respected():
    st = _stats([(True, 74, 100, 0.25, 0.8)] * 3)
    hc = HealthConfig(support_ratio_alarm=0.8, motion_jump_alarm=0.2)
    h = health_summary(st, _ok_flags(st),
                       support_ratio_alarm=hc.support_ratio_alarm,
                       motion_jump_alarm=hc.motion_jump_alarm)
    assert set(h["alarms"]) == {"support_ratio", "motion_jump"}


@pytest.mark.slow
def test_locked_mover_trips_run_summary():
    """End-to-end: the r4-calibrated capture scenario (huge truck,
    pacing, ~23% coverage — support_ratio_min 0.51-0.62 and
    motion_jump_max 0.43-0.55 on all three sweep seeds,
    benchmarks/world_mover_sweep_r4.jsonl) must trip the run-level
    alarm an operator actually sees."""
    from libviso_tpu.config import (
        DetectorConfig,
        PipelineConfig,
        RansacConfig,
    )
    from libviso_tpu.pipeline.stereo import run_stereo_sequence
    from libviso_tpu.synthetic_world import (
        generate_world_sequence,
        make_truck_mover,
    )

    cfg = PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                                num_slots=512),
        ransac=RansacConfig(num_hypotheses=32))
    rng = np.random.default_rng((0, 0xBEEF))
    mover = make_truck_mover(rng, velocity=(0.0, 0.0, 0.95 * 0.8),
                             length=14.0, height=4.0, x=-2.6, z0=6.0)
    seq = generate_world_sequence(seed=0, width=416, height=160,
                                  num_frames=10, speed=0.8, yaw_rate=0.0,
                                  movers=[mover])
    res = run_stereo_sequence(seq.frames, seq.P1, seq.P2, cfg, seed=0)
    h = health_summary(res.stats, res.frame_ok)
    assert h["support_ratio_min"] is not None
    assert "support_ratio" in h["alarms"], h
    # every frame still reports ok — exactly the silent failure the
    # alarm exists for
    assert h["failed_frames"] == 0
