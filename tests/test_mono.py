"""End-to-end monocular pipeline on synthetic data (BASELINE config 2)."""

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
