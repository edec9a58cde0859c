"""Loop closure end-to-end: a rendered closed circle, drifted VO, revisit
detection, pose-graph drift removal (pipeline/loop.py)."""

import numpy as np
import pytest

from libviso_tpu.config import DetectorConfig, PipelineConfig, RansacConfig
from libviso_tpu.pipeline.loop import run_with_loop_closure
from libviso_tpu.synthetic import generate_sequence


def tiny_config():
    return PipelineConfig(
        detector=DetectorConfig(max_features=240, nbinx=8, nbiny=3,
                                num_slots=256),
        ransac=RansacConfig(num_hypotheses=32, gn_iters=50),
    )


def _circle_sequence(T=48, seed=3):
    """Drive a closed circle: constant yaw + forward step per frame."""
    yaw = 2 * np.pi / (T - 1)
    radius_step = 2 * 10.0 * np.sin(yaw / 2)  # chord length, r=10 m
    steps = np.zeros((T, 6))
    steps[1:] = [0.0, yaw, 0.0, 0.0, 0.0, radius_step]
    return generate_sequence(num_frames=T, num_points=1400, seed=seed,
                             width=416, height=160, trajectory=steps)


def test_loop_detected_and_drift_reduced():
    seq = _circle_sequence()
    res = run_with_loop_closure(
        list(seq.frames), seq.P1, seq.P2, cfg=tiny_config(),
        keyframe_every=4, min_gap=24, min_matches=40, min_inliers=20,
        seed=0)
    assert res.frame_ok[1:].mean() > 0.8  # VO tracked the circle

    # at least one revisit of the early keyframes from the closing leg
    assert len(res.loops) >= 1
    le = res.loops[-1]
    assert le.frame_new - le.frame_old >= 24

    gt = seq.gt_poses
    T = len(gt)
    err_vo = np.linalg.norm(res.poses_vo[:T, :3, 3] - gt[:, :3, 3],
                            axis=1)
    err_opt = np.linalg.norm(res.poses[:T, :3, 3] - gt[:, :3, 3], axis=1)
    # the optimized endpoint must close the loop better than open-chain VO
    assert err_opt[-1] < err_vo[-1]
    assert res.graph_cost[1] < res.graph_cost[0]


def test_no_loops_on_straight_drive():
    seq = generate_sequence(num_frames=16, num_points=500, seed=5,
                            width=416, height=160)
    res = run_with_loop_closure(
        list(seq.frames), seq.P1, seq.P2, cfg=tiny_config(),
        keyframe_every=4, min_gap=24, seed=0)
    assert res.loops == []
    np.testing.assert_array_equal(res.poses, res.poses_vo)
