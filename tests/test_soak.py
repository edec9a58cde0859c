"""Sequence-scale soak regression (VERDICT r4 #2).

The r5 600-frame soak (benchmarks/soak_r5.json) caught a ~10 MB/frame
host-memory leak — eager ransac_pose dispatch in the loop-verification
path — that no short test could see (the run OOMed by frame ~300).
This test pins the fixed behavior at a CI-tolerable scale: a 300-frame
3-lap plaza drive through streaming + loop closure + checkpointing
must hold RSS flat in steady state, keep closing loops on every lap,
and exercise spatial eviction beyond the store size.
"""

import gc

import numpy as np
import pytest

from libviso_tpu.config import (
    DetectorConfig,
    PipelineConfig,
    RansacConfig,
)


def _vm_rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


@pytest.mark.slow
def test_long_run_memory_flat_and_loops_scale(tmp_path):
    from libviso_tpu.pipeline.loop import run_with_loop_closure
    from libviso_tpu.synthetic_world import generate_plaza_sequence
    from libviso_tpu.utils.checkpoint import CheckpointManager

    cfg = PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                                num_slots=512),
        ransac=RansacConfig(num_hypotheses=32))
    T, laps = 300, 3
    seq = generate_plaza_sequence(num_frames=T, seed=0, circuits=laps)
    rss = {}

    def frames():
        for t, fr in enumerate(seq.frames):
            if t in (60, 290):
                gc.collect()
                rss[t] = _vm_rss_mb()
            yield fr

    mgr = CheckpointManager(str(tmp_path / "ck"), every=50)
    res = run_with_loop_closure(
        frames(), seq.P1, seq.P2, cfg=cfg, keyframe_every=3, min_gap=40,
        min_matches=40, min_inliers=20, max_keyframes=64, seed=0,
        checkpoint=mgr)

    # memory: steady-state slope (post-compile, post-store-warmup) must
    # stay under 0.5 MB/frame — the leak measured 9.7 MB/frame
    slope = (rss[290] - rss[60]) / 230.0
    assert slope < 0.5, f"RSS slope {slope:.2f} MB/frame ({rss})"

    # multi-revisit: laps 2+ keep closing (not just the first revisit)
    lap_len = (T - 1) // laps
    laps_hit = {le.frame_new // lap_len for le in res.loops}
    assert len(res.loops) >= laps, (len(res.loops), laps_hit)
    assert len(laps_hit & {1, 2}) >= 2, laps_hit

    # spatial eviction beyond store size: 100 keyframes through 64 slots
    assert res.keyframes_offered > 64
    assert res.evictions + res.store_skipped > 0

    # drift actually removed at the endpoint
    gt = seq.gt_poses
    err_vo = np.linalg.norm(res.poses_vo[-1, :3, 3] - gt[-1, :3, 3])
    err_opt = np.linalg.norm(res.poses[-1, :3, 3] - gt[-1, :3, 3])
    assert err_opt < err_vo
    assert res.frame_ok[1:].mean() > 0.9
