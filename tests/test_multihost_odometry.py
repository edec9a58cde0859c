"""Multi-controller sharded odometry (SURVEY.md P1 + P7).

Single-process checks here (assignment arithmetic + equivalence with the
single-controller path on the 8-device mesh); the genuinely multi-process
end-to-end run lives in tests/test_multiprocess.py.
"""

import numpy as np
import pytest

from libviso_tpu.config import DetectorConfig, PipelineConfig, RansacConfig
from libviso_tpu.parallel import (
    host_chunk_assignment,
    make_mesh,
    run_sharded_odometry,
    run_sharded_odometry_multihost,
)
from libviso_tpu.synthetic import generate_sequence

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("total,chunks,procs", [
    (9, 4, 2), (17, 8, 4), (6, 4, 4), (12, 2, 1),
])
def test_assignment_covers_all_motions(total, chunks, procs):
    owned = []
    L_all = set()
    for p in range(procs):
        plan = host_chunk_assignment(total, chunks, p, procs)
        L_all.add(plan["L"])
        for s, nv in zip(plan["chunk_starts"], plan["n_valid"]):
            owned.extend(range(s + 1, s + 1 + nv))
        # the span really contains every owned chunk
        assert plan["frame_start"] <= plan["chunk_starts"][0]
        assert plan["frame_stop"] >= min(plan["chunk_starts"][-1]
                                         + plan["L"], total)
    assert len(L_all) == 1              # all processes agree on L
    assert sorted(owned) == list(range(1, total))  # every motion once


def test_assignment_validates_divisibility():
    with pytest.raises(ValueError, match="divisible"):
        host_chunk_assignment(10, 4, 0, 3)


def test_multihost_matches_singlehost_on_one_process(rng):
    """With process_count=1 the multihost entry point must agree with the
    single-controller path bit-for-bit (same chunking, same program)."""
    cfg = PipelineConfig(
        detector=DetectorConfig(max_features=120, nbinx=6, nbiny=2,
                                num_slots=128),
        ransac=RansacConfig(num_hypotheses=8, gn_iters=10),
    )
    seq = generate_sequence(num_frames=9, num_points=150, width=128,
                            height=64, f=100.0, seed=0)
    left = np.stack([f[0] for f in seq.frames])
    right = np.stack([f[1] for f in seq.frames])
    mesh = make_mesh(n_data=8, n_model=1)

    ref_poses, ref_keep = run_sharded_odometry(mesh, seq.P1, seq.P2,
                                               left, right, cfg, seed=0)
    plan = host_chunk_assignment(len(left), 8, 0, 1)
    got_poses, got_keep = run_sharded_odometry_multihost(
        mesh, seq.P1, seq.P2,
        left[plan["frame_start"]:plan["frame_stop"]],
        right[plan["frame_start"]:plan["frame_stop"]],
        total_frames=len(left), cfg=cfg, seed=0)
    np.testing.assert_array_equal(got_keep, ref_keep)
    np.testing.assert_allclose(got_poses, ref_poses, rtol=0, atol=0)


def test_multihost_rejects_wrong_span(rng):
    cfg = PipelineConfig(
        detector=DetectorConfig(max_features=120, nbinx=6, nbiny=2,
                                num_slots=128),
        ransac=RansacConfig(num_hypotheses=8, gn_iters=5),
    )
    seq = generate_sequence(num_frames=5, num_points=120, width=128,
                            height=64, f=100.0, seed=1)
    left = np.stack([f[0] for f in seq.frames])
    right = np.stack([f[1] for f in seq.frames])
    mesh = make_mesh(n_data=4, n_model=2)
    with pytest.raises(ValueError, match="must pass frames"):
        run_sharded_odometry_multihost(mesh, seq.P1, seq.P2, left[:2],
                                       right[:2], total_frames=len(left),
                                       cfg=cfg)


def test_multihost_handles_empty_tail_chunk(rng):
    """Regression: a process whose chunk starts at/past the final frame
    used to ship a (0, H, W) shard and abort the global array assembly."""
    cfg = PipelineConfig(
        detector=DetectorConfig(max_features=120, nbinx=6, nbiny=2,
                                num_slots=128),
        ransac=RansacConfig(num_hypotheses=8, gn_iters=5),
    )
    # T=6, 4 chunks: per=ceil(5/4)=2, chunk starts 0,2,4,6 — the last
    # chunk starts AT the final frame boundary (n_valid = 0)
    seq = generate_sequence(num_frames=6, num_points=150, width=128,
                            height=64, f=100.0, seed=2)
    left = np.stack([f[0] for f in seq.frames])
    right = np.stack([f[1] for f in seq.frames])
    mesh = make_mesh(n_data=4, n_model=2)
    plan = host_chunk_assignment(6, 4, 0, 1)
    poses, keep = run_sharded_odometry_multihost(
        mesh, seq.P1, seq.P2,
        left[plan["frame_start"]:plan["frame_stop"]],
        right[plan["frame_start"]:plan["frame_stop"]],
        total_frames=6, cfg=cfg, seed=0)
    assert poses.shape == (6, 4, 4)
    assert np.all(np.isfinite(poses))
    # single-controller path hits the same arithmetic
    ref, _ = run_sharded_odometry(mesh, seq.P1, seq.P2, left, right, cfg,
                                  seed=0)
    np.testing.assert_allclose(poses, ref, rtol=0, atol=0)
