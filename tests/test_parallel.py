"""Multi-device sharded odometry tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libviso_tpu.config import DetectorConfig, PipelineConfig, RansacConfig
from libviso_tpu.parallel import (
    chunk_frames_with_halo,
    make_mesh,
    run_sharded_odometry,
    stitch_chunk_motions,
)
from libviso_tpu.pipeline import run_stereo_sequence
from libviso_tpu.synthetic import generate_sequence
from libviso_tpu.utils.metrics import ate_rmse


def tiny_config():
    return PipelineConfig(
        detector=DetectorConfig(max_features=240, nbinx=8, nbiny=3,
                                num_slots=256),
        ransac=RansacConfig(num_hypotheses=32, gn_iters=50),
    )


def test_mesh_construction():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_chunk_frames_with_halo():
    T, H, W = 10, 4, 6
    left = np.arange(T * H * W, dtype=np.float32).reshape(T, H, W)
    right = left + 1
    l, r, nv = chunk_frames_with_halo(left, right, 4)
    assert l.shape[0] == 4
    L = l.shape[1]
    per = L - 1
    # consecutive chunks overlap by exactly one frame
    np.testing.assert_array_equal(l[1, 0], left[per])
    # total valid motions == T - 1
    assert nv.sum() == T - 1


def test_stitch_identity_motions():
    B, L = 3, 4
    trs = jnp.zeros((B, L, 6))
    oks = jnp.ones((B, L), bool)
    nv = jnp.array([3, 3, 2])  # last chunk padded by one
    poses, keep = stitch_chunk_motions(trs, oks, nv)
    assert keep.sum() == 1 + 8
    np.testing.assert_allclose(np.asarray(poses)[np.asarray(keep)],
                               np.eye(4)[None].repeat(9, 0), atol=1e-6)


@pytest.mark.slow
def test_sharded_matches_serial():
    seq = generate_sequence(num_frames=9, num_points=400, seed=5,
                            width=320, height=120, speed=0.5, f=280.0)
    cfg = tiny_config()
    serial = run_stereo_sequence(seq.frames, seq.P1, seq.P2, cfg, seed=0)

    left = np.stack([f[0] for f in seq.frames])
    right = np.stack([f[1] for f in seq.frames])
    mesh = make_mesh(n_data=4, n_model=1)
    poses, keep = run_sharded_odometry(mesh, seq.P1, seq.P2, left, right,
                                       cfg, seed=0)
    assert poses.shape == (9, 4, 4)
    # same images, same deterministic detection/matching; RANSAC keys differ
    # so parity is trajectory-level, not bitwise
    ate_vs_serial = ate_rmse(poses, serial.poses)
    assert ate_vs_serial < 0.15, ate_vs_serial
    ate_vs_gt = ate_rmse(poses, seq.gt_poses)
    assert ate_vs_gt < 0.15, ate_vs_gt
