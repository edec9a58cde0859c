"""Degenerate-input robustness: the fixed-shape pipeline must degrade to
ok=False with finite outputs (the reference skips such frames,
src/viso.cpp:1283-1288, 1322-1324) — never NaN or crash."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libviso_tpu.config import DetectorConfig, PipelineConfig, RansacConfig
from libviso_tpu.pipeline import run_stereo_sequence
from libviso_tpu.pipeline.stereo import build_frame_step, empty_state
from libviso_tpu.config import Calib


def tiny_config():
    return PipelineConfig(
        detector=DetectorConfig(max_features=240, nbinx=8, nbiny=3,
                                num_slots=256),
        ransac=RansacConfig(num_hypotheses=16, gn_iters=30),
    )


CAL = Calib(f=700.0, cu=208.0, cv=80.0, base=0.5)


def _run_frames(frames):
    cfg = tiny_config()
    step = jax.jit(build_frame_step(CAL, np.eye(3), cfg))
    state = empty_state(cfg)
    outs = []
    for t, (l, r) in enumerate(frames):
        state, out = step(state, jnp.asarray(l), jnp.asarray(r),
                          jax.random.fold_in(jax.random.PRNGKey(0), t))
        outs.append(out)
    return outs


@pytest.mark.parametrize("make", [
    lambda rng: np.zeros((160, 416), np.float32),                 # black
    lambda rng: np.full((160, 416), 255.0, np.float32),           # white
    lambda rng: np.full((160, 416), 127.0, np.float32),           # flat
    lambda rng: rng.uniform(0, 255, (160, 416)).astype(np.float32),  # noise
], ids=["black", "white", "flat", "noise"])
def test_degenerate_frames_no_nan(make):
    rng = np.random.default_rng(0)
    frames = [(make(rng), make(rng)) for _ in range(3)]
    outs = _run_frames(frames)
    for out in outs:
        assert np.all(np.isfinite(np.asarray(out.tr)))
        assert int(out.num_inliers) >= 0


def test_texture_then_blackout_recovers():
    """A blackout frame mid-sequence must not poison later frames."""
    from libviso_tpu.synthetic import generate_sequence
    from libviso_tpu.utils.metrics import ate_rmse

    seq = generate_sequence(num_frames=6, num_points=420, seed=3,
                            width=416, height=160)
    frames = list(seq.frames)
    black = (np.zeros_like(frames[0][0]), np.zeros_like(frames[0][1]))
    frames[3] = black
    res = run_stereo_sequence(frames, seq.P1, seq.P2, cfg=tiny_config(),
                              seed=0)
    assert np.all(np.isfinite(res.poses))
    # the blackout frame (and the reacquisition frame after it) fail...
    assert not res.frame_ok[3]
    # ...but the tail of the sequence solves again
    assert res.frame_ok[5]
