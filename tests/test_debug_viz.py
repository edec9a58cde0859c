"""Debug artifact suite smoke tests (SURVEY.md C17)."""

import os

import numpy as np
import pytest

from libviso_tpu.config import DetectorConfig, PipelineConfig, RansacConfig
from libviso_tpu.pipeline import run_stereo_sequence
from libviso_tpu.synthetic import generate_sequence
from libviso_tpu.utils.debug_viz import (
    save_corners,
    save_epipolar,
    save_histogram,
    save_match_blend,
    save_stacked_matches,
)


def test_primitive_writers(tmp_path, rng):
    img = rng.integers(0, 255, (60, 90)).astype(np.uint8)
    kp = rng.uniform([0, 0], [90, 60], size=(20, 2)).astype(np.float32)
    idx = rng.integers(-1, 20, size=20).astype(np.int32)
    save_corners(img, kp, str(tmp_path / "c.png"))
    save_match_blend(img, img, kp, kp, idx, str(tmp_path / "b.png"))
    save_stacked_matches(img, img, kp, kp, idx, str(tmp_path / "s.png"))
    F = np.array([[0.0, 0, 0], [0, 0, -1], [0, 1, 0]])
    save_epipolar(img, F, kp[:5], str(tmp_path / "e.png"))
    save_histogram(rng.normal(size=1000), str(tmp_path / "h.png"))
    for name in ["c.png", "b.png", "s.png", "e.png", "h.png"]:
        assert (tmp_path / name).stat().st_size > 0


def test_pipeline_debug_dump(tmp_path):
    seq = generate_sequence(num_frames=3, num_points=250, seed=2,
                            width=256, height=96, speed=0.4, f=200.0)
    cfg = PipelineConfig(
        detector=DetectorConfig(max_features=120, nbinx=6, nbiny=2,
                                num_slots=128),
        ransac=RansacConfig(num_hypotheses=16, gn_iters=30),
    )
    run_stereo_sequence(seq.frames, seq.P1, seq.P2, cfg, seed=0,
                        dbg_dir=str(tmp_path))
    files = os.listdir(tmp_path)
    assert any(f.startswith("corners1_") for f in files)
    assert any(f.startswith("blend12_") for f in files)
    assert any(f.startswith("circ_match_") for f in files)
    assert any(f.startswith("reproj1_") for f in files)
