"""ATE-vs-perturbation sweep over the synthetic imaging model.

Measures trajectory accuracy of the stereo pipeline under each imaging
perturbation regime (VERDICT r1 next #2) and prints a markdown table —
the source of the table in docs/realism.md and the calibration data for
the pass/fail bounds in tests/test_realism.py.

Run on CPU (the regimes are accuracy, not speed, experiments):

    JAX_PLATFORMS=cpu python benchmarks/realism_sweep.py [--seeds 3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from libviso_tpu.config import (  # noqa: E402
    DetectorConfig,
    PipelineConfig,
    RansacConfig,
)
from libviso_tpu.pipeline.stereo import run_stereo_sequence  # noqa: E402
from libviso_tpu.synthetic import Imaging, generate_sequence  # noqa: E402
from libviso_tpu.utils.metrics import ate_rmse  # noqa: E402

# One fixed image/slot geometry for every regime: a single compile per
# metric serves the whole sweep.
SHAPE = dict(width=620, height=188, num_frames=8, num_points=400,
             patch=9, subpixel_render=True, pattern_smooth=1.0)

REGIMES = {
    "clean": {},
    "noise3": dict(imaging=Imaging(noise_sigma=3.0)),
    "noise6": dict(imaging=Imaging(noise_sigma=6.0)),
    "exposure": dict(imaging=Imaging(exposure_drift=0.10,
                                     lr_gain_mismatch=0.05)),
    "bias": dict(imaging=Imaging(bias_drift=4.0)),
    "blur1": dict(imaging=Imaging(blur_sigma=1.0)),
    "occluders4": dict(imaging=Imaging(num_occluders=4)),
    "repetitive": dict(num_patterns=16),
    "quantized": dict(imaging=Imaging(quantize=True, noise_sigma=2.0)),
    "hard": dict(imaging=Imaging(exposure_drift=0.08, lr_gain_mismatch=0.04,
                                 noise_sigma=3.0, blur_sigma=0.7,
                                 num_occluders=3, quantize=True)),
}


def pipeline_config():
    return PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                                num_slots=512, subpixel=True),
        ransac=RansacConfig(num_hypotheses=32),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--metric", default="l1", choices=["l1", "l2"])
    args = ap.parse_args(argv)

    cfg = pipeline_config()
    if args.metric != "l1":
        cfg = cfg.with_metric(args.metric)

    print(f"| regime | ATE rmse [m] (median over {args.seeds} seeds) "
          "| max | solved |", flush=True)
    print("|---|---|---|---|", flush=True)
    for name, kw in REGIMES.items():
        ates, solved = [], []
        for seed in range(args.seeds):
            seq = generate_sequence(seed=seed + 100, **SHAPE, **kw)
            res = run_stereo_sequence(seq.frames, seq.P1, seq.P2, cfg,
                                      seed=seed)
            ates.append(ate_rmse(res.poses, seq.gt_poses))
            solved.append(int(res.frame_ok[1:].sum()))
        print(f"| {name} | {np.median(ates):.4f} | {max(ates):.4f} "
              f"| {min(solved)}/{SHAPE['num_frames'] - 1} |", flush=True)


if __name__ == "__main__":
    sys.exit(main())
