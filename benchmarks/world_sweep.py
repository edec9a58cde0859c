"""Measure VO accuracy on the textured-world renderer across regimes.

The calibration source for tests/test_world.py's bounds, and the evidence
table for docs/realism.md "Textured-world renderer" — run on CPU:

    JAX_PLATFORMS=cpu python benchmarks/world_sweep.py [--seeds 3]

Prints one JSON line per (regime, seed) to stdout and a summary table to
stderr.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from libviso_tpu.config import DetectorConfig, PipelineConfig, RansacConfig
    from libviso_tpu.pipeline.stereo import run_stereo_sequence
    from libviso_tpu.synthetic import Imaging
    from libviso_tpu.synthetic_world import generate_world_sequence
    from libviso_tpu.utils.metrics import ate_rmse

    n_seeds = 3
    for a in sys.argv[1:]:
        if a.startswith("--seeds"):
            n_seeds = int(a.split("=")[1] if "=" in a
                          else sys.argv[sys.argv.index(a) + 1])

    SHAPE = dict(width=416, height=160, num_frames=8)
    CFG = PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                                num_slots=512),
        ransac=RansacConfig(num_hypotheses=32),
    )
    REGIMES = {
        "clean": {},
        "noise3": dict(imaging=Imaging(noise_sigma=3.0)),
        "noise6": dict(imaging=Imaging(noise_sigma=6.0)),
        "exposure": dict(imaging=Imaging(exposure_drift=0.10,
                                         lr_gain_mismatch=0.05)),
        "blur1": dict(imaging=Imaging(blur_sigma=1.0)),
        "occluders4": dict(imaging=Imaging(num_occluders=4)),
        "quantized": dict(imaging=Imaging(quantize=True, noise_sigma=2.0)),
        "fast": dict(speed=1.6),
        "hard": dict(imaging=Imaging(exposure_drift=0.08,
                                     lr_gain_mismatch=0.04,
                                     noise_sigma=3.0, blur_sigma=0.7,
                                     num_occluders=3, quantize=True)),
        # round-4 imaging-model extensions (VERDICT r3 #7)
        "overexp1.6": dict(imaging=Imaging(overexposure_gain=1.6)),
        "overexp2.5": dict(imaging=Imaging(overexposure_gain=2.5)),
        "overexp4": dict(imaging=Imaging(overexposure_gain=4.0)),
        "rs0.3": dict(imaging=Imaging(rs_fraction=0.3)),
        "rs0.6": dict(imaging=Imaging(rs_fraction=0.6)),
        "rs1.0": dict(imaging=Imaging(rs_fraction=1.0)),
    }

    summary = {}
    for name, kw in REGIMES.items():
        ates, fails = [], 0
        for seed in range(n_seeds):
            seq = generate_world_sequence(seed=seed, **SHAPE, **kw)
            res = run_stereo_sequence(seq.frames, seq.P1, seq.P2, CFG,
                                      seed=seed)
            ate = float(ate_rmse(res.poses, seq.gt_poses))
            nfail = int((~res.frame_ok[1:]).sum())
            ates.append(ate)
            fails += nfail
            print(json.dumps({"regime": name, "seed": seed, "ate": ate,
                              "failed_frames": nfail,
                              "num_circle_med": float(np.median(
                                  [s["num_circle"] for s in res.stats[1:]])),
                              }), flush=True)
        summary[name] = (float(np.median(ates)), float(np.max(ates)), fails)

    print(f"{'regime':<12} {'median':>8} {'max':>8} {'fails':>6}",
          file=sys.stderr)
    for name, (med, mx, fails) in summary.items():
        print(f"{name:<12} {med:8.4f} {mx:8.4f} {fails:6d}", file=sys.stderr)


if __name__ == "__main__":
    main()
