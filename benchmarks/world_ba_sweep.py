"""Windowed-BA acceptance-gate measurement on textured-world drives.

The evidence for VERDICT r3 #6 / r4 #1: on photograph-like imagery,
plain windowed BA can *degrade* a clean run (round 3, seed 1: VO
0.038 m -> BA 0.059 m) because dense-texture corners are not fixed 3D
points to subpixel accuracy — minimizing reprojection re-fits the
texture-phase drift.  The held-out-landmark acceptance gate
(pipeline/refine.py::holdout_gate) must keep BA's wins where VO had a
bad stretch while rejecting the harmful refits.  The r5 calibration
(margin/criterion selection + fresh-seed validation + the WORSE flag
below) lives in benchmarks/ba_gate_experiment.py; this script is the
production-path measurement.

Run on CPU:

    JAX_PLATFORMS=cpu python benchmarks/world_ba_sweep.py [--seeds 6]

Prints one JSON line per (regime, seed) with {vo, ba_gated, ba_plain}
ATE and the number of gate-rejected windows; summary table to stderr.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from libviso_tpu.config import (
        BAConfig,
        DetectorConfig,
        PipelineConfig,
        RansacConfig,
    )
    from libviso_tpu.pipeline.stereo import run_stereo_sequence
    from libviso_tpu.pipeline.windowed import run_windowed_ba
    from libviso_tpu.synthetic import Imaging
    from libviso_tpu.synthetic_world import generate_world_sequence
    from libviso_tpu.utils.metrics import ate_rmse

    n_seeds = 6
    seed0 = 1
    for a in sys.argv[1:]:
        if a.startswith("--seeds"):
            n_seeds = int(a.split("=")[1] if "=" in a
                          else sys.argv[sys.argv.index(a) + 1])
        if a.startswith("--seed0="):
            seed0 = int(a.split("=")[1])

    SHAPE = dict(width=416, height=160, num_frames=12)
    CFG = PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                                num_slots=512),
        ransac=RansacConfig(num_hypotheses=32),
    )
    BA_GATED = BAConfig(window=6, stride=3)
    BA_PLAIN = BAConfig(window=6, stride=3, gate=False)
    REGIMES = {
        "clean": {},
        "noise6": dict(imaging=Imaging(noise_sigma=6.0)),
    }

    rows = []
    for regime, kw in REGIMES.items():
        for seed in range(seed0, seed0 + n_seeds):
            seq = generate_world_sequence(seed=seed, **SHAPE, **kw)
            out = {}
            ate_vo = None
            for tag, ba in (("gated", BA_GATED), ("plain", BA_PLAIN)):
                res = run_windowed_ba(list(seq.frames), seq.P1, seq.P2,
                                      CFG, ba=ba, seed=seed)
                # the never-worse baseline is THIS driver's own VO
                # trajectory (poses_vo) — the motions a rejected window
                # falls back to; a separate streaming run would draw
                # different RANSAC keys and not be the actual fallback
                ate_vo = float(ate_rmse(res.poses_vo, seq.gt_poses))
                out[tag] = (float(ate_rmse(res.poses, seq.gt_poses)),
                            sum(1 for c in res.window_costs if not c[2]),
                            [(round(c[3], 3), round(c[4], 3))
                             for c in res.window_costs])
            row = {"regime": regime, "seed": seed, "vo": ate_vo,
                   "ba_gated": out["gated"][0],
                   "ba_plain": out["plain"][0],
                   "rejected_windows_gated": out["gated"][1],
                   "rejected_windows_plain": out["plain"][1],
                   "holdout_half_ratios": out["gated"][2]}
            rows.append(row)
            print(json.dumps(row), flush=True)

    print(f"{'regime':<8} {'seed':>4} {'vo':>8} {'gated':>8} {'plain':>8}"
          f" {'rej':>4}", file=sys.stderr)
    worse = 0
    for r in rows:
        flag = ""
        # never-worse criterion: gated BA within 10% + 5 mm of VO
        if r["ba_gated"] > r["vo"] * 1.10 + 0.005:
            worse += 1
            flag = "  <-- WORSE"
        print(f"{r['regime']:<8} {r['seed']:>4} {r['vo']:8.4f} "
              f"{r['ba_gated']:8.4f} {r['ba_plain']:8.4f} "
              f"{r['rejected_windows_gated']:>4}{flag}", file=sys.stderr)
    print(f"gated-worse-than-VO rows: {worse}/{len(rows)}", file=sys.stderr)


if __name__ == "__main__":
    main()
