"""Dominant-mover robustness envelope (VERDICT r3 #3).

A large, feature-rich object moving with internally consistent wrong
motion is the classic VO failure on real roads (a truck filling a
quarter of the frame).  This sweep renders a facade-textured truck side
panel in the adjacent lane of the world street, varies its image
coverage and relative speed, and measures where the RANSAC support
locks onto the mover instead of the static world — plus the health
signal that detects the contest (support ratio = num_inliers /
num_circle: a coherent second motion cluster that loses the vote still
shows up as circle-consistent matches OUTSIDE the winning support).

    JAX_PLATFORMS=cpu python benchmarks/world_mover_sweep.py [--seeds 3]

One JSON line per (coverage, speed_ratio, seed); table to stderr.
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
    from libviso_tpu.synthetic_world import (
        generate_world_sequence,
        make_truck_mover,
    )
    from libviso_tpu.utils.metrics import ate_rmse

    n_seeds = 3
    for a in sys.argv[1:]:
        if a.startswith("--seeds"):
            n_seeds = int(a.split("=")[1] if "=" in a
                          else sys.argv[sys.argv.index(a) + 1])
    W, H, T = 416, 160, 10
    CFG = PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                                num_slots=512),
        ransac=RansacConfig(num_hypotheses=32),
    )
    SPEED = 0.8
    # (truck length, height, lateral x, initial z) tuned to hold rough
    # image-coverage classes over the 10-frame drive; measured coverage
    # is reported per run (mid-frame changed-pixel fraction)
    GEOMS = {
        "small":  dict(length=4.0, height=2.0, x=-3.2, z0=9.0),
        "medium": dict(length=7.0, height=2.8, x=-3.2, z0=8.0),
        "large":  dict(length=10.0, height=3.4, x=-2.9, z0=7.0),
        "huge":   dict(length=14.0, height=4.0, x=-2.6, z0=6.0),
        # the ONSET scenario (docs/realism.md): the truck starts far
        # ahead and grows from ~3% to ~30% coverage over an 18-frame
        # drive — the realistic entry case, measured NOT to capture
        # (graceful contamination only)
        "onset":  dict(length=10.0, height=3.4, x=-2.9, z0=14.0,
                       frames=18),
    }
    RATIOS = {"overtaken": 0.45, "pacing": 0.95, "oncoming": -0.9}
    only = ""
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=")[1]

    def coverage(seq_with, seq_without, k):
        a = seq_with.frames[k][0]
        b = seq_without.frames[k][0]
        return float(np.mean(np.abs(a - b) > 2.0))

    rows = []
    for gname, g in GEOMS.items():
        if only and only not in gname:
            continue
        g = dict(g)
        frames_n = g.pop("frames", T)
        for rname, ratio in RATIOS.items():
            for seed in range(n_seeds):
                rng = np.random.default_rng((seed, 0xBEEF))
                mover = make_truck_mover(
                    rng, velocity=(0.0, 0.0, ratio * SPEED), **g)
                kw = dict(seed=seed, width=W, height=H,
                          num_frames=frames_n, speed=SPEED, yaw_rate=0.0)
                seq = generate_world_sequence(movers=[mover], **kw)
                ref = generate_world_sequence(**kw)
                cov = coverage(seq, ref, T // 2)
                res = run_stereo_sequence(seq.frames, seq.P1, seq.P2,
                                          CFG, seed=seed)
                res0 = run_stereo_sequence(ref.frames, ref.P1, ref.P2,
                                           CFG, seed=seed)
                ate = float(ate_rmse(res.poses, seq.gt_poses))
                ate0 = float(ate_rmse(res0.poses, ref.gt_poses))
                sup = [s["num_inliers"] / max(s["num_circle"], 1)
                       for s in res.stats[1:]]
                jump = max(s["motion_jump"] for s in res.stats[1:])
                row = {"geom": gname, "ratio": rname, "seed": seed,
                       "coverage": round(cov, 3), "ate": ate,
                       "ate_clean": ate0,
                       "failed": int((~res.frame_ok[1:]).sum()),
                       "support_ratio_min": round(min(sup), 3),
                       "support_ratio_med": round(float(np.median(sup)),
                                                  3),
                       "motion_jump_max": round(jump, 3)}
                rows.append(row)
                print(json.dumps(row), flush=True)

    print(f"{'geom':<7} {'ratio':<10} {'cov':>5} {'ate':>7} {'clean':>7} "
          f"{'supmin':>6} {'jump':>5} {'fail':>4}", file=sys.stderr)
    for r in rows:
        flag = "  <-- LOCKED" if r["ate"] > max(4 * r["ate_clean"],
                                                0.35) else ""
        print(f"{r['geom']:<7} {r['ratio']:<10} {r['coverage']:5.2f} "
              f"{r['ate']:7.3f} {r['ate_clean']:7.3f} "
              f"{r['support_ratio_min']:6.2f} "
              f"{r['motion_jump_max']:5.2f} {r['failed']:4d}{flag}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
