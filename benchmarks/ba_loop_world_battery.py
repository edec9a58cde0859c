"""Composed back-end vs its parts on world loop drives (r5).

The composed driver (pipeline/ba_loop.py) claims the natural SLAM
factorization: windowed BA fixes LOCAL motion error, the pose graph
fixes GLOBAL drift, and the two compose.  This battery measures that
claim on textured-plaza circuits (dense perspective imagery, exact
ground truth): per seed, the SAME frames run through

    vo        — streaming front-end only (open chain)
    ba        — windowed BA (gated, r5 margin)
    loop      — streaming + loop closure
    composed  — windowed BA + loop closure (one front-end pass)

reporting full-trajectory ATE and endpoint error.  Expectation: loop
closure dominates on circuits (drift removal is the big win), BA adds
local polish, and composed ~= best of both — with the gate keeping BA
from hurting where texture-phase refits would.

    JAX_PLATFORMS=cpu python benchmarks/ba_loop_world_battery.py
        [--seeds=3] [--frames=41]
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
    from libviso_tpu.pipeline.ba_loop import run_windowed_ba_loop
    from libviso_tpu.pipeline.loop import run_with_loop_closure
    from libviso_tpu.pipeline.windowed import run_windowed_ba
    from libviso_tpu.synthetic_world import generate_plaza_sequence
    from libviso_tpu.utils.metrics import ate_rmse

    n_seeds = 3
    frames_n = 41
    for a in sys.argv[1:]:
        if a.startswith("--seeds="):
            n_seeds = int(a.split("=")[1])
        if a.startswith("--frames="):
            frames_n = int(a.split("=")[1])

    CFG = PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                                num_slots=512),
        ransac=RansacConfig(num_hypotheses=32))
    BA = BAConfig(window=8, stride=4)
    LOOP_KW = dict(keyframe_every=4, min_gap=20, min_matches=60,
                   min_inliers=30)

    def ep_err(poses, gt):
        return float(np.linalg.norm(poses[-1, :3, 3] - gt[-1, :3, 3]))

    rows = []
    for seed in range(n_seeds):
        seq = generate_plaza_sequence(num_frames=frames_n, seed=seed)
        frames = list(seq.frames)
        gt = seq.gt_poses

        lres = run_with_loop_closure(frames, seq.P1, seq.P2, cfg=CFG,
                                     seed=seed, **LOOP_KW)
        bres = run_windowed_ba(frames, seq.P1, seq.P2, CFG, ba=BA,
                               seed=seed)
        cres = run_windowed_ba_loop(frames, seq.P1, seq.P2, CFG, ba=BA,
                                    seed=seed, **LOOP_KW)
        row = {
            "seed": seed, "frames": frames_n,
            "vo": round(float(ate_rmse(lres.poses_vo, gt)), 4),
            "vo_ep": round(ep_err(lres.poses_vo, gt), 4),
            "ba": round(float(ate_rmse(bres.poses, gt)), 4),
            "ba_ep": round(ep_err(bres.poses, gt), 4),
            "loop": round(float(ate_rmse(lres.poses, gt)), 4),
            "loop_ep": round(ep_err(lres.poses, gt), 4),
            "composed": round(float(ate_rmse(cres.poses, gt)), 4),
            "composed_ep": round(ep_err(cres.poses, gt), 4),
            "loop_edges": len(lres.loops),
            "composed_edges": len(cres.loops),
            "ba_windows_accepted": sum(
                1 for c in cres.window_costs if c[2]),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    hdr = (f"{'seed':>4} {'vo':>8} {'ba':>8} {'loop':>8} {'comp':>8} |"
           f" {'vo_ep':>7} {'loop_ep':>8} {'comp_ep':>8}")
    print(hdr, file=sys.stderr)
    for r in rows:
        print(f"{r['seed']:>4} {r['vo']:8.3f} {r['ba']:8.3f} "
              f"{r['loop']:8.3f} {r['composed']:8.3f} | "
              f"{r['vo_ep']:7.3f} {r['loop_ep']:8.3f} "
              f"{r['composed_ep']:8.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
