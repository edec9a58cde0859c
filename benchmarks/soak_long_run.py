"""Sequence-scale soak (VERDICT r4 #2): 600+ world frames end-to-end.

Everything the repo had measured before round 5 topped out at ~48
frames; KITTI 00 — the reference's primary workload
(/root/reference/src/kitti.cpp:86-94) — is 4,541.  This soak runs a
multi-lap textured-plaza drive through the streaming driver + loop
closure + periodic checkpointing and measures what only scale shows:

  * host memory growth (VmRSS sampled every 50 frames — the stats and
    motions lists, the pending-futures buffer, the checkpoint writer);
  * spatial eviction in steady state (~2x more keyframes than store
    slots: every store update runs the closest-pair eviction);
  * multi-revisit closure: every post-lap-1 keyframe can close against
    lap 1 — the loop count should grow with every lap, not saturate at
    the first revisit;
  * drift at scale: open-chain VO error vs the pose-graph-optimized
    trajectory over 5 laps;
  * checkpoint cadence: 12 snapshots over the run, each carrying the
    full keyframe store.

Run:
    JAX_PLATFORMS=cpu python benchmarks/soak_long_run.py
        [--frames=600] [--laps=5] [--mode=loop|ba_loop]

One JSON line to stdout (artifact: benchmarks/soak_r5.json holds the
recorded runs); progress table to stderr.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def vm_rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from libviso_tpu.config import (
        DetectorConfig,
        PipelineConfig,
        RansacConfig,
    )
    from libviso_tpu.synthetic_world import generate_plaza_sequence
    from libviso_tpu.utils.checkpoint import CheckpointManager
    from libviso_tpu.utils.metrics import ate_rmse

    frames_n = 600
    laps = 5
    mode = "loop"
    for a in sys.argv[1:]:
        if a.startswith("--frames="):
            frames_n = int(a.split("=")[1])
        if a.startswith("--laps="):
            laps = int(a.split("=")[1])
        if a.startswith("--mode="):
            mode = a.split("=")[1]

    cfg = PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                                num_slots=512),
        ransac=RansacConfig(num_hypotheses=32))

    t_render0 = time.time()
    seq = generate_plaza_sequence(num_frames=frames_n, seed=0,
                                  circuits=laps)
    t_render = time.time() - t_render0
    print(f"rendered {frames_n} frames ({laps} laps) in {t_render:.0f}s, "
          f"RSS {vm_rss_mb():.0f} MB", file=sys.stderr, flush=True)

    rss_samples = []

    import tempfile

    with tempfile.TemporaryDirectory() as ckdir:
        mgr = CheckpointManager(ckdir, every=50)
        t0 = time.time()
        kw = dict(keyframe_every=3, min_gap=40, min_matches=40,
                  min_inliers=20, max_keyframes=128, seed=0,
                  checkpoint=mgr)

        # RSS sampling rides the keyframe cadence via a wrapped stream
        def sampling_frames():
            for t, fr in enumerate(seq.frames):
                if t % 50 == 0:
                    rss_samples.append((t, round(vm_rss_mb(), 1)))
                    print(f"  frame {t:4d}  RSS {rss_samples[-1][1]:7.1f} "
                          f"MB  t+{time.time() - t0:6.0f}s",
                          file=sys.stderr, flush=True)
                yield fr

        if mode == "ba_loop":
            from libviso_tpu.config import BAConfig
            from libviso_tpu.pipeline.ba_loop import run_windowed_ba_loop

            res = run_windowed_ba_loop(
                list(sampling_frames()), seq.P1, seq.P2, cfg,
                ba=BAConfig(window=8, stride=4), **kw)
        else:
            from libviso_tpu.pipeline.loop import run_with_loop_closure

            res = run_with_loop_closure(
                sampling_frames(), seq.P1, seq.P2, cfg=cfg, **kw)
        dt = time.time() - t0
        n_ck = len(os.listdir(ckdir))

    gt = seq.gt_poses
    T = len(gt)
    err_vo = np.linalg.norm(res.poses_vo[:T, :3, 3] - gt[:, :3, 3], axis=1)
    err_opt = np.linalg.norm(res.poses[:T, :3, 3] - gt[:, :3, 3], axis=1)
    lap_len = (frames_n - 1) // laps
    loops_per_lap = {}
    for le in res.loops:
        loops_per_lap.setdefault(le.frame_new // lap_len, 0)
        loops_per_lap[le.frame_new // lap_len] += 1

    out = {
        "mode": mode, "frames": frames_n, "laps": laps,
        "fps": round(frames_n / dt, 2),
        "render_s": round(t_render, 1),
        "run_s": round(dt, 1),
        "solved_frac": round(float(res.frame_ok[1:].mean()), 4),
        "loops": len(res.loops),
        "loops_per_lap": {str(k): v
                          for k, v in sorted(loops_per_lap.items())},
        "candidates_checked": len(res.candidates or []),
        "ate_vo": round(float(ate_rmse(res.poses_vo, gt)), 3),
        "ate_opt": round(float(ate_rmse(res.poses, gt)), 3),
        "endpoint_err_vo": round(float(err_vo[-1]), 3),
        "endpoint_err_opt": round(float(err_opt[-1]), 3),
        "rss_mb": rss_samples,
        "rss_growth_mb": round(rss_samples[-1][1] - rss_samples[0][1], 1)
        if len(rss_samples) > 1 else None,
        "checkpoints_on_disk": n_ck,
        "keyframes_offered": getattr(res, "keyframes_offered", None),
        "evictions": getattr(res, "evictions", None),
        "store_skipped": getattr(res, "store_skipped", None),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
