"""Quantify the acceptance gate's landmark-mediation blind spot
(VERDICT r4 weak #7).

The gate's holdout statistic reprojects the FROZEN stereo-initial
landmarks X0, so it can only see improvements that flow through the
POSES; a window whose gain comes from re-estimated landmarks looks
like noise to it.  r4 acknowledged this blind spot (sprite BA tests
pass gate=False) but never measured its share on the world battery.

Instrument: ``bundle_adjust(freeze_landmarks=True)`` (r5) — pose-only
GN against the fixed X0, i.e. exactly the model class the gate can
evaluate.  Per (regime, seed) row this script stitches three
trajectories from one cached front-end pass:

    vo      — the front-end motions
    frozen  — pose-only BA applied unconditionally
    full    — standard BA (poses + landmarks) applied unconditionally

and reports each window's holdout half-ratios under both refinements.
Decomposition: (vo - full) is BA's total gain; (vo - frozen) is the
pose-mediated share the gate can in principle see; the remainder is
landmark-mediated and structurally invisible to the frozen-X0
statistic.

    JAX_PLATFORMS=cpu python benchmarks/ba_landmark_mediation.py
        [--seeds=6]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from libviso_tpu.config import (
        BAConfig,
        Calib,
        DetectorConfig,
        PipelineConfig,
        RansacConfig,
    )
    from libviso_tpu.geometry.mvg import F_from_P_host
    from libviso_tpu.geometry.se3 import chain_motions, pose_vector_to_matrix
    from libviso_tpu.pipeline.batched import build_batched_odometry
    from libviso_tpu.pipeline.refine import (
        build_window_problem,
        refine_window_motions,
    )
    from libviso_tpu.pipeline.windowed import window_starts
    from libviso_tpu.synthetic import Imaging
    from libviso_tpu.synthetic_world import generate_world_sequence
    from libviso_tpu.utils.metrics import ate_rmse

    n_seeds = 6
    out_path = "benchmarks/ba_landmark_mediation_r5.jsonl"
    for a in sys.argv[1:]:
        if a.startswith("--seeds="):
            n_seeds = int(a.split("=")[1])
        if a.startswith("--out="):
            out_path = a.split("=")[1]

    SHAPE = dict(width=416, height=160, num_frames=12)
    CFG = PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                                num_slots=512),
        ransac=RansacConfig(num_hypotheses=32))
    BA = BAConfig(window=6, stride=3)
    REGIMES = {"clean": {}, "noise6": dict(imaging=Imaging(noise_sigma=6.0))}

    T = SHAPE["num_frames"]
    starts = window_starts(T, BA.window, BA.stride)
    n_slots = CFG.detector.num_slots

    rows = []
    fout = open(out_path, "w")
    fe = {}

    def stitch(cache, variant_refine):
        motions = np.zeros((T, 6), np.float32)
        oks = np.zeros((T,), bool)
        halves = []
        for w, s in enumerate(starts):
            e = min(s + BA.window, T)
            prob, vo_motions, out_ok, num_circle = cache[w]
            ref = variant_refine(prob)
            refined = np.asarray(ref.motions)
            cam_ok = np.asarray(ref.cam_obs) >= BA.min_cam_obs
            motion_ok = bool(ref.ok) & cam_ok & np.roll(cam_ok, 1)
            motion_ok[0] = False
            use = np.where(motion_ok[:, None], refined,
                           np.asarray(vo_motions))
            motions[s + 1:e] = use[1:]
            constrained = (np.asarray(num_circle)[1:]
                           >= CFG.min_circle_matches)
            oks[s + 1:e] = (np.asarray(out_ok)[1:]
                            | (motion_ok[1:] & constrained))
            halves.append((round(float(ref.holdout_half0), 3),
                           round(float(ref.holdout_half1), 3)))
        oks[0] = False
        Ts = pose_vector_to_matrix(jnp.asarray(motions))
        return np.asarray(chain_motions(Ts, jnp.asarray(oks))), halves

    for regime, kw in REGIMES.items():
        for seed in range(1, 1 + n_seeds):
            seq = generate_world_sequence(seed=seed, **SHAPE, **kw)
            calib = Calib.from_projections(seq.P1, seq.P2)
            F = F_from_P_host(seq.P1, seq.P2)
            key = ("fe",)
            if key not in fe:
                fe[key] = jax.jit(build_batched_odometry(
                    calib, jnp.asarray(F), CFG, with_tracks=True))
                fe["build"] = jax.jit(
                    lambda tr, m: build_window_problem(
                        tr.kp1_xy, tr.kp2_xy, tr.mlr_idx, tr.mlr_valid,
                        tr.m11_idx, tr.m11_valid, tr.X, m, n_slots,
                        circ_valid=tr.circ_valid))
                fe["full"] = jax.jit(lambda prob: refine_window_motions(
                    prob, calib, iters=BA.iters,
                    outlier_px=BA.outlier_px, rerank_px=BA.rerank_px))
                fe["frozen"] = jax.jit(lambda prob: refine_window_motions(
                    prob, calib, iters=BA.iters,
                    outlier_px=BA.outlier_px, rerank_px=BA.rerank_px,
                    freeze_landmarks=True))
            fn = fe[key]
            frames = list(seq.frames)
            rkey = jax.random.PRNGKey(seed)
            cache = {}
            for w, s in enumerate(starts):
                e = min(s + BA.window, T)
                ims1 = jnp.stack([jnp.asarray(np.asarray(frames[i][0]))
                                  for i in range(s, e)])
                ims2 = jnp.stack([jnp.asarray(np.asarray(frames[i][1]))
                                  for i in range(s, e)])
                out, tracks = fn(ims1, ims2, jax.random.fold_in(rkey, w))
                prob = fe["build"](tracks, out.motions)
                cache[w] = (prob, out.motions, np.asarray(out.ok),
                            np.asarray(out.num_circle))

            vo_motions = np.zeros((T, 6), np.float32)
            vo_oks = np.zeros((T,), bool)
            for w, s in enumerate(starts):
                e = min(s + BA.window, T)
                _, m, ok, _ = cache[w]
                vo_motions[s + 1:e] = np.asarray(m)[1:]
                vo_oks[s + 1:e] = np.asarray(ok)[1:]
            vo_oks[0] = False
            Ts = pose_vector_to_matrix(jnp.asarray(vo_motions))
            poses_vo = np.asarray(chain_motions(Ts, jnp.asarray(vo_oks)))

            p_full, h_full = stitch(cache, fe["full"])
            p_frozen, h_frozen = stitch(cache, fe["frozen"])
            gt = seq.gt_poses
            row = {
                "regime": regime, "seed": seed,
                "vo": round(float(ate_rmse(poses_vo, gt)), 4),
                "full": round(float(ate_rmse(p_full, gt)), 4),
                "frozen": round(float(ate_rmse(p_frozen, gt)), 4),
                "halves_full": h_full,
                "halves_frozen": h_frozen,
            }
            rows.append(row)
            fout.write(json.dumps(row) + "\n")
            fout.flush()
            print(f"{regime} {seed}: vo={row['vo']} full={row['full']} "
                  f"frozen={row['frozen']}", file=sys.stderr, flush=True)
    fout.close()

    vo = np.array([r["vo"] for r in rows])
    fu = np.array([r["full"] for r in rows])
    fz = np.array([r["frozen"] for r in rows])
    tot = vo - fu
    pose_part = vo - fz
    print(f"\nrows={len(rows)}  mean ATE: vo {vo.mean():.4f}  "
          f"full {fu.mean():.4f}  frozen {fz.mean():.4f}", file=sys.stderr)
    print(f"mean gain: full {tot.mean():.4f}  pose-only "
          f"{pose_part.mean():.4f}  -> landmark-mediated share "
          f"{(1 - pose_part.mean() / max(tot.mean(), 1e-9)) * 100:.0f}%"
          if tot.mean() > 0 else "full BA shows no net gain",
          file=sys.stderr)


if __name__ == "__main__":
    main()
