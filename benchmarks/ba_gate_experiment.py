"""BA acceptance-gate recalibration experiment (VERDICT r4 #1).

The r4 gate (paired holdout ratio <= 0.85 on both split halves) rejected
ALL windows in 19/24 sweep rows and forfeited measured 2.6x accuracy wins
(benchmarks/world_ba_sweep_r4.jsonl).  The failure is structural: rows
where plain BA HURTS ATE (clean seed 1/5, noise6 seed 9) show holdout
ratios ~0.95 — BA re-fits texture-phase drift and moves poses along
reprojection-flat directions, so a reprojection statistic reads "slightly
better" while ATE doubles.  No threshold on that statistic separates the
harmful rows from the helpful ones.

This experiment therefore attacks the HARM at its source instead of
gating it: a weak VO-anchor prior on all window poses (shrinkage along
reprojection-flat directions — where the data term is weak the anchor
wins, where observations genuinely disagree with VO the data wins), and
re-evaluates gate criteria on top of the regularized solution:

  variants = vo_prior_strength x gate criterion
  criteria: off, one-sided margins, two-sided reject-only-if-clearly-worse

Design: the front-end (detect/match/RANSAC per window) is variant-
independent and dominates runtime — it runs ONCE per (regime, seed) and
each variant replays only the refine+stitch chain (the chain must be
replayed because window w's marginalization prior anchors at window
w-1's ACCEPTED motions).

Run:  JAX_PLATFORMS=cpu python benchmarks/ba_gate_experiment.py
      [--seeds=12] [--out=benchmarks/ba_gate_experiment_r5.jsonl]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def replay_variant(cache, T, window, stride, starts, refine, prior_w6,
                   vo_w6, accept_fn, min_cam_obs, min_circle):
    """Re-run the refine+stitch chain for one variant.

    Mirrors run_windowed_ba's stitching loop exactly (pipeline/
    windowed.py) with the acceptance decision delegated to accept_fn
    (host-side, fed the refine outputs)."""
    import jax
    import jax.numpy as jnp

    from libviso_tpu.geometry.se3 import chain_motions, pose_vector_to_matrix

    motions = np.zeros((T, 6), np.float32)
    oks = np.zeros((T,), bool)
    motions_vo = np.zeros((T, 6), np.float32)
    n_rejected = 0
    for w, s in enumerate(starts):
        e = min(s + window, T)
        prob, vo_motions, out_ok, num_circle = cache[w]
        if w > 0:
            prev_e = min(starts[w - 1] + window, T)
            overlap = max(0, min(prev_e - s, e - s))
        else:
            overlap = 0
        ref = refine(prob, vo_motions, jnp.asarray(motions[s:e]),
                     jnp.asarray(overlap, jnp.int32),
                     jnp.asarray(prior_w6), jnp.asarray(vo_w6))
        refined = np.asarray(ref.motions)
        cam_ok = np.asarray(ref.cam_obs) >= min_cam_obs
        accepted = bool(ref.ok) and accept_fn(
            float(ref.holdout_half0), float(ref.holdout_half1))
        if not accepted:
            n_rejected += 1
        motion_ok = accepted & cam_ok & np.roll(cam_ok, 1)
        motion_ok[0] = False
        use = np.where(motion_ok[:, None], refined, np.asarray(vo_motions))
        motions[s + 1:e] = use[1:]
        motions_vo[s + 1:e] = np.asarray(vo_motions)[1:]
        constrained = np.asarray(num_circle)[1:] >= min_circle
        oks[s + 1:e] = np.asarray(out_ok)[1:] | (motion_ok[1:] & constrained)
    oks[0] = False
    Ts = pose_vector_to_matrix(jnp.asarray(motions))
    poses = np.asarray(chain_motions(Ts, jnp.asarray(oks)))
    Ts_vo = pose_vector_to_matrix(jnp.asarray(motions_vo))
    poses_vo = np.asarray(chain_motions(Ts_vo, jnp.asarray(oks)))
    return poses, poses_vo, n_rejected


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
    from libviso_tpu.pipeline.windowed import _jitted_fns
    from libviso_tpu.synthetic import Imaging
    from libviso_tpu.synthetic_world import generate_world_sequence
    from libviso_tpu.utils.metrics import ate_rmse

    n_seeds = 12
    seed0 = 1
    out_path = "benchmarks/ba_gate_experiment_r5.jsonl"
    for a in sys.argv[1:]:
        if a.startswith("--seeds="):
            n_seeds = int(a.split("=")[1])
        if a.startswith("--seed0="):
            seed0 = int(a.split("=")[1])
        if a.startswith("--out="):
            out_path = a.split("=")[1]

    SHAPE = dict(width=416, height=160, num_frames=12)
    CFG = PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                                num_slots=512),
        ransac=RansacConfig(num_hypotheses=32),
    )
    BA = BAConfig(window=6, stride=3)
    REGIMES = {"clean": {}, "noise6": dict(imaging=Imaging(noise_sigma=6.0))}

    VO_STRENGTHS = [0.0, 0.05, 0.1, 0.2, 0.5]
    CRITERIA = {
        "off": lambda h0, h1: True,
        "m085": lambda h0, h1: h0 <= 0.85 and h1 <= 0.85,     # r4 default
        "m095": lambda h0, h1: h0 <= 0.95 and h1 <= 0.95,
        "two102": lambda h0, h1: max(h0, h1) <= 1.02,          # reject only
        "two100": lambda h0, h1: max(h0, h1) <= 1.00,          # if worse
    }
    if "--fine" in sys.argv:
        # margin fine-sweep around the coarse run's winner (m095):
        # both-halves margins + mean-of-halves forms, prior off
        VO_STRENGTHS = [0.0]
        CRITERIA = {"off": lambda h0, h1: True}
        for m in (0.90, 0.92, 0.93, 0.94, 0.95, 0.96, 0.97, 0.98, 1.00):
            CRITERIA[f"m{int(m*100):03d}"] = (
                lambda h0, h1, m=m: h0 <= m and h1 <= m)
        for m in (0.90, 0.92, 0.94, 0.96):
            CRITERIA[f"mean{int(m*100):03d}"] = (
                lambda h0, h1, m=m: (h0 + h1) / 2 <= m)

    window, stride = BA.window, BA.stride
    T = SHAPE["num_frames"]
    starts = list(range(0, max(T - window, 0) + 1, stride))
    if starts[-1] + window < T:
        starts.append(T - window)

    rows = []
    fout = open(out_path, "w")
    for regime, kw in REGIMES.items():
        for seed in range(seed0, seed0 + n_seeds):
            seq = generate_world_sequence(seed=seed, **SHAPE, **kw)
            calib = Calib.from_projections(seq.P1, seq.P2)
            F = F_from_P_host(seq.P1, seq.P2)
            fn, build, refine = _jitted_fns(
                calib, np.ascontiguousarray(F, np.float64).tobytes(), CFG,
                "xla", BA.iters, BA.outlier_px, BA.rerank_px,
                BA.holdout_modulus, BA.gate_margin)
            f2 = calib.f * calib.f
            unit_w6 = np.array(
                [70.0 * f2] * 3 + [70.0 * f2 / 225.0] * 3, np.float32)

            # stage 1: front-end per window (variant-independent)
            frames = list(seq.frames)
            key = jax.random.PRNGKey(seed)
            cache = {}
            for w, s in enumerate(starts):
                e = min(s + window, T)
                ims1 = jnp.stack([jnp.asarray(np.asarray(frames[i][0]))
                                  for i in range(s, e)])
                ims2 = jnp.stack([jnp.asarray(np.asarray(frames[i][1]))
                                  for i in range(s, e)])
                out, tracks = fn(ims1, ims2, jax.random.fold_in(key, w))
                prob = build(tracks, out.motions)
                cache[w] = (prob, out.motions, np.asarray(out.ok),
                            np.asarray(out.num_circle))

            # stage 2: variants
            row = {"regime": regime, "seed": seed}
            for vo_w in VO_STRENGTHS:
                vo_w6 = vo_w * unit_w6
                for cname, crit in CRITERIA.items():
                    poses, poses_vo, nrej = replay_variant(
                        cache, T, window, stride, starts, refine,
                        1.0 * unit_w6, vo_w6, crit, BA.min_cam_obs,
                        CFG.min_circle_matches)
                    tag = f"v{vo_w:g}_{cname}"
                    row[tag] = round(float(ate_rmse(poses, seq.gt_poses)), 5)
                    row[tag + "_rej"] = nrej
            row["vo"] = round(float(ate_rmse(poses_vo, seq.gt_poses)), 5)
            rows.append(row)
            fout.write(json.dumps(row) + "\n")
            fout.flush()
            print(f"{regime} seed {seed}: vo={row['vo']:.4f} "
                  f"plain={row['v0_off']:.4f}", file=sys.stderr, flush=True)

    # summary: per variant, the judge's criteria
    print(f"\n{'variant':<14} {'worse':>6} {'captures':>9} {'meanATE':>9}",
          file=sys.stderr)
    for vo_w in VO_STRENGTHS:
        for cname in CRITERIA:
            tag = f"v{vo_w:g}_{cname}"
            worse = sum(1 for r in rows
                        if r[tag] > r["vo"] * 1.10 + 0.005)
            # captures: row ATE within 10%+5mm of min(vo, plain-BA)
            capt = sum(1 for r in rows
                       if r[tag] <= min(r["vo"], r["v0_off"]) * 1.10 + 0.005)
            mean_ate = np.mean([r[tag] for r in rows])
            print(f"{tag:<14} {worse:>3}/{len(rows):<3} "
                  f"{capt:>4}/{len(rows):<3} {mean_ate:>9.4f}",
                  file=sys.stderr)
    mean_vo = np.mean([r["vo"] for r in rows])
    print(f"{'vo':<14} {'':>6} {'':>9} {mean_vo:>9.4f}", file=sys.stderr)
    fout.close()


if __name__ == "__main__":
    main()
