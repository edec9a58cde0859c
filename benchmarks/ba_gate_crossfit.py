"""Cross-fit gate statistic experiment (r5 follow-up to the
landmark-mediation finding).

The shipped gate reprojects FROZEN stereo-initial landmarks, which is
blind to the 64% of BA's gain that flows through re-estimated
landmarks (benchmarks/ba_landmark_mediation.py).  The candidate fix:
a FRAME-WISE CROSS-FIT statistic — for EACH pose set (refined vs VO),
refit landmarks on the TRAINING frames only (landmark-only BA,
``freeze_poses=True``), then score reprojection of those landmarks on
the HELD-OUT frames.  Each side gets its own best landmarks, so
landmark-mediated gains can register; texture-phase refits should
generalize poorly across frames and still be caught.

This script replays the cached front-end of the 24-row calibration
battery and reports, per window, the cross-fit paired ratio alongside
the shipped frozen-X0 halves, then sweeps accept margins for both
statistics and compares capture/harm using the same criteria as
benchmarks/ba_gate_experiment.py.

    JAX_PLATFORMS=cpu python benchmarks/ba_gate_crossfit.py [--seeds=12]
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
    from libviso_tpu.solvers.bundle_adjust import (
        _project_all,
        bundle_adjust,
    )
    from libviso_tpu.synthetic import Imaging
    from libviso_tpu.synthetic_world import generate_world_sequence
    from libviso_tpu.utils.metrics import ate_rmse

    n_seeds = 12
    out_path = "benchmarks/ba_gate_crossfit_r5.jsonl"
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
    Wn = BA.window

    # train/test frame split inside a window: frame 0 is the gauge and
    # always trains; odd frames train, even (>0) frames test
    train_f = jnp.asarray([(k == 0) or (k % 2 == 1) for k in range(Wn)])

    def crossfit_ratio(poses_cand, poses_base, prob_X0, obs, mask, calib):
        """Paired held-out-frame error ratio with per-side landmark
        refits on the training frames."""
        def side(poses):
            m_train = mask & train_f[:, None]
            fit = bundle_adjust(poses, prob_X0, obs, m_train, calib,
                                iters=6, freeze_poses=True)
            pred, _ = _project_all(poses, fit.landmarks, calib)
            err = jnp.sqrt(jnp.sum((obs - pred) ** 2, axis=-1))
            return err

        e_c = side(poses_cand)
        e_b = side(poses_base)
        m_test = mask & (~train_f)[:, None]
        ratio = e_c / jnp.maximum(e_b, 1e-6)
        # mean-of-halves (parity split over landmarks), same form as
        # the shipped gate
        L = prob_X0.shape[0]
        split = jnp.arange(L) % 2 == 0
        def med(mask_h):
            flat = jnp.where(mask_h, ratio, jnp.inf).reshape(-1)
            s = jnp.sort(flat)
            n = jnp.sum(mask_h)
            return s[jnp.clip((n - 1) // 2, 0, s.shape[0] - 1)], n
        m0, n0 = med(m_test & split[None, :])
        m1, n1 = med(m_test & ~split[None, :])
        return m0, m1, n0, n1

    fe = {}
    rows = []
    fout = open(out_path, "w")
    for regime, kw in REGIMES.items():
        for seed in range(1, 1 + n_seeds):
            seq = generate_world_sequence(seed=seed, **SHAPE, **kw)
            calib = Calib.from_projections(seq.P1, seq.P2)
            F = F_from_P_host(seq.P1, seq.P2)
            if "fn" not in fe:
                fe["fn"] = jax.jit(build_batched_odometry(
                    calib, jnp.asarray(F), CFG, with_tracks=True))
                fe["build"] = jax.jit(
                    lambda tr, m: build_window_problem(
                        tr.kp1_xy, tr.kp2_xy, tr.mlr_idx, tr.mlr_valid,
                        tr.m11_idx, tr.m11_valid, tr.X, m, n_slots,
                        circ_valid=tr.circ_valid))
                fe["refine"] = jax.jit(
                    lambda prob: refine_window_motions(
                        prob, calib, iters=BA.iters,
                        outlier_px=BA.outlier_px,
                        rerank_px=BA.rerank_px))
                fe["cross"] = jax.jit(
                    lambda pc, pb, X0, obs, mask: crossfit_ratio(
                        pc, pb, X0, obs, mask, calib))

            frames = list(seq.frames)
            key = jax.random.PRNGKey(seed)
            # per-window: refine (ungated), then BOTH statistics
            cache = []
            for w, s in enumerate(starts):
                e = min(s + BA.window, T)
                ims1 = jnp.stack([jnp.asarray(np.asarray(frames[i][0]))
                                  for i in range(s, e)])
                ims2 = jnp.stack([jnp.asarray(np.asarray(frames[i][1]))
                                  for i in range(s, e)])
                out, tracks = fe["fn"](ims1, ims2,
                                       jax.random.fold_in(key, w))
                prob = fe["build"](tracks, out.motions)
                ref = fe["refine"](prob)
                # reconstruct the final BA mask for the crossfit (the
                # stage-1 gate mask; stage-2 re-rank not replicated —
                # the statistic needs the track population, not BA's
                # exact final weighting)
                from libviso_tpu.solvers.bundle_adjust import ba_cost  # noqa
                keep = np.asarray(prob.mask).sum(axis=0) >= 2
                mask = jnp.asarray(np.asarray(prob.mask)
                                   & keep[None, :])
                # candidate poses: compose refined motions
                Ts = pose_vector_to_matrix(ref.motions)
                def compose(carry, Tm):
                    nxt = Tm @ carry
                    return nxt, nxt
                eye = jnp.eye(4, dtype=np.float32)
                _, rest = jax.lax.scan(compose, eye, Ts[1:])
                from libviso_tpu.geometry.se3 import matrix_to_pose_vector
                poses_c = matrix_to_pose_vector(
                    jnp.concatenate([eye[None], rest], axis=0))
                m0, m1, n0, n1 = fe["cross"](poses_c, prob.poses0,
                                             prob.X0, prob.obs, mask)
                cache.append(dict(
                    s=s, e=e, vo=np.asarray(out.motions),
                    ok=np.asarray(out.ok),
                    nc=np.asarray(out.num_circle),
                    refined=np.asarray(ref.motions),
                    ref_ok=bool(ref.ok),
                    cam_ok=np.asarray(ref.cam_obs) >= BA.min_cam_obs,
                    frozen=(float(ref.holdout_half0),
                            float(ref.holdout_half1)),
                    cross=(float(m0), float(m1), int(n0), int(n1)),
                ))

            def stitch(accept_fn):
                motions = np.zeros((T, 6), np.float32)
                oks = np.zeros((T,), bool)
                for c in cache:
                    ok_m = (c["ref_ok"] and accept_fn(c)) \
                        & c["cam_ok"] & np.roll(c["cam_ok"], 1)
                    ok_m = np.asarray(ok_m) if np.ndim(ok_m) else \
                        np.full(Wn, ok_m)
                    ok_m[0] = False
                    use = np.where(ok_m[:, None], c["refined"], c["vo"])
                    motions[c["s"] + 1:c["e"]] = use[1:]
                    constrained = c["nc"][1:] >= CFG.min_circle_matches
                    oks[c["s"] + 1:c["e"]] = (c["ok"][1:]
                                              | (ok_m[1:] & constrained))
                oks[0] = False
                Ts = pose_vector_to_matrix(jnp.asarray(motions))
                return np.asarray(chain_motions(Ts, jnp.asarray(oks)))

            row = {"regime": regime, "seed": seed}
            # vo / plain references
            row["vo"] = round(float(ate_rmse(
                stitch(lambda c: False), seq.gt_poses)), 4)
            row["plain"] = round(float(ate_rmse(
                stitch(lambda c: True), seq.gt_poses)), 4)
            for m in (0.85, 0.9, 0.95):
                row[f"froz{int(m*100)}"] = round(float(ate_rmse(stitch(
                    lambda c, m=m: (c["frozen"][0] + c["frozen"][1]) / 2
                    <= m), seq.gt_poses)), 4)
            for m in (0.85, 0.9, 0.95, 1.0):
                row[f"cross{int(m*100)}"] = round(float(ate_rmse(stitch(
                    lambda c, m=m: (c["cross"][0] + c["cross"][1]) / 2
                    <= m and c["cross"][2] >= 20 and c["cross"][3] >= 20),
                    seq.gt_poses)), 4)
            row["window_stats"] = [
                {"frozen": c["frozen"], "cross": c["cross"][:2]}
                for c in cache]
            rows.append(row)
            fout.write(json.dumps(row) + "\n")
            fout.flush()
            print(f"{regime} {seed} vo={row['vo']} plain={row['plain']} "
                  f"froz90={row['froz90']} cross90={row['cross90']}",
                  file=sys.stderr, flush=True)
    fout.close()

    tags = (["plain"] + [f"froz{m}" for m in (85, 90, 95)]
            + [f"cross{m}" for m in (85, 90, 95, 100)])
    print(f"\n{'variant':<10} {'worse':>6} {'capt':>6} {'meanATE':>9}",
          file=sys.stderr)
    for tag in tags:
        worse = sum(1 for r in rows if r[tag] > r["vo"] * 1.10 + 0.005)
        capt = sum(1 for r in rows
                   if r[tag] <= min(r["vo"], r["plain"]) * 1.10 + 0.005)
        print(f"{tag:<10} {worse:>3}/{len(rows):<3} {capt:>3}/{len(rows):<3}"
              f" {np.mean([r[tag] for r in rows]):9.4f}", file=sys.stderr)
    print(f"{'vo':<10} {'':>6} {'':>6} "
          f"{np.mean([r['vo'] for r in rows]):9.4f}", file=sys.stderr)


if __name__ == "__main__":
    main()
