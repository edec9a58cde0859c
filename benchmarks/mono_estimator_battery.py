"""Mono estimator accuracy battery (VERDICT r4 #5).

The r4 bound statement: further mono speed needs a better ESTIMATOR —
both measured cheapenings (8pt gate pass, half hypothesis pool) traded
ATE in at least one regime.  This battery measures whether the r5
estimator upgrades (sigma-marginalized 'magsac' scoring + soft chi^2
refit weights, geometry/essential.py) close those regressions, regime
by regime:

  rich    — 1200 pts (the config where 8pt-gate was already safe)
  sparse  — 900 pts (the measured 4x regression of the 8pt gate)
  noise3/6 — rich + sensor noise
  rep     — sparse repetitive texture (pattern_smooth high, fewer pts)

Variants: estimator (msac/hard vs magsac/soft) x first_pass (same/8pt)
x hypothesis pool (64/32).  sim3 ATE per (regime, seed); medians per
variant to stderr.

    JAX_PLATFORMS=cpu python benchmarks/mono_estimator_battery.py
        [--seeds=3] [--out=...]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from libviso_tpu.config import MonoConfig
    from libviso_tpu.pipeline.mono import run_mono_sequence
    from libviso_tpu.synthetic import generate_sequence
    from libviso_tpu.utils.metrics import ate_rmse

    n_seeds = 3
    out_path = "benchmarks/mono_estimator_battery_r5.jsonl"
    for a in sys.argv[1:]:
        if a.startswith("--seeds="):
            n_seeds = int(a.split("=")[1])
        if a.startswith("--out="):
            out_path = a.split("=")[1]

    K = np.array([[360.0, 0.0, 208.0], [0.0, 360.0, 80.0],
                  [0.0, 0.0, 1.0]])
    T = 8
    speeds = np.array([0.0, 0.8, 0.5, 1.1, 0.7, 1.2, 0.6, 1.0])
    traj = np.zeros((T, 6))
    traj[:, 5] = speeds
    traj[1:, 1] = 0.004
    base = dict(num_frames=T, width=416, height=160, f=360.0,
                trajectory=traj, subpixel_render=True, patch=9)

    REGIMES = {
        "rich": dict(num_points=1200, pattern_smooth=1.0),
        "sparse": dict(num_points=900, pattern_smooth=1.0),
        "noise3": dict(num_points=1200, pattern_smooth=1.0,
                       noise_sigma=3.0),
        "noise6": dict(num_points=1200, pattern_smooth=1.0,
                       noise_sigma=6.0),
        "rep": dict(num_points=900, pattern_smooth=2.5),
    }
    VARIANTS = {
        "r4_default": MonoConfig(scoring="msac", soft_refit=False),
        "r4_fp8": MonoConfig(scoring="msac", soft_refit=False,
                             first_pass="8pt"),
        "mag_soft": MonoConfig(scoring="magsac", soft_refit=True),
        "mag_soft_fp8": MonoConfig(scoring="magsac", soft_refit=True,
                                   first_pass="8pt"),
        "mag_soft_fp8_h32": MonoConfig(scoring="magsac", soft_refit=True,
                                       first_pass="8pt",
                                       num_hypotheses=32),
        "mag_fp8": MonoConfig(scoring="magsac", soft_refit=False,
                              first_pass="8pt"),
        "soft_fp8": MonoConfig(scoring="msac", soft_refit=True,
                               first_pass="8pt"),
    }

    rows = []
    fout = open(out_path, "w")
    for regime, rkw in REGIMES.items():
        for seed in (3, 11, 21, 31, 41)[:n_seeds]:
            kw = dict(base, **rkw)
            noise = kw.pop("noise_sigma", 0.0)
            seq = generate_sequence(seed=seed, **kw)
            frames = [np.asarray(f[0]) for f in seq.frames]
            if noise > 0:
                rng = np.random.default_rng(seed + 999)
                frames = [np.clip(f + rng.normal(0, noise, f.shape),
                                  0, 255).astype(np.float32)
                          for f in frames]
            row = {"regime": regime, "seed": seed}
            for vname, mono in VARIANTS.items():
                res = run_mono_sequence(frames, K, seed=seed, mono=mono)
                row[vname] = round(float(ate_rmse(
                    res.poses, seq.gt_poses, align="sim3")), 4)
                row[vname + "_solved"] = int(res.frame_ok[1:].sum())
            rows.append(row)
            fout.write(json.dumps(row) + "\n")
            fout.flush()
            print(f"{regime} {seed} done", file=sys.stderr, flush=True)
    fout.close()

    print(f"\n{'variant':<18}" + "".join(f"{r:>9}" for r in REGIMES)
          + f"{'overall':>9}", file=sys.stderr)
    for vname in VARIANTS:
        meds = []
        for regime in REGIMES:
            vals = [r[vname] for r in rows if r["regime"] == regime]
            meds.append(np.median(vals))
        overall = np.median([r[vname] for r in rows])
        print(f"{vname:<18}" + "".join(f"{m:>9.4f}" for m in meds)
              + f"{overall:>9.4f}", file=sys.stderr)


if __name__ == "__main__":
    main()
