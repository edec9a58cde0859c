"""Photographic-texture-class robustness sweep (VERDICT r4 #3).

The r3 world textures were band-limited noise + rectangles — power
spectrum slope ~ -3.9 where photographs sit at ~ -2 (Ruderman/Field).
Round 5 adds spectral-synthesis 1/f texture classes, each isolating a
real-world failure mode (synthetic_world.py):

  brick   — repetitive lattice (ratio-test aliasing one pitch away)
  foliage — isotropic 1/f clutter (unstable corners, self-similar
            descriptors)
  glass   — texture starvation (budget collapses onto mullion lines)
  photo   — mixed draw (suburb block: all of the above side by side)

This sweep measures the detector/matcher/VO envelope per class:

    JAX_PLATFORMS=cpu python benchmarks/world_texture_sweep.py
        [--seeds=4] [--noise]

One JSON line per (class, seed): ATE, detector corner count, stereo
matches, circle matches, inliers, support ratio, failures, and the
rendered-frame spectrum slope.  Table to stderr.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def spectrum_slope(img):
    img = np.asarray(img, np.float64)
    img = img - img.mean()
    F = np.abs(np.fft.rfft2(img)) ** 2
    fy = np.fft.fftfreq(img.shape[0])[:, None]
    fx = np.fft.rfftfreq(img.shape[1])[None, :]
    f = np.sqrt(fy * fy + fx * fx).ravel()
    P = F.ravel()
    m = (f > 0.01) & (f < 0.4)
    A = np.vstack([np.log(f[m]), np.ones(int(m.sum()))]).T
    sol = np.linalg.lstsq(A, np.log(P[m] + 1e-12), rcond=None)[0]
    return float(sol[0])


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from libviso_tpu.config import (
        DetectorConfig,
        PipelineConfig,
        RansacConfig,
    )
    from libviso_tpu.pipeline.stereo import run_stereo_sequence
    from libviso_tpu.synthetic import Imaging
    from libviso_tpu.synthetic_world import generate_world_sequence
    from libviso_tpu.utils.metrics import ate_rmse

    n_seeds = 4
    noise = False
    for a in sys.argv[1:]:
        if a.startswith("--seeds="):
            n_seeds = int(a.split("=")[1])
        if a == "--noise":
            noise = True

    CFG = PipelineConfig(
        detector=DetectorConfig(max_features=480, nbinx=12, nbiny=4,
                                num_slots=512),
        ransac=RansacConfig(num_hypotheses=32))
    kw = dict(width=416, height=160, num_frames=12)
    if noise:
        kw["imaging"] = Imaging(noise_sigma=6.0)

    CLASSES = ["facade", "brick", "foliage", "glass", "photo"]
    rows = []
    for cls in CLASSES:
        for seed in range(1, 1 + n_seeds):
            seq = generate_world_sequence(seed=seed, wall_texture=cls,
                                          **kw)
            res = run_stereo_sequence(seq.frames, seq.P1, seq.P2, CFG,
                                      seed=seed)
            body = [s for s in res.stats[1:] if "num_inliers" in s]
            sups = [s["num_inliers"] / max(s["num_circle"], 1)
                    for s in body if s["ok"] and s["num_circle"] > 0]
            row = {
                "class": cls, "seed": seed,
                "noise": noise,
                "ate": round(float(ate_rmse(res.poses, seq.gt_poses)), 4),
                "failed": int((~res.frame_ok[1:]).sum()),
                "kp_mean": round(float(np.mean(
                    [s["num_kp1"] for s in body])), 1),
                "lr_mean": round(float(np.mean(
                    [s["num_lr"] for s in body])), 1),
                "circle_mean": round(float(np.mean(
                    [s["num_circle"] for s in body])), 1),
                "inliers_mean": round(float(np.mean(
                    [s["num_inliers"] for s in body])), 1),
                "support_ratio_min": (round(min(sups), 3)
                                      if sups else None),
                "sharpness_mean": round(float(np.mean(
                    [s["sharpness"] for s in body])), 4),
                "spectrum_slope": round(
                    spectrum_slope(np.asarray(seq.frames[5][0])), 2),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    hdr = (f"{'class':<8} {'seed':>4} {'ate':>8} {'fail':>4} {'kp':>6} "
           f"{'lr':>6} {'circ':>6} {'inl':>6} {'supmin':>6} {'slope':>6}")
    print(hdr, file=sys.stderr)
    for r in rows:
        print(f"{r['class']:<8} {r['seed']:>4} {r['ate']:8.4f} "
              f"{r['failed']:>4} {r['kp_mean']:>6.0f} {r['lr_mean']:>6.0f} "
              f"{r['circle_mean']:>6.0f} {r['inliers_mean']:>6.0f} "
              f"{str(r['support_ratio_min']):>6} "
              f"{r['spectrum_slope']:>6.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()
