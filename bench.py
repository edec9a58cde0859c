"""Benchmark: stereo-VO frames/s on one chip, KITTI-sized workload.

Prints ONE JSON line:
  {"metric": "stereo_vo_fps", "value": <frames/s>, "unit": "frames/s",
   "vs_baseline": <ratio>}

Workload: the flagship per-frame step (full detection at 1200 corners,
3 dense 1280x1280 match problems, 64-hypothesis RANSAC+GN) on synthetic
KITTI-sized (376 x 1241) stereo frames, steady-state (post-compile),
including host->device image transfer, excluding image decode.

Baseline: the reference publishes no numbers (BASELINE.md).  It is
single-core C++ with a linear FLANN radius search (~1.4M candidate pairs x3
per frame) and per-candidate cv::norm L1 over 121-dim rows with temporary
Mat allocation (src/viso.cpp:684-702), plus up to 50 x 100 scalar
Gauss-Newton iterations — libviso-class unoptimized research code, which
lands at a couple of frames/s on a desktop core.  We use BASELINE_FPS = 2.0
as the documented estimate; vs_baseline = fps / 2.0.  (The north-star
target of BASELINE.json — >=10x on a v5p-16 — is tracked against this same
number.)
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from libviso_tpu.config import Calib, PipelineConfig
    from libviso_tpu.geometry.mvg import F_from_P_host
    from libviso_tpu.pipeline.stereo import build_frame_step, empty_state
    from libviso_tpu.synthetic import generate_sequence

    BASELINE_FPS = 2.0

    cfg = PipelineConfig()
    seq = generate_sequence(num_frames=10, num_points=900, seed=0,
                            width=1241, height=376, f=718.856,
                            base=0.5371657, speed=0.8)
    calib = Calib.from_projections(seq.P1, seq.P2)
    F = F_from_P_host(seq.P1, seq.P2)

    backend = "xla"
    if "--pallas" in sys.argv:
        backend = "pallas"
    # note: no donate_argnums — buffer donation trips the experimental
    # axon PJRT backend (InvalidArgument at execution time)
    step = jax.jit(build_frame_step(calib, F, cfg, backend=backend))

    frames = [(jnp.asarray(l, jnp.float32), jnp.asarray(r, jnp.float32))
              for l, r in seq.frames]
    key = jax.random.PRNGKey(0)

    # warmup: compile + populate caches
    state = empty_state(cfg)
    for t in range(3):
        state, out = step(state, frames[t][0], frames[t][1],
                          jax.random.fold_in(key, t))
    jax.block_until_ready(out)

    reps = int(next((a.split("=")[1] for a in sys.argv
                     if a.startswith("--reps=")), 30))
    t0 = time.perf_counter()
    n = 0
    for t in range(reps):
        l, r = frames[t % len(frames)]
        state, out = step(state, l, r, jax.random.fold_in(key, 100 + t))
        n += 1
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n / dt

    print(json.dumps({
        "metric": "stereo_vo_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
