"""Sequence-level sliding-window BA odometry (BASELINE config 4/5).

Drives the frame-batched front-end over a sequence in overlapping windows,
refines each window's motions with the Schur-complement BA, and stitches
the refined relative motions into a global trajectory.  Window w covers
frames [w*stride, w*stride + window); consecutive windows share
(window - stride) frames and the refined motions of the *later* window win
on the overlap (they are conditioned on more future evidence).

Distribution (config 5): windows are independent problems — the same
mapping used for sequence-chunk DP applies, with the landmark axis of each
BA additionally shardable over the 'model' mesh axis
(solvers/bundle_adjust.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from libviso_tpu.config import Calib, PipelineConfig
from libviso_tpu.geometry.mvg import F_from_P_host
from libviso_tpu.geometry.se3 import chain_motions, pose_vector_to_matrix
from libviso_tpu.pipeline.batched import build_batched_odometry
from libviso_tpu.pipeline.refine import (
    build_window_problem,
    refine_window_motions,
)


import functools


@functools.lru_cache(maxsize=8)
def _jitted_fns(calib: Calib, f_bytes: bytes, cfg: PipelineConfig,
                backend: str, ba_iters: int):
    """jit the three per-window programs ONCE per configuration.

    run_windowed_ba may be called repeatedly (multi-sequence runs, tests);
    fresh jax.jit closures per call would recompile the full front-end
    every time (~20 s on the tunneled chip)."""
    F = np.frombuffer(f_bytes, np.float64).reshape(3, 3)
    n_slots = cfg.detector.num_slots
    fn = jax.jit(build_batched_odometry(calib, F, cfg, backend=backend,
                                        with_tracks=True))
    refine = jax.jit(lambda prob: refine_window_motions(prob, calib,
                                                        iters=ba_iters))
    build = jax.jit(lambda tr, motions: build_window_problem(
        tr.kp1_xy, tr.kp2_xy, tr.mlr_idx, tr.mlr_valid,
        tr.m11_idx, tr.m11_valid, tr.X, motions, n_slots,
        circ_valid=tr.circ_valid))
    return fn, build, refine


@dataclasses.dataclass
class WindowedResult:
    poses: np.ndarray       # (T, 4, 4) BA-refined trajectory
    poses_vo: np.ndarray    # (T, 4, 4) front-end-only trajectory
    motions: np.ndarray     # (T, 6) refined motions
    frame_ok: np.ndarray    # (T,)
    window_costs: list      # (initial, final, ok) per window
    processed: int = 0      # frames computed THIS run (excludes
    #                         checkpoint-restored windows)


def run_windowed_ba(frames, P1, P2, cfg: PipelineConfig = PipelineConfig(),
                    window: int = 8, stride: int = 4, ba_iters: int = 10,
                    seed: int = 0, backend: str = "xla",
                    checkpoint=None,
                    fingerprint_scope: str = "") -> WindowedResult:
    """Stereo VO + sliding-window BA over a full sequence.

    Args:
      frames: list of (left, right) image pairs (host arrays).
      window: frames per BA window.
      stride: window start spacing (stride < window = overlap).
      checkpoint: optional utils.checkpoint.CheckpointManager; progress is
        snapshotted every ``checkpoint.every`` completed WINDOWS and a run
        resumes after the last one (per-window keys are fold_in(key, w),
        so resume is bit-exact).  Fingerprint covers cfg/window/stride/
        ba_iters/seed/backend + ``fingerprint_scope``.
    """
    frames = list(frames)
    T = len(frames)
    calib = Calib.from_projections(P1, P2)
    F = F_from_P_host(P1, P2)
    fn, build, refine = _jitted_fns(
        calib, np.ascontiguousarray(F, np.float64).tobytes(), cfg,
        backend, ba_iters)

    # Ship each frame to the device once per residency (uint8 stays
    # uint8 — 4x less tunnel/DMA traffic; the detector casts on-device).
    # Overlapping windows stack device-resident frames instead of
    # re-uploading the (window - stride)-frame overlap each time —
    # upload was ~70% of the steady per-window cost on the development
    # tunnel.  The cache holds only the live window span (windows are
    # processed in increasing start order), so device memory stays
    # O(window), not O(sequence), and checkpoint-resumed runs upload
    # nothing for already-covered windows.
    dev_cache = {}

    def window_stacks(s, e):
        for i in list(dev_cache):
            if i < s:
                del dev_cache[i]
        for i in range(s, e):
            if i not in dev_cache:
                dev_cache[i] = (
                    jax.device_put(jnp.asarray(np.asarray(frames[i][0]))),
                    jax.device_put(jnp.asarray(np.asarray(frames[i][1]))))
        return (jnp.stack([dev_cache[i][0] for i in range(s, e)]),
                jnp.stack([dev_cache[i][1] for i in range(s, e)]))

    key = jax.random.PRNGKey(seed)
    motions = np.zeros((T, 6), np.float32)
    oks = np.zeros((T,), bool)
    motions_vo = np.zeros((T, 6), np.float32)
    window_costs = []

    starts = list(range(0, max(T - window, 0) + 1, stride))
    if not starts:
        starts = [0]
    # ensure the tail is covered
    if starts[-1] + window < T:
        starts.append(T - window)

    w0 = 0
    fingerprint = None
    if checkpoint is not None:
        from libviso_tpu.utils.checkpoint import (
            Checkpoint,
            config_fingerprint,
        )

        fingerprint = config_fingerprint(
            cfg, seed, backend,
            scope=f"ba:{window}:{stride}:{ba_iters}:T{T}:"
                  f"{fingerprint_scope}")
        ck = checkpoint.latest()
        if ck is not None:
            if ck.fingerprint != fingerprint:
                raise ValueError(
                    "checkpoint fingerprint mismatch (different cfg/"
                    f"window/stride/seed/backend/sequence/scope): "
                    f"{ck.fingerprint} != {fingerprint}")
            if len(ck.motions) != T:  # belt and braces vs the T in scope
                raise ValueError(
                    f"checkpoint covers {len(ck.motions)} frames but the "
                    f"run has {T}; resume with the same frame list")
            w0 = ck.next_frame            # next WINDOW index here
            motions = np.array(ck.motions, np.float32)
            oks = np.array(ck.oks, bool)
            motions_vo = np.array(ck.state_leaves[0], np.float32)
            window_costs = [tuple(c) for c in ck.stats]

    def _snapshot(next_window):
        from libviso_tpu.utils.checkpoint import Checkpoint

        checkpoint.save(Checkpoint(
            next_frame=next_window,
            motions=motions.astype(np.float64),
            oks=oks,
            state_leaves=[motions_vo],
            stats=[list(c) for c in window_costs],
            fingerprint=fingerprint,
        ))

    for w, s in enumerate(starts):
        if w < w0:  # restored from checkpoint
            continue
        e = min(s + window, T)
        ims1, ims2 = window_stacks(s, e)
        out, tracks = fn(ims1, ims2, jax.random.fold_in(key, w))
        prob = build(tracks, out.motions)
        refined, c0, c1, ok_ba = refine(prob)
        refined = np.asarray(refined)
        out_ok = np.asarray(out.ok)
        use = np.asarray(jnp.where(ok_ba, refined, out.motions))
        window_costs.append((float(c0), float(c1), bool(ok_ba)))
        # local index 0 is the window's halo frame (no motion)
        motions[s + 1:e] = use[1:]
        motions_vo[s + 1:e] = np.asarray(out.motions)[1:]
        # BA convergence vouches only for frames it actually observed:
        # a frame whose tracks all broke (e.g. blackout) has an
        # unconstrained camera and must stay not-ok even when the window
        # BA around it converged
        constrained = np.asarray(out.num_circle)[1:] >= cfg.min_circle_matches
        oks[s + 1:e] = out_ok[1:] | (bool(ok_ba) & constrained)
        if checkpoint is not None and (w + 1) % checkpoint.every == 0:
            _snapshot(w + 1)

    if checkpoint is not None and window_costs:
        _snapshot(len(starts))

    oks[0] = False
    Ts = pose_vector_to_matrix(jnp.asarray(motions))
    poses = np.asarray(chain_motions(Ts, jnp.asarray(oks)))
    Ts_vo = pose_vector_to_matrix(jnp.asarray(motions_vo))
    poses_vo = np.asarray(chain_motions(Ts_vo, jnp.asarray(oks)))
    processed = 0 if w0 >= len(starts) else T - starts[w0]
    return WindowedResult(poses=poses, poses_vo=poses_vo, motions=motions,
                          frame_ok=oks, window_costs=window_costs,
                          processed=processed)
