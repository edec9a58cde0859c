"""Monocular calibrated SfM / visual odometry pipeline (SURVEY.md C3).

The reference's ``calibratedSFM`` (src/viso.cpp:1332-1398) detects Harris
corners (radius 9, 1500 features), matches consecutive frames within a
10 px radius, estimates an essential matrix, re-matches under the induced
epipolar gate — and then stops, leaving P1/P2 at identity forever
(src/viso.cpp:1393-1395).  This module completes the capability: pose
recovery by cheirality voting and scale-ambiguous trajectory chaining
(unit-norm per-frame translation — monocular VO cannot observe scale).

Note the reference reads the principal point from K(0,3)/K(1,3), an
out-of-bounds access on a 3x3 K (src/viso.cpp:1347, SURVEY.md §3.2); we
read K(0,2)/K(1,2).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, NamedTuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from libviso_tpu.config import PipelineConfig
from libviso_tpu.geometry.essential import (
    normalize_points,
    ransac_essential,
    recover_pose,
    undistort_points,
)
from libviso_tpu.ops.features import Keypoints, detect_and_describe
from libviso_tpu.ops.matching import match_descriptors


class MonoState(NamedTuple):
    kp: Keypoints
    desc: jax.Array


class MonoOutput(NamedTuple):
    transform: jax.Array   # (4, 4) current -> previous camera (unit-norm t)
    ok: jax.Array          # () bool
    num_matches: jax.Array
    num_inliers: jax.Array


def empty_mono_state(cfg: PipelineConfig, dtype=jnp.float32) -> MonoState:
    n = cfg.detector.num_slots
    d = cfg.detector.descriptor_dim_padded
    kp = Keypoints(xy=jnp.zeros((n, 2), dtype),
                   response=jnp.zeros((n,), dtype),
                   valid=jnp.zeros((n,), bool))
    return MonoState(kp=kp, desc=jnp.zeros((n, d), dtype))


def build_mono_step(K, cfg: PipelineConfig, num_hypotheses=None,
                    sampson_thresh=2e-5, backend: str = "xla",
                    method: str = "5pt", D=None):
    """Jittable mono frame step.

    Pipeline per frame (reference order, completed):
      detect/describe -> short-radius temporal match (viso.cpp:1365-1367)
      -> normalize via K^-1 (viso.cpp:1382-1383)
      -> batched-RANSAC essential matrix: Nister 5-point by default
         (exact findEssentialMat parity, geometry/five_point.py) or 8pt
      -> epipolar re-match with the induced gate (viso.cpp:1386-1390)
      -> re-estimate E on the re-matched set -> recover (R, t) [new]
    """
    if num_hypotheses is None:
        # 5pt yields up to 22 scored models per sample; 64 samples give
        # ~1400 candidates — the same robustness as 128 8pt samples at
        # half the solver cost
        num_hypotheses = 64 if method == "5pt" else 128
    K = np.asarray(K, np.float64)
    Kj = jnp.asarray(K, jnp.float32)
    Dj = None if D is None else jnp.asarray(D, jnp.float32)

    def _norm(x):
        if Dj is None:
            return normalize_points(x, Kj)
        return undistort_points(x, Kj, Dj)
    # F = K^-T E K^-1 (viso.cpp:1385) for the pixel-space epipolar re-match
    Kinv = np.linalg.inv(K)

    def step(state: MonoState, im, key):
        kp, d = detect_and_describe(im, cfg.detector)
        m = match_descriptors(kp, d, state.kp, state.desc,
                              cfg.temporal_match, backend=backend)

        n_slots = cfg.detector.num_slots
        idx_safe = jnp.clip(m.idx, 0, n_slots - 1)
        x_cur = kp.xy                          # (N, 2) current pixels
        x_prev = state.kp.xy[idx_safe]         # matched previous pixels

        xn_cur = _norm(x_cur)
        xn_prev = _norm(x_prev)

        k1, k2 = jax.random.split(key)
        est1 = ransac_essential(k1, xn_cur, xn_prev, valid=m.valid,
                                num_hypotheses=num_hypotheses,
                                sampson_thresh=sampson_thresh,
                                method=method)

        # epipolar re-match under the induced fundamental matrix
        F = jnp.asarray(Kinv.T, jnp.float32) @ est1.E @ jnp.asarray(
            Kinv, jnp.float32)
        rematch_cfg = dataclasses.replace(
            cfg.stereo_match, radius=cfg.temporal_match.radius,
            use_epipolar=True, use_ratio=True, ratio=0.9,
            metric=cfg.temporal_match.metric)
        m2 = match_descriptors(kp, d, state.kp, state.desc, rematch_cfg,
                               F=F, backend=backend)
        idx2_safe = jnp.clip(m2.idx, 0, n_slots - 1)
        xn_cur2 = _norm(kp.xy)
        xn_prev2 = _norm(state.kp.xy[idx2_safe])

        est2 = ransac_essential(k2, xn_cur2, xn_prev2, valid=m2.valid,
                                num_hypotheses=num_hypotheses,
                                sampson_thresh=sampson_thresh,
                                method=method)

        R, t, good, n_good = recover_pose(est2.E, xn_cur2, xn_prev2,
                                          valid=est2.inliers)
        # transform maps current-camera points to previous-camera points:
        # exactly the pose_{k-1 <- k} factor chained by the host loop.
        T = jnp.zeros((4, 4), R.dtype).at[:3, :3].set(R)
        T = T.at[:3, 3].set(t).at[3, 3].set(1.0)
        ok = est1.ok & est2.ok & (n_good >= 10)

        return MonoState(kp=kp, desc=d), MonoOutput(
            transform=T, ok=ok,
            num_matches=jnp.sum(m.valid.astype(jnp.int32)),
            num_inliers=est2.num_inliers)

    return step


@dataclasses.dataclass
class MonoResult:
    poses: np.ndarray     # (T, 4, 4) scale-ambiguous (unit steps)
    frame_ok: np.ndarray
    stats: list



@functools.lru_cache(maxsize=8)
def _jitted_mono_step(k_bytes: bytes, cfg, backend: str, method: str, D):
    """One jitted mono step per configuration (repeat calls skip the
    recompile; see stereo.py::_jitted_step)."""
    K = np.frombuffer(k_bytes, np.float64).reshape(3, 3)
    return jax.jit(build_mono_step(K, cfg, backend=backend, method=method,
                                   D=D))

def run_mono_sequence(frames: Iterable, K,
                      cfg: PipelineConfig = None,
                      seed: int = 0, backend: str = "xla",
                      method: str = "5pt", D=None) -> MonoResult:
    """Host driver for the monocular pipeline (calib_sfm.cpp analog).

    ``D``: optional (k1, k2, p1, p2) lens distortion; None matches the
    reference's empty-distortion undistortPoints call (viso.cpp:1382).
    """
    if cfg is None:
        cfg = PipelineConfig.mono()
    step = _jitted_mono_step(
        np.ascontiguousarray(K, np.float64).tobytes(), cfg, backend,
        method, None if D is None else tuple(float(d) for d in D))
    key = jax.random.PRNGKey(seed)

    state = empty_mono_state(cfg)
    # collect device outputs as futures; materializing per frame would
    # cost a host round-trip each step and serialize the dispatch pipeline
    outs = []
    for t, im in enumerate(frames):
        state, out = step(state, jnp.asarray(im), jax.random.fold_in(key, t))
        outs.append(out)

    pose = np.eye(4)
    poses, oks, stats = [], [], []
    for t, out in enumerate(outs):
        ok = bool(out.ok) and t > 0
        if ok:
            pose = pose @ np.asarray(out.transform)
        poses.append(pose.copy())
        oks.append(ok)
        stats.append({
            "frame": t, "ok": ok,
            "num_matches": int(out.num_matches),
            "num_inliers": int(out.num_inliers),
        })
    return MonoResult(poses=np.stack(poses), frame_ok=np.asarray(oks, bool),
                      stats=stats)
