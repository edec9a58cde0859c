"""Synthetic stereo-sequence generator with ground-truth trajectory.

Rendering a textured landmark field through a known camera trajectory gives
an end-to-end oracle for the full image pipeline (detector -> descriptors ->
matching -> circle -> RANSAC/GN), the moving-camera generalization of the
reference's disabled synthetic-roundtrip test (test/test.cpp:51-114).  Also
the benchmark workload when no KITTI data is on disk (BASELINE.md).

Each landmark renders as a small fixed random pattern ("texture patch")
stamped at its projected pixel location; the pattern is constant across
frames and views so Sobel-patch descriptors match, and its sharp edges give
strong Harris responses.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from libviso_tpu.geometry.se3 import pose_vector_to_matrix


@dataclasses.dataclass
class SyntheticSequence:
    frames: List[Tuple[np.ndarray, np.ndarray]]  # (left, right) per frame
    gt_poses: np.ndarray       # (T, 4, 4) camera-to-world (frame 0 = I)
    gt_motions: np.ndarray     # (T, 6) prev->current motion vectors
    P1: np.ndarray             # (3, 4)
    P2: np.ndarray             # (3, 4)
    # per frame: (num_points, 4) columns [ul, vl, ur, vis] — exact float
    # left/right projections + visibility, the oracle for detector
    # localization tests (vr == vl on rectified pairs)
    gt_projections: List[np.ndarray] = None


def kitti_projections(f=718.856, cu=607.1928, cv=185.2157, base=0.5371657,
                      width=1241, height=376):
    P1 = np.array([[f, 0, cu, 0], [0, f, cv, 0], [0, 0, 1, 0]])
    P2 = P1.copy()
    P2[0, 3] = -f * base
    return P1, P2


def _stamp(img, x, y, patch):
    """Add a pattern patch centered at integer (x, y), clipped to bounds."""
    h, w = img.shape
    p = patch.shape[0]
    r = p // 2
    y0, y1 = y - r, y - r + p
    x0, x1 = x - r, x - r + p
    sy0, sx0 = max(0, -y0), max(0, -x0)
    y0, x0 = max(0, y0), max(0, x0)
    y1, x1 = min(h, y1), min(w, x1)
    if y1 <= y0 or x1 <= x0:
        return
    img[y0:y1, x0:x1] = patch[sy0:sy0 + (y1 - y0), sx0:sx0 + (x1 - x0)]


def _stamp_bilinear(img, xf, yf, patch):
    """Stamp a patch at a *fractional* center by bilinear splatting —
    landmarks then sit at true subpixel positions, which is what the
    subpixel-refinement path (BASELINE config 3) is meant to recover."""
    xi, yi = int(np.floor(xf)), int(np.floor(yf))
    ax, ay = xf - xi, yf - yi
    shifted = np.zeros((patch.shape[0] + 1, patch.shape[1] + 1),
                       patch.dtype)
    shifted[:-1, :-1] += (1 - ay) * (1 - ax) * patch
    shifted[:-1, 1:] += (1 - ay) * ax * patch
    shifted[1:, :-1] += ay * (1 - ax) * patch
    shifted[1:, 1:] += ay * ax * patch
    h, w = img.shape
    p = shifted.shape[0]
    r = patch.shape[0] // 2
    y0, x0 = yi - r, xi - r
    y1, x1 = y0 + p, x0 + p
    sy0, sx0 = max(0, -y0), max(0, -x0)
    y0c, x0c = max(0, y0), max(0, x0)
    y1c, x1c = min(h, y1), min(w, x1)
    if y1c <= y0c or x1c <= x0c:
        return
    # composite with max: at integral positions the splat's zero-padded
    # last row/column would otherwise OVERWRITE the noise background with
    # 0, stamping an artificial high-contrast L-border the integer-render
    # _stamp does not produce (it would confound subpixel-vs-integer
    # oracle comparisons with spurious Harris responses)
    dst = img[y0c:y1c, x0c:x1c]
    np.maximum(dst, shifted[sy0:sy0 + (y1c - y0c),
                            sx0:sx0 + (x1c - x0c)], out=dst)


def generate_sequence(num_frames=12, num_points=900, seed=0,
                      width=620, height=188, speed=0.8,
                      yaw_rate=0.004, patch=7,
                      f=360.0, base=0.54,
                      subpixel_render=False,
                      pattern_smooth=0.0,
                      trajectory=None) -> SyntheticSequence:
    """Render a forward-driving stereo sequence over a random landmark field.

    Args:
      num_frames: sequence length.
      num_points: landmarks (spread over a corridor the camera drives into).
      speed: forward translation per frame [m].
      yaw_rate: per-frame yaw increment [rad] (gentle curve).
      patch: landmark texture size in pixels (odd).
      pattern_smooth: Gaussian sigma (px) applied to the random texture
        patches.  Raw patterns are white noise — all their energy at
        Nyquist — so any subpixel resample decorrelates them, which no
        real image does (optics + sampling band-limit real texture).
        ~1.0 with ``subpixel_render=True`` is the realistic regime:
        descriptors stay stable across subpixel phases and the detector's
        quadratic refinement can actually recover the fractional
        position.  0 keeps the legacy sharp patterns.
      trajectory: optional (num_frames, 6) per-frame camera steps in the
        previous camera frame (overrides speed/yaw_rate — e.g. a closed
        circle for loop-closure tests); landmarks then scatter over the
        trajectory's bounding region instead of the forward corridor.
    """
    rng = np.random.default_rng(seed)
    cu, cv = width / 2.0, height / 2.0
    P1 = np.array([[f, 0, cu, 0], [0, f, cv, 0], [0, 0, 1, 0]])
    P2 = P1.copy()
    P2[0, 3] = -f * base

    # RNG consumption order is part of the de-facto data contract
    # (tests pin trajectories on seeded sequences): the default corridor
    # samples landmarks FIRST, exactly as it always did; only the
    # custom-trajectory path defers landmark sampling until the poses
    # are known.
    if trajectory is None:
        depth_span = speed * num_frames + 40.0
        Xw = np.stack([
            rng.uniform(-25, 25, num_points),
            rng.uniform(-4, 3, num_points),
            rng.uniform(3.0, depth_span, num_points),
        ], axis=-1)
    patterns = rng.integers(40, 256, size=(num_points, patch, patch)
                            ).astype(np.float32)
    if pattern_smooth > 0:
        from scipy.ndimage import gaussian_filter

        patterns = gaussian_filter(
            patterns, sigma=(0.0, pattern_smooth, pattern_smooth),
            mode="nearest")
        # restore per-pattern contrast lost to the low-pass (Harris
        # responses and descriptor SNR stay comparable to the sharp case)
        lo = patterns.min(axis=(1, 2), keepdims=True)
        hi = patterns.max(axis=(1, 2), keepdims=True)
        patterns = 40.0 + (patterns - lo) / np.maximum(hi - lo, 1e-6) * 215.0

    # Trajectory: per-frame camera motion M_k expressed in the previous
    # camera frame (forward +z with a gentle yaw).  World-from-camera poses
    # compose as C_k = C_{k-1} @ M_k; the quantity the solver estimates is
    # Tr_k = M_k^-1 (points move opposite to the camera in camera coords),
    # and the reference's pose chain pose_k = pose_{k-1} @ Tr_k^-1 then
    # reproduces C_k exactly.
    if trajectory is None:
        cam_steps = np.zeros((num_frames, 6))
        for k in range(1, num_frames):
            cam_steps[k] = [0.0,
                            yaw_rate * (1 + 0.2 * np.sin(k / 3.0)), 0.0,
                            0.02 * np.sin(k / 5.0), 0.0, speed]
    else:
        cam_steps = np.asarray(trajectory, np.float64)
        assert cam_steps.shape == (num_frames, 6)
    M = np.asarray(pose_vector_to_matrix(cam_steps))  # (T, 4, 4)
    gt_poses = np.zeros_like(M)
    gt_poses[0] = np.eye(4)
    for k in range(1, num_frames):
        gt_poses[k] = gt_poses[k - 1] @ M[k]

    # Custom trajectories: a box around everywhere the camera goes so
    # features exist in view on every leg of e.g. a closed loop.
    if trajectory is not None:
        pos = gt_poses[:, :3, 3]
        lo = pos.min(axis=0) - np.array([30.0, 4.0, 30.0])
        hi = pos.max(axis=0) + np.array([30.0, 3.0, 30.0])
        Xw = np.stack([
            rng.uniform(lo[0], hi[0], num_points),
            rng.uniform(-4, 3, num_points),
            rng.uniform(lo[2], hi[2], num_points),
        ], axis=-1)
    from libviso_tpu.geometry.se3 import matrix_to_pose_vector
    motions = np.asarray(matrix_to_pose_vector(np.linalg.inv(M)))

    frames = []
    gt_projections = []
    for k in range(num_frames):
        W = np.linalg.inv(gt_poses[k])  # camera-from-world
        Xc = Xw @ W[:3, :3].T + W[:3, 3]
        z = Xc[:, 2]
        vis = z > 1.0
        ul = f * Xc[:, 0] / z + cu
        vl = f * Xc[:, 1] / z + cv
        ur = f * (Xc[:, 0] - base) / z + cu

        im1 = rng.normal(16.0, 2.0, size=(height, width)).astype(np.float32)
        im2 = rng.normal(16.0, 2.0, size=(height, width)).astype(np.float32)
        order = np.argsort(-z)  # paint far landmarks first (near overwrite)
        for i in order:
            if not vis[i]:
                continue
            if subpixel_render:
                _stamp_bilinear(im1, float(ul[i]), float(vl[i]), patterns[i])
                _stamp_bilinear(im2, float(ur[i]), float(vl[i]), patterns[i])
            else:
                x1, y1 = int(round(ul[i])), int(round(vl[i]))
                x2 = int(round(ur[i]))
                _stamp(im1, x1, y1, patterns[i])
                _stamp(im2, x2, y1, patterns[i])
        frames.append((np.clip(im1, 0, 255), np.clip(im2, 0, 255)))
        gt_projections.append(
            np.stack([ul, vl, ur, vis.astype(np.float64)], axis=-1))

    return SyntheticSequence(frames=frames, gt_poses=gt_poses,
                             gt_motions=motions, P1=P1, P2=P2,
                             gt_projections=gt_projections)
