"""Harris-corner detection and Sobel-patch description (SURVEY.md C4, C5).

Replaces the reference's OpenCV calls (``cv::cornerHarris``
src/viso.cpp:930, ``cv::Sobel`` src/viso.cpp:1010) with XLA convolutions and
the per-bin ``nth_element`` top-k scan (src/viso.cpp:947-974) with one
``lax.top_k`` over reshaped bins — output is a fixed-size padded keypoint
tensor with a validity mask, the shape contract every downstream op relies
on (SURVEY.md §7 design stance).

Semantics follow OpenCV exactly where the reference depends on them:
  - Sobel kernels are the separable smooth x derivative pairs
    ([1,2,1]/[-1,0,1] at ksize 3; [1,4,6,4,1]/[-1,-2,0,2,1] at ksize 5).
  - Borders are BORDER_REFLECT_101 (numpy/jnp ``mode='reflect'``).
  - cornerHarris on 8-bit input scales the derivatives by
    1 / (2^(ksize-1) * block_size * 255) and box-filters the structure
    tensor with an *unnormalized* block_size window.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from libviso_tpu.config import DetectorConfig

_SOBEL_SMOOTH = {3: (1.0, 2.0, 1.0), 5: (1.0, 4.0, 6.0, 4.0, 1.0)}
_SOBEL_DERIV = {3: (-1.0, 0.0, 1.0), 5: (-1.0, -2.0, 0.0, 2.0, 1.0)}


def _conv1d(img, kernel, axis):
    """Correlate a (H, W) image with a 1-D kernel along ``axis``,
    REFLECT_101 border.

    Implemented as k shifted multiply-adds instead of ``lax.conv``: a
    single-channel NCHW conv maps terribly onto the TPU convolution path
    (measured ~6 ms per 3-tap conv on a 376x1241 frame), while shifted adds
    are pure VPU elementwise work that XLA fuses across the whole Harris
    pipeline (~20x faster end-to-end).
    """
    k = len(kernel)
    r = k // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (r, r)
    padded = jnp.pad(img, pad, mode="reflect")
    H, W = img.shape
    out = None
    for i, c in enumerate(kernel):
        if c == 0:
            continue
        if axis == 0:
            shifted = jax.lax.slice(padded, (i, 0), (i + H, W))
        else:
            shifted = jax.lax.slice(padded, (0, i), (H, i + W))
        term = shifted if c == 1 else shifted * jnp.asarray(c, img.dtype)
        out = term if out is None else out + term
    return out


def _conv1d_multi(stack, kernels, axis):
    """Correlate a (C, H, W) stack with per-channel same-length 1-D
    kernels along ``axis`` (1 = rows, 2 = columns), REFLECT_101 border.

    One ``jnp.pad`` materialization serves all C channels (vs one per
    channel with C separate ``_conv1d`` calls), and the k shifted
    multiply-adds run with per-channel coefficient vectors — the whole
    stage fuses into a single VPU pass.  Used by ``harris_response``,
    whose 10 single-channel conv passes dominated the detector's time.
    """
    k = len(kernels[0])
    r = k // 2
    pad = [(0, 0), (0, 0), (0, 0)]
    pad[axis] = (r, r)
    padded = jnp.pad(stack, pad, mode="reflect")
    C, H, W = stack.shape
    out = None
    for i in range(k):
        coefs = jnp.asarray([kern[i] for kern in kernels], stack.dtype)
        if axis == 1:
            shifted = jax.lax.slice(padded, (0, i, 0), (C, i + H, W))
        else:
            shifted = jax.lax.slice(padded, (0, 0, i), (C, H, i + W))
        term = shifted * coefs[:, None, None]
        out = term if out is None else out + term
    return out


def _gauss_taps(sigma: float, truncate: float = 4.0):
    """Normalized truncated-Gaussian taps matching
    scipy.ndimage.gaussian_filter's kernel (both unsharp_mask and
    blur_metric were tuned against that operator — one builder keeps
    them from diverging)."""
    radius = int(truncate * sigma + 0.5)
    raw = [math.exp(-0.5 * (i / sigma) ** 2)
           for i in range(-radius, radius + 1)]
    s = sum(raw)
    return tuple(v / s for v in raw)


def unsharp_mask(img, sigma: float, amount: float):
    """Separable Gaussian unsharp mask: ``img + amount*(img - G(img))``,
    clipped to [0, 255].

    Defocus mitigation (DetectorConfig.sharpen_sigma): restores the
    corner contrast that heavy blur destroys — the one measured regime
    where the solver goes CONFIDENTLY wrong (docs/realism.md).  Taps
    match scipy.ndimage.gaussian_filter (truncate=4), under which the
    gain was measured; border is REFLECT_101 like every other conv here.
    Static kernel at trace time; the shifted adds are VPU work XLA
    fuses with the downstream Sobel/Harris convs.
    """
    taps = _gauss_taps(sigma)
    low = _conv1d(_conv1d(img, taps, 0), taps, 1)
    return jnp.clip(img + amount * (img - low), 0.0, 255.0)


def blur_metric(img):
    """Absolute per-frame defocus measure: normalized gradient energy
    ``sqrt(mean |∇G1(I)|^2) / std(G1(I))`` of the sigma-1-smoothed image.

    Measured on the synthetic oracle (docs/realism.md): ~0.37 on sharp
    frames INDEPENDENT of texture smoothness and of sensor noise up to
    sigma 12 (the pre-smoothing removes the noise floor from both
    numerator and denominator), falling to ~0.24 at blur sigma 2 and
    ~0.19-0.21 at sigma 3 — a scene-independent trigger for
    DetectorConfig.sharpen_auto.  Units ~1/px (gradient per unit
    contrast), so it transfers across exposure levels by construction.
    """
    taps = _gauss_taps(1.0)
    sm = _conv1d(_conv1d(img, taps, 0), taps, 1)
    gx = sm[:, 1:] - sm[:, :-1]
    gy = sm[1:, :] - sm[:-1, :]
    ge = jnp.sqrt(jnp.mean(gx * gx) + jnp.mean(gy * gy))
    return ge / (jnp.std(sm) + 1e-6)


def sobel_derivatives(img, ksize=3, dx=True, scale=1.0):
    """OpenCV-compatible Sobel derivative of a (H, W) image.

    ``dx=True`` gives d/dx (horizontal derivative — the descriptor's source
    signal, src/viso.cpp:1010), else d/dy.  Correlation (not convolution)
    ordering matches OpenCV's filter2D semantics; these kernels are
    symmetric/antisymmetric so only the derivative axis sign matters and it
    matches.
    """
    smooth = _SOBEL_SMOOTH[ksize]
    deriv = _SOBEL_DERIV[ksize]
    if dx:
        out = _conv1d(_conv1d(img, deriv, axis=1), smooth, axis=0)
    else:
        out = _conv1d(_conv1d(img, deriv, axis=0), smooth, axis=1)
    if scale != 1.0:
        out = out * jnp.asarray(scale, img.dtype)
    return out


def _box_sum(img, block_size):
    """Unnormalized box filter (OpenCV boxFilter normalize=false)."""
    ones = (1.0,) * block_size
    return _conv1d(_conv1d(img, ones, axis=0), ones, axis=1)


def harris_response(img, block_size=3, aperture=5, k=0.04,
                    input_is_8bit=True):
    """Harris corner response, cv::cornerHarris semantics.

    M = box_sum(block) of [Dx^2, DxDy; DxDy, Dy^2];
    R = det(M) - k * trace(M)^2   (src/viso.cpp:929-931).

    Args:
      img: (H, W) float image with 0..255 range (KITTI 8-bit grayscale).
      input_is_8bit: include OpenCV's /255 in the derivative scale.
    """
    scale = 1.0 / ((1 << (aperture - 1)) * block_size)
    if input_is_8bit:
        scale /= 255.0
    smooth = _SOBEL_SMOOTH[aperture]
    deriv = _SOBEL_DERIV[aperture]
    # Channel-stacked separable stages: ONE padded buffer per stage for
    # both derivatives (then one for all three structure-tensor sums)
    # instead of 10 single-channel conv passes — ~2x fewer VPU passes /
    # materializations.  dy evaluates as deriv_y(smooth_x(img)) rather
    # than the textbook smooth_x(deriv_y(img)); separable correlation
    # commutes, so the result differs only at f32 rounding (the cv2
    # golden tests bound it).
    s1 = _conv1d_multi(jnp.stack([img, img]), [deriv, smooth], axis=2)
    d = _conv1d_multi(s1, [smooth, deriv], axis=1)
    dx = d[0] * jnp.asarray(scale, img.dtype)
    dy = d[1] * jnp.asarray(scale, img.dtype)
    prods = jnp.stack([dx * dx, dx * dy, dy * dy])
    ones = [(1.0,) * block_size] * 3
    s = _conv1d_multi(_conv1d_multi(prods, ones, 1), ones, 2)
    sxx, sxy, syy = s[0], s[1], s[2]
    det = sxx * syy - sxy * sxy
    trace = sxx + syy
    return det - k * trace * trace


# shared small-k exact top-k (k rounds of argmax+mask, bit-identical to
# lax.top_k; see ops/topk.py for the cost analysis + tie semantics)
from libviso_tpu.ops.topk import ITERATIVE_MAX_K as _SHARED_ITERATIVE_MAX_K
from libviso_tpu.ops.topk import topk_iterative as _topk_iterative

# crossover cap — module-local name so tests can force the lax.top_k
# path, but initialized from the single measured constant in ops/topk.py
# so a retune there propagates here.
_TOPK_ITERATIVE_MAX_K = _SHARED_ITERATIVE_MAX_K


class Keypoints(NamedTuple):
    """Fixed-size keypoint tensor (padded; ``valid`` marks real corners)."""

    xy: jax.Array        # (num_slots, 2) float32 pixel coordinates (x, y)
    response: jax.Array  # (num_slots,) |Harris response|
    valid: jax.Array     # (num_slots,) bool


def detect_harris_binned(img, cfg: DetectorConfig = DetectorConfig(),
                         zero_eps=1e-30) -> Keypoints:
    """Spatially-uniform Harris corners: per-bin top-k of |response|.

    The reference grids the image into nbinx x nbiny bins with strides
    floor(W/nbinx), floor(H/nbiny) — pixels beyond ``nbin*stride`` on the
    right/bottom edge are never visited (src/viso.cpp:933-953); zero
    responses are skipped (src/viso.cpp:956); each bin keeps its
    ``max_features/(nbinx*nbiny)`` largest |response| corners via
    nth_element (src/viso.cpp:961-963).  Here: crop, reshape to bins, one
    ``lax.top_k`` per bin — all bins in parallel.

    Returns ``cfg.num_slots`` slots; slots beyond the detected corners have
    ``valid=False`` and coordinates (0, 0).
    """
    img = jnp.asarray(img)
    H, W = img.shape
    resp = harris_response(img, cfg.block_size, cfg.aperture, cfg.harris_k)
    sy, sx = H // cfg.nbiny, W // cfg.nbinx
    k = cfg.corners_per_bin

    a = jnp.abs(resp[: cfg.nbiny * sy, : cfg.nbinx * sx])
    if cfg.nms_radius > 0:
        # keep only local maxima of |response|: window max-pool equality
        # (ties keep every tied pixel — top-k then dedups by budget).
        w = 2 * cfg.nms_radius + 1
        pooled = jax.lax.reduce_window(
            a, -jnp.inf, jax.lax.max, (w, w), (1, 1), "SAME")
        a = jnp.where(a >= pooled, a, 0.0)
    bins = a.reshape(cfg.nbiny, sy, cfg.nbinx, sx)
    bins = bins.transpose(0, 2, 1, 3).reshape(cfg.nbiny * cfg.nbinx, sy * sx)
    if k <= _TOPK_ITERATIVE_MAX_K:
        vals, flat_idx = _topk_iterative(bins, k)  # (nbins, k)
    else:
        vals, flat_idx = jax.lax.top_k(bins, k)

    by = jnp.arange(cfg.nbiny * cfg.nbinx) // cfg.nbinx
    bx = jnp.arange(cfg.nbiny * cfg.nbinx) % cfg.nbinx
    y = by[:, None] * sy + flat_idx // sx
    x = bx[:, None] * sx + flat_idx % sx

    xy = jnp.stack([x, y], axis=-1).reshape(-1, 2).astype(img.dtype)
    response = vals.reshape(-1)
    valid = response > zero_eps

    n = cfg.nbiny * cfg.nbinx * k
    pad = cfg.num_slots - n
    if pad < 0:
        raise ValueError(
            f"num_slots={cfg.num_slots} < detected budget {n}")
    xy = jnp.pad(xy, ((0, pad), (0, 0)))
    response = jnp.pad(response, (0, pad))
    valid = jnp.pad(valid, (0, pad))
    xy = jnp.where(valid[:, None], xy, 0.0)
    return Keypoints(xy=xy, response=response, valid=valid)


def _banded_gather(padded, x, y, cfg: DetectorConfig, H, W, i8: bool):
    """Bin-banded one-hot patch gather (round 4, VERDICT r3 #1).

    ``detect_harris_binned`` emits slots in (biny, binx, k) order, so
    slot group b = by*nbinx + bx only ever reads a static
    (sy + d + 1) x (sx + d + 1) window of the padded Sobel image (the
    +d-1 patch apron, +2 for rounding/subpixel drift).  Exploiting that
    static locality shrinks BOTH 0/1-selection matmuls from image-sized
    to bin-sized — ~16x less effective MXU work and ~10x less selector
    traffic than the dense formulation at KITTI scale (the dense
    column selector alone is a 70 MB materialization; the banded pair
    is ~8 MB).  Values are still single selections, so the result is
    bitwise identical to the dense 'onehot'/'take' paths (tested).

    The row-selection runs as a dense (k*d, sh) x (sh, k*d) matmul per
    bin and keeps the k diagonal (d, d) blocks — the k^2 - k off-
    diagonal blocks are waste, but at k ~ 10 the padded bin matmuls
    still do ~16x less work than the dense image-sized selection, and
    a per-slot einsum at these shapes pads each (d, sh) tile to the
    MXU's (8, 128) granularity anyway.

    Returns (n, d*d) descriptors for the n = nbinx*nbiny*k real slots
    (callers pad the num_slots tail, which is invalid by construction).
    """
    r = cfg.descriptor_radius
    d = 2 * r + 1
    Hp, Wp = padded.shape
    nbx, nby, k = cfg.nbinx, cfg.nbiny, cfg.corners_per_bin
    n = nbx * nby * k
    sx, sy = W // nbx, H // nby
    sw, sh = sx + d + 1, sy + d + 1
    nbins = nby * nbx
    # static per-strip window origins (+1 apron each side for the
    # round()-of-fractional and subpixel <=0.5 px coordinate drift)
    c0 = [min(max(g * sx - 1, 0), Wp - sw) for g in range(nbx)]
    r0 = [min(max(b * sy - 1, 0), Hp - sh) for b in range(nby)]
    strips = jnp.stack([jax.lax.slice(padded, (0, c), (Hp, c + sw))
                        for c in c0])                     # (nbx, Hp, sw)
    bins = jnp.stack([jax.lax.slice(strips, (0, rr, 0), (nbx, rr + sh, sw))
                      for rr in r0])                # (nby, nbx, sh, sw)
    bins = bins.reshape(nbins, sh, sw)
    c0b = jnp.asarray(c0, jnp.int32)[None, :].repeat(nby, 0).reshape(
        nbins, 1)
    r0b = jnp.asarray(r0, jnp.int32)[:, None].repeat(nbx, 1).reshape(
        nbins, 1)
    off = jnp.arange(d, dtype=jnp.int32)
    xl = jnp.clip(x[:n].reshape(nbins, k) - c0b, 0, sw - d)
    yl = jnp.clip(y[:n].reshape(nbins, k) - r0b, 0, sh - d)
    cidx = (xl[:, :, None] + off).reshape(nbins, k * d)
    ridx = (yl[:, :, None] + off).reshape(nbins, k * d)
    batch_dot = lambda a, b, **kw: jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))), **kw)
    if i8:
        hi = jnp.round(bins * (1.0 / 16.0))
        lo = bins - 16.0 * hi
        colsel = (jnp.arange(sw)[None, :, None] ==
                  cidx[:, None, :]).astype(jnp.int8)      # (nbins, sw, k*d)
        T = (16 * batch_dot(hi.astype(jnp.int8), colsel,
                            preferred_element_type=jnp.int32)
             + batch_dot(lo.astype(jnp.int8), colsel,
                         preferred_element_type=jnp.int32))
        rowsel = (ridx[:, :, None] ==
                  jnp.arange(sh)[None, None, :]).astype(jnp.int32)
        D = batch_dot(rowsel, T, preferred_element_type=jnp.int32)
        D = D.astype(padded.dtype)
    else:
        colsel = (jnp.arange(sw)[None, :, None] ==
                  cidx[:, None, :]).astype(padded.dtype)  # (nbins, sw, k*d)
        T = batch_dot(bins, colsel,
                      precision=jax.lax.Precision.HIGH)   # (nbins, sh, k*d)
        rowsel = (ridx[:, :, None] ==
                  jnp.arange(sh)[None, None, :]).astype(padded.dtype)
        D = batch_dot(rowsel, T,
                      precision=jax.lax.Precision.HIGH)   # (nbins, kd, kd)
    Dr = D.reshape(nbins, k, d, k, d)
    desc = jnp.stack([Dr[:, j, :, j, :] for j in range(k)], axis=1)
    return desc.reshape(n, d * d)


def _banded_ok(cfg: DetectorConfig, H, W):
    """Banded gather applies when the bin windows fit the padded image
    and the slot budget follows the detect_harris_binned layout."""
    r = cfg.descriptor_radius
    d = 2 * r + 1
    sx, sy = W // cfg.nbinx, H // cfg.nbiny
    k = cfg.corners_per_bin
    n = cfg.nbinx * cfg.nbiny * k
    return (k > 0 and n <= cfg.num_slots and sx >= 1 and sy >= 1
            and W + 2 * r >= sx + d + 1 and H + 2 * r >= sy + d + 1)


def extract_descriptors(img, kp: Keypoints,
                        cfg: DetectorConfig = DetectorConfig(),
                        binned_layout: bool = False):
    """Sobel-patch descriptors: raw (2r+1)^2 window of the horizontal
    Sobel response around each keypoint, zeros outside the image
    (src/viso.cpp:1004-1024); L1 is the match metric (src/viso.cpp:989-992).

    The reference's bounds test uses ``> 0`` (excluding row/column 0,
    src/viso.cpp:1018); we use ``>= 0`` — zero-padding the Sobel image makes
    the gather branch-free and the difference only affects descriptors
    whose window touches the first row/column.  Deliberate divergence.

    Returns (num_slots, descriptor_dim_padded) float; invalid slots are 0.
    The tail pad (121 -> 128) is zero so L1/L2 distances are unaffected but
    rows tile the 128-wide VPU lanes exactly.

    ``binned_layout=True`` asserts the keypoints follow the
    detect_harris_binned slot layout (slot group b = biny*nbinx + binx
    holds bin b's k corners, +- the subpixel refinement's <=0.5 px) and
    switches both one-hot modes to the bin-banded gather
    (``_banded_gather``) — bitwise-identical descriptors at ~1/16 the
    MXU work.  Only pass it for keypoints that actually came from the
    binned detector of the SAME cfg.
    """
    img = jnp.asarray(img)
    r = cfg.descriptor_radius
    d = 2 * r + 1
    sob = sobel_derivatives(img, ksize=3, dx=True, scale=1.0)
    padded = jnp.pad(sob, ((r, r), (r, r)))  # zeros outside the image

    # round: subpixel-refined keypoints carry fractional coordinates, the
    # descriptor grid stays integral.
    Hp, Wp = padded.shape
    N = kp.xy.shape[0]
    x = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, Wp - d)
    y = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, Hp - d)
    off = jnp.arange(d, dtype=jnp.int32)
    H, W = img.shape
    if (binned_layout and cfg.descriptor_gather in ("onehot", "onehot_i8")
            and _banded_ok(cfg, H, W)):
        desc = _banded_gather(padded, x, y, cfg, H, W,
                              i8=cfg.descriptor_gather == "onehot_i8")
        desc = jnp.pad(desc, ((0, N - desc.shape[0]), (0, 0)))
    elif cfg.descriptor_gather == "onehot_i8":
        # The column-selection matmul in the MXU's INTEGER mode (4x the
        # bf16-input rate on v5e, and the 0/1 selector shrinks 4x to
        # int8).  EXACT — hence bitwise identical to 'take'/'onehot' —
        # whenever the image is integer-valued (any uint8 source):
        # ksize-3 Sobel of [0,255] integers lies in [-1020, 1020], and
        # p = 16*hi + lo with hi = round(p/16) in [-64,64], lo in
        # [-8,8] splits it into two int8 planes whose selected sums
        # reconstruct p exactly in int32.  detect_and_describe selects
        # this path automatically for UINT8 inputs only (wider integer
        # dtypes overflow the hi plane: hi = round(p/16) must fit int8,
        # i.e. |p| <= 1023.5 — true for 8-bit Sobel, false for uint16+);
        # arbitrary float images must use 'onehot' (the bf16x3 passes
        # are exact for ANY f32 — Precision.HIGH splits the f32 mantissa
        # across 3 bf16 terms).  DetectorConfig.__post_init__ rejects
        # hand-written configs combining 'onehot_i8' with sharpening or
        # pyramid levels (fractional preprocessing breaks integrality);
        # a non-integral or out-of-range image reaching this branch
        # still rounds/wraps — keep it behind the auto-selection.
        hi = jnp.round(padded * (1.0 / 16.0))
        lo = padded - 16.0 * hi
        hi8 = hi.astype(jnp.int8)
        lo8 = lo.astype(jnp.int8)
        cidx = (x[:, None] + off[None, :]).reshape(N * d)        # (N*d,)
        colsel = (jnp.arange(Wp)[:, None] == cidx[None, :]).astype(
            jnp.int8)                                            # (Wp, N*d)
        dot = lambda a: jax.lax.dot_general(
            a, colsel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                    # (Hp, N*d)
        cols = 16 * dot(hi8) + dot(lo8)                          # int32
        cols = cols.reshape(Hp, N, d).transpose(1, 0, 2)         # (N, Hp, d)
        ridx = y[:, None] + off[None, :]                         # (N, d)
        rowsel = (jnp.arange(Hp)[None, None, :] ==
                  ridx[:, :, None]).astype(jnp.int32)            # (N, d, Hp)
        desc = jnp.einsum("nrh,nhc->nrc", rowsel, cols,
                          ).reshape(N, d * d).astype(padded.dtype)
    elif cfg.descriptor_gather == "onehot":
        # The gather as two chained 0/1-selection matmuls (columns, then
        # rows) so the MXU does the patch extraction — ~2x the flat
        # gather's speed at KITTI scale (docs/performance.md).  Exact:
        # every output element has exactly one nonzero contribution and
        # Precision.HIGH's bf16x3 passes reconstruct f32 bit-exactly, so
        # descriptors are bitwise identical to the 'take' path (tested).
        cidx = (x[:, None] + off[None, :]).reshape(N * d)        # (N*d,)
        colsel = (jnp.arange(Wp)[:, None] == cidx[None, :]).astype(
            padded.dtype)                                        # (Wp, N*d)
        cols = jax.lax.dot_general(
            padded, colsel, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGH)                    # (Hp, N*d)
        cols = cols.reshape(Hp, N, d).transpose(1, 0, 2)         # (N, Hp, d)
        ridx = y[:, None] + off[None, :]                         # (N, d)
        rowsel = (jnp.arange(Hp)[None, None, :] ==
                  ridx[:, :, None]).astype(padded.dtype)         # (N, d, Hp)
        desc = jnp.einsum("nrh,nhc->nrc", rowsel, cols,
                          precision=jax.lax.Precision.HIGH
                          ).reshape(N, d * d)
    else:
        # One flat gather for all patches: (N, d*d) indices into the
        # padded image.  A vmapped dynamic_slice lowers to N separate
        # gathers and is ~3x slower on TPU.
        rows = y[:, None] + off[None, :]                  # (N, d)
        cols = x[:, None] + off[None, :]                  # (N, d)
        flat = (rows[:, :, None] * Wp + cols[:, None, :]).reshape(
            N, d * d)                                     # (N, d*d)
        desc = jnp.take(padded.reshape(-1), flat, axis=0)
    pad = cfg.descriptor_dim_padded - desc.shape[-1]
    desc = jnp.pad(desc, ((0, 0), (0, pad)))
    return jnp.where(kp.valid[:, None], desc, 0.0)


def detect_and_describe(img, cfg: DetectorConfig = DetectorConfig(),
                        sharpen_gate=None):
    """Detector + descriptor in one call (shared by both pipeline views).

    Accepts uint8 images (preferred: 4x less host->device traffic than
    f32) and casts on-device.

    ``sharpen_gate``: optional () bool overriding sharpen_auto's
    per-image blur decision — the stereo frontend passes ONE shared
    gate for both views so a pair straddling the trigger can never have
    one view sharpened (4x high-pass gain) and the other not, which
    would inflate cross-view descriptor distances.
    """
    img = jnp.asarray(img)
    # uint8 ONLY: the 16*hi+lo int8 split is exact iff |Sobel| <= 1023.5
    # (ksize-3 Sobel of [0,255] lies in [-1020,1020]); uint16/int32
    # sources overflow hi=round(p/16) past int8 and would wrap silently
    # (ADVICE r3: measured descriptor error up to 239280 on uint16).
    if img.dtype != jnp.float32:
        img = img.astype(jnp.float32)
    # NOTE (round 4): the round-3 auto-upgrade of uint8 sources to
    # 'onehot_i8' is RETIRED.  It paid when the selection matmuls were
    # image-sized (int8 MXU rate vs bf16x3: 415.9 vs 400 fps chunked,
    # benchmarks/tpu_r3.json); the bin-banded gather shrank those
    # matmuls ~16x, after which the i8 path's extra elementwise work
    # (hi/lo plane split + int32 recombine) outweighs its MXU saving —
    # measured (benchmarks/stage_profile.py, round-4 tunnel):
    # banded f32-HIGH 0.342 ms/pair vs banded i8 0.378, full step
    # 0.950 vs 0.990.  'onehot_i8' stays available as an explicit
    # config choice; both remain bitwise-identical to 'take' (tested).
    if cfg.sharpen_sigma > 0:
        sharp = unsharp_mask(img, cfg.sharpen_sigma, cfg.sharpen_amount)
        if cfg.sharpen_auto:
            # apply only when the frame measures defocused: compute both
            # and select (fixed-shape, no host sync; the mask is cheap
            # VPU work).  On sharp frames this is a bit-exact no-op.
            gate = (blur_metric(img) < cfg.sharpen_trigger
                    if sharpen_gate is None else sharpen_gate)
            img = jnp.where(gate, sharp, img)
        else:
            img = sharp
    if cfg.pyramid_levels > 1:
        from libviso_tpu.ops.pyramid import detect_and_describe_multiscale

        kp, desc, _ = detect_and_describe_multiscale(
            img, cfg, levels=cfg.pyramid_levels, subpixel=cfg.subpixel)
        return kp, desc
    kp = detect_harris_binned(img, cfg)
    if cfg.subpixel:
        from libviso_tpu.ops.pyramid import subpixel_refine

        resp = harris_response(img, cfg.block_size, cfg.aperture,
                               cfg.harris_k)
        kp = subpixel_refine(resp, kp)
    # kp comes straight from detect_harris_binned (subpixel shifts
    # <= 0.5 px, inside the banded windows' apron) -> banded gather
    desc = extract_descriptors(img, kp, cfg, binned_layout=True)
    return kp, desc
