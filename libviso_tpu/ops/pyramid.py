"""Multi-scale pyramid detection and subpixel corner refinement.

BASELINE config 3 — a capability beyond the reference (its detector is
single-scale, integer-pixel: src/viso.cpp:925-976).  Design:

  - Pyramid: repeated 2x2 average pooling (one reshape-mean per level —
    no convs needed).
  - Each level runs the same binned Harris detection with a budget that
    halves per level; keypoint coordinates map back to level-0 pixels
    (x*2^l + offset), and descriptors are sampled from the *detection
    level's* Sobel image, so a coarse corner is described at the scale it
    was found (scale covariance the reference lacks).
  - Subpixel: a quadratic fit to the 3x3 Harris-response neighborhood
    around each detected corner; the refined offset is the Newton step
    -H^-1 g of the fitted paraboloid, clamped to +-0.5 px.  Descriptor
    gathers stay integer (the patch grid is integral by construction);
    only the *geometry* (triangulation / GN observations) sees the
    fractional coordinates — which is where accuracy comes from.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from libviso_tpu.config import DetectorConfig
from libviso_tpu.ops.features import (
    Keypoints,
    detect_harris_binned,
    extract_descriptors,
    harris_response,
)


def downsample2(img):
    """2x2 average pooling (crops odd edges)."""
    H, W = img.shape
    H2, W2 = H // 2, W // 2
    return img[: H2 * 2, : W2 * 2].reshape(H2, 2, W2, 2).mean(axis=(1, 3))


def build_pyramid(img, levels: int):
    """List of ``levels`` images, level 0 = input."""
    pyr = [img]
    for _ in range(1, levels):
        pyr.append(downsample2(pyr[-1]))
    return pyr


def subpixel_refine(resp, kp: Keypoints):
    """Quadratic-fit subpixel refinement of corner positions.

    Fits a paraboloid to |response| on the 3x3 neighborhood; the offset is
    clamped to [-0.5, 0.5] (beyond that the fit is untrustworthy — the
    integer max would have been elsewhere).
    """
    a = jnp.abs(resp)
    H, W = a.shape
    xi = kp.xy[:, 0].astype(jnp.int32)
    yi = kp.xy[:, 1].astype(jnp.int32)
    x = jnp.clip(xi, 1, W - 2)
    y = jnp.clip(yi, 1, H - 2)
    # border corners: the clamp re-centers the 3x3 fit on a DIFFERENT
    # pixel, so its offset does not describe the original corner — keep
    # those at their integer position instead of shifting them
    unclamped = (x == xi) & (y == yi)

    def g(dy, dx):
        return a[y + dy, x + dx]

    gx = (g(0, 1) - g(0, -1)) / 2.0
    gy = (g(1, 0) - g(-1, 0)) / 2.0
    gxx = g(0, 1) - 2.0 * g(0, 0) + g(0, -1)
    gyy = g(1, 0) - 2.0 * g(0, 0) + g(-1, 0)
    gxy = (g(1, 1) - g(1, -1) - g(-1, 1) + g(-1, -1)) / 4.0

    det = gxx * gyy - gxy * gxy
    safe = jnp.abs(det) > 1e-18
    det = jnp.where(safe, det, 1.0)
    dx = -(gyy * gx - gxy * gy) / det
    dy = -(gxx * gy - gxy * gx) / det
    dx = jnp.clip(jnp.where(safe, dx, 0.0), -0.5, 0.5)
    dy = jnp.clip(jnp.where(safe, dy, 0.0), -0.5, 0.5)
    apply = (kp.valid & unclamped)[:, None]
    new_xy = kp.xy + jnp.stack([dx, dy], axis=-1) * apply
    return kp._replace(xy=new_xy)


def _level_budget(cfg: DetectorConfig, levels: int):
    """Slot budgets per level, proportional to 2^-level (level 0 richest),
    summing exactly to cfg.num_slots."""
    weights = [2.0 ** -l for l in range(levels)]
    total = sum(weights)
    budgets = [int(cfg.num_slots * w / total) for w in weights]
    budgets[0] += cfg.num_slots - sum(budgets)
    return budgets


def detect_and_describe_multiscale(img, cfg: DetectorConfig,
                                   levels: int = 2, subpixel: bool = True):
    """Pyramid detection + per-level description into one slot tensor.

    Returns (Keypoints in fractional level-0 coordinates, descriptors
    (num_slots, D), scales (num_slots,) int32 detection level).
    """
    img = jnp.asarray(img)
    if img.dtype != jnp.float32:
        img = img.astype(jnp.float32)
    pyr = build_pyramid(img, levels)
    budgets = _level_budget(cfg, levels)

    xs, resps, valids, descs, scales = [], [], [], [], []
    nbins = cfg.nbinx * cfg.nbiny
    for l, (im_l, slots_l) in enumerate(zip(pyr, budgets)):
        # Per-level detector: bin counts halve with the image (same bin
        # size in level pixels), which also keeps the per-level corner
        # budget k_l * nbins_l <= slots_l — a fixed bin grid would exceed
        # a deep level's slot budget and make detect_harris_binned raise.
        if slots_l < 1:
            continue  # deeper level got no slot budget at all
        nbinx_l = max(1, cfg.nbinx >> l)
        nbiny_l = max(1, cfg.nbiny >> l)
        while nbinx_l * nbiny_l > max(slots_l, 1):  # coarsen further
            if nbinx_l >= nbiny_l and nbinx_l > 1:
                nbinx_l = max(1, nbinx_l // 2)
            else:
                nbiny_l = max(1, nbiny_l // 2)
        nbins_l = nbinx_l * nbiny_l
        k_l = max(1, min(cfg.corners_per_bin, slots_l // nbins_l))
        # replace, not re-construct: fields not overridden here
        # (descriptor_gather, future additions) must carry through
        cfg_l = dataclasses.replace(
            cfg, max_features=k_l * nbins_l,
            nbinx=nbinx_l, nbiny=nbiny_l, num_slots=slots_l,
            pyramid_levels=1, subpixel=False,
        )
        kp_l = detect_harris_binned(im_l, cfg_l)
        if subpixel:
            resp_l = harris_response(im_l, cfg.block_size, cfg.aperture,
                                     cfg.harris_k)
            kp_l = subpixel_refine(resp_l, kp_l)
        # kp_l comes straight from this level's binned detector
        # (subpixel drift <= 0.5 px) -> banded gather applies
        d_l = extract_descriptors(im_l, kp_l, cfg_l, binned_layout=True)
        # map to level-0 coordinates: pixel centers align at x0 = x*2^l
        # + (2^l - 1)/2 for average pooling
        scale = 2.0 ** l
        offset = (scale - 1.0) / 2.0
        xs.append(kp_l.xy * scale + offset)
        resps.append(kp_l.response)
        valids.append(kp_l.valid)
        descs.append(d_l)
        scales.append(jnp.full((slots_l,), l, jnp.int32))

    kp = Keypoints(xy=jnp.concatenate(xs), response=jnp.concatenate(resps),
                   valid=jnp.concatenate(valids))
    desc = jnp.concatenate(descs)
    return kp, desc, jnp.concatenate(scales)
