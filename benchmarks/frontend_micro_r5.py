"""Frontend bound-gap attack at compute level (VERDICT r4 #6).

The r4 stage table puts Harris and the banded descriptor gather at
~35-40% of their VPU/HBM bounds, parked with "pad/selector
materializations XLA will not fuse".  This benchmark applies the
chained isolated-kernel discipline (the one that produced the matcher
SoL table) to the candidate fixes, measured on the real chip even
though sub-ms end-to-end wins are tunnel-blocked:

  gather candidates (per view, N=1280, d=11, 376x1241):
    banded_onehot  — the shipped r4 bin-banded selection matmuls
    banded_take    — selector-FREE: same bin windows, but row+column
                     take_along_axis gathers instead of 0/1 matmuls
                     (no selector materialization at all)
    flat_take      — the r2 baseline (whole-image gather) for scale

  harris candidates (376x1241):
    harris_f32       — shipped harris_response (channel-stacked convs)
    harris_bf16      — structure-tensor stage in bf16 (halves the
                       intermediate HBM traffic; response is NOT
                       bitwise — candidates only, accuracy gate would
                       need the cv2 battery before productizing)
    detect_full      — harris + NMS + binned top-k + subpixel-off
                       (the full shipped stage for reference)

Chained: each measurement folds `chain` dependent iterations inside
one jit (perturbing inputs per link) to amortize the ~27 ms tunnel
RPC and defeat transport memoization (docs/performance.md pitfalls).

    python benchmarks/frontend_micro_r5.py [--reps=5] [--chain=64]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def _flag(name, default):
    pref = f"--{name}="
    for a in sys.argv[1:]:
        if a.startswith(pref):
            return type(default)(a[len(pref):])
    return default


def main():
    import jax
    import jax.numpy as jnp

    from libviso_tpu.config import DetectorConfig
    from libviso_tpu.ops import features as F
    from libviso_tpu.utils.profiling import time_jitted

    reps = _flag("reps", 5)
    chain = _flag("chain", 64)

    H, W = 376, 1241
    cfg = DetectorConfig()   # 24x5 bins, 10/bin at 1200 budget
    r = cfg.descriptor_radius
    d = 2 * r + 1
    nbx, nby, k = cfg.nbinx, cfg.nbiny, cfg.corners_per_bin
    n = nbx * nby * k
    rng = np.random.default_rng(0)
    img_np = rng.integers(0, 256, (H, W)).astype(np.float32)
    imgs = [jnp.asarray(img_np + 0.001 * i) for i in range(reps + 4)]
    pad_np = rng.integers(-1020, 1021,
                          (H + 2 * r, W + 2 * r)).astype(np.float32)
    pads = [jnp.asarray(pad_np * (1.0 + 0.001 * i))
            for i in range(reps + 4)]
    Hp, Wp = pad_np.shape
    # slot coordinates following the binned layout (slot group = bin)
    sx, sy = W // nbx, H // nby
    xs, ys = [], []
    for by in range(nby):
        for bx in range(nbx):
            xs += list(rng.integers(bx * sx, min((bx + 1) * sx, Wp - d),
                                    k))
            ys += list(rng.integers(by * sy, min((by + 1) * sy, Hp - d),
                                    k))
    x = jnp.asarray(np.asarray(xs, np.int32))
    y = jnp.asarray(np.asarray(ys, np.int32))

    def chained(name, body, feeds):
        """body(buf, i) -> array consumed through a nonlinearity; buf
        perturbed per link so no two links see identical inputs."""

        def fn(buf):
            def step(c, i):
                out = body(buf * (1.0 + 1e-6 * c), i)
                return jnp.tanh(jnp.sum(out) * 1e-9) + c * 0.5, None

            c, _ = jax.lax.scan(step, jnp.float32(0.0),
                                jnp.arange(chain))
            return c

        jfn = jax.jit(fn)
        sec = time_jitted(jfn, reps=reps,
                          make_args=lambda i: (feeds[i % len(feeds)],))
        print(f"{name:<42} {sec / chain * 1e3:8.3f} ms/iter")
        return sec / chain

    # ---- gather variants ----
    def banded_onehot(buf, i):
        return F._banded_gather(buf, x, y, cfg, H, W, i8=False)

    def banded_take(buf, i):
        # same static bin windows as _banded_gather, gathers instead of
        # selection matmuls
        sw, sh = sx + d + 1, sy + d + 1
        nbins = nby * nbx
        c0 = [min(max(g * sx - 1, 0), Wp - sw) for g in range(nbx)]
        r0 = [min(max(b * sy - 1, 0), Hp - sh) for b in range(nby)]
        strips = jnp.stack([jax.lax.slice(buf, (0, c), (Hp, c + sw))
                            for c in c0])
        bins = jnp.stack([jax.lax.slice(strips, (0, rr, 0),
                                        (nbx, rr + sh, sw))
                          for rr in r0]).reshape(nbins, sh, sw)
        c0b = jnp.asarray(c0, jnp.int32)[None, :].repeat(nby, 0)\
            .reshape(nbins, 1)
        r0b = jnp.asarray(r0, jnp.int32)[:, None].repeat(nbx, 1)\
            .reshape(nbins, 1)
        off = jnp.arange(d, dtype=jnp.int32)
        xl = jnp.clip(x[:n].reshape(nbins, k) - c0b, 0, sw - d)
        yl = jnp.clip(y[:n].reshape(nbins, k) - r0b, 0, sh - d)
        ridx = (yl[:, :, None] + off).reshape(nbins, k * d)
        rows = jnp.take_along_axis(bins, ridx[:, :, None], axis=1)
        rowsr = rows.reshape(nbins, k, d, sw)
        cid = (xl[:, :, None] + off)[:, :, None, :]      # (nbins,k,1,d)
        cid = jnp.broadcast_to(cid, (nbins, k, d, d))
        patch = jnp.take_along_axis(rowsr, cid, axis=3)  # (nbins,k,d,d)
        return patch.reshape(n, d * d)

    def flat_take(buf, i):
        off = jnp.arange(d, dtype=jnp.int32)
        rows = buf[(y[:, None] + off)]                   # (N, d, Wp)
        cols = (x[:, None, None] + off[None, None, :])
        cols = jnp.broadcast_to(cols, (x.shape[0], d, d))
        return jnp.take_along_axis(rows, cols, axis=2).reshape(
            x.shape[0], d * d)

    # correctness cross-check before timing
    g_ref = np.asarray(banded_onehot(pads[0], 0))
    g_take = np.asarray(banded_take(pads[0], 0))
    assert np.array_equal(g_ref, g_take), "banded_take != banded_onehot"
    print("banded_take bitwise-equal to banded_onehot: OK",
          file=sys.stderr)

    chained("gather banded_onehot (shipped)", banded_onehot, pads)
    chained("gather banded_take (selector-free)", banded_take, pads)
    chained("gather flat_take (r2 baseline)", flat_take, pads)

    # ---- harris variants ----
    def harris_f32(buf, i):
        return F.harris_response(buf)

    def harris_bf16(buf, i):
        return F.harris_response(buf.astype(jnp.bfloat16)).astype(
            jnp.float32)

    def detect_full(buf, i):
        kp = F.detect_harris_binned(buf, cfg)
        return kp.xy

    chained("harris response f32 (shipped)", harris_f32, imgs)
    chained("harris response bf16 (candidate)", harris_bf16, imgs)
    chained("detect full (harris+nms+topk)", detect_full, imgs)


if __name__ == "__main__":
    main()
