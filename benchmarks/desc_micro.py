"""Micro-decomposition of the onehot descriptor gather (diagnostics).

Times the internals of ops/features.py::extract_descriptors cumulatively
(chained, memoization-safe): selector build, stage-1 column matmul,
transpose, stage-2 row einsum — to locate the real cost inside the
measured ~0.34 ms/view (round 3).  Also times candidate stage-2
replacements (take_along_axis row gather).

Usage: python benchmarks/desc_micro.py [--reps=5] [--chain=256]
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
    from jax import lax

    from libviso_tpu.utils.profiling import profile_kernel, _per_iteration

    reps = _flag("reps", 5)
    chain = _flag("chain", 256)

    H, W = 376, 1241
    N, d = 1280, 11
    r = d // 2
    rng = np.random.default_rng(0)
    sob_np = rng.integers(-1020, 1021, (H + 2 * r, W + 2 * r)
                          ).astype(np.float32)
    Hp, Wp = sob_np.shape
    x_np = rng.integers(0, Wp - d, N).astype(np.int32)
    y_np = rng.integers(0, Hp - d, N).astype(np.int32)
    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np)
    sobs = [jnp.asarray(sob_np * (1.0 + 0.001 * k))
            for k in range(reps + 4)]
    off = jnp.arange(d, dtype=jnp.int32)

    only = _flag("only", "")

    def chained(name, fn_body):
        if only and not any(s in name for s in only.split(",")):
            return

        def fn(s):
            def body(c, i):
                return fn_body(s * (1.0 + c), i), None
            return lax.scan(body, jnp.float32(0), jnp.arange(chain))[0]
        st = profile_kernel(name, jax.jit(fn), (), 1.0 * chain,
                            1.0 * chain, reps=reps,
                            make_args=lambda i: (sobs[i % len(sobs)],))
        st = _per_iteration(st, chain)
        print(f"{name:36s} {st.seconds*1e3:7.3f} ms", file=sys.stderr)

    cidx = (x[:, None] + off[None, :]).reshape(N * d)
    ridx = y[:, None] + off[None, :]

    def build_colsel(dtype=jnp.float32):
        return (jnp.arange(Wp)[:, None] == cidx[None, :]).astype(dtype)

    # selector build alone (sum to consume)
    def sel_body(p, i):
        cs = build_colsel() * (1.0 + p[0, 0] * 0)  # depend on input
        return jnp.sum(cs) * 1e-12

    chained("colsel build (f32, 1 view)", sel_body)

    # + stage-1 matmul
    def s1_body(p, i):
        cs = build_colsel()
        cols = lax.dot_general(p, cs, (((1,), (0,)), ((), ())),
                               precision=lax.Precision.HIGH)
        return jnp.sum(cols) * 1e-12

    chained("+ stage1 dot (Hp,Wp)x(Wp,Nd)", s1_body)

    # + transpose
    def s2_body(p, i):
        cs = build_colsel()
        cols = lax.dot_general(p, cs, (((1,), (0,)), ((), ())),
                               precision=lax.Precision.HIGH)
        colsT = cols.reshape(Hp, N, d).transpose(1, 0, 2)
        return jnp.sum(colsT * colsT) * 1e-12

    chained("+ transpose -> (N,Hp,d)", s2_body)

    # full current path (rowsel einsum)
    def full_body(p, i):
        cs = build_colsel()
        cols = lax.dot_general(p, cs, (((1,), (0,)), ((), ())),
                               precision=lax.Precision.HIGH)
        colsT = cols.reshape(Hp, N, d).transpose(1, 0, 2)
        rowsel = (jnp.arange(Hp)[None, None, :]
                  == ridx[:, :, None]).astype(p.dtype)
        desc = jnp.einsum("nrh,nhc->nrc", rowsel, colsT,
                          precision=lax.Precision.HIGH).reshape(N, d * d)
        return jnp.sum(desc) * 1e-12

    chained("full onehot (einsum stage2)", full_body)

    # integer-image exact variants: single concatenated-split dot
    # (p = hi + lo split rides ONE contraction over K=2*Wp instead of
    # two materialized product buffers)
    iota2 = jnp.arange(2 * Wp)[:, None]

    def concat_bf16_body(p, i):
        pr = jnp.round(p)  # integer-valued (the exactness precondition)
        hi = 256.0 * jnp.round(pr * (1.0 / 256.0))
        lo = pr - hi
        lhs = jnp.concatenate(
            [hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)], axis=1)
        sel = ((iota2 == cidx[None, :]) | (iota2 - Wp == cidx[None, :])
               ).astype(jnp.bfloat16)
        cols = lax.dot_general(lhs, sel, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        colsT = cols.reshape(Hp, N, d).transpose(1, 0, 2)
        rowsel = (jnp.arange(Hp)[None, None, :]
                  == ridx[:, :, None]).astype(jnp.float32)
        desc = jnp.einsum("nrh,nhc->nrc", rowsel, colsT,
                          precision=lax.Precision.HIGH).reshape(N, d * d)
        return jnp.sum(desc) * 1e-12

    chained("concat bf16-split single dot", concat_bf16_body)

    def concat_i8_body(p, i):
        pr = jnp.round(p)
        hi = jnp.round(pr * (1.0 / 16.0))
        lo = pr - 16.0 * hi
        lhs = jnp.concatenate(
            [hi.astype(jnp.int8), lo.astype(jnp.int8)], axis=1)
        sel = (16 * (iota2 == cidx[None, :]).astype(jnp.int8)
               + (iota2 - Wp == cidx[None, :]).astype(jnp.int8))
        cols = lax.dot_general(lhs, sel, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
        colsT = cols.reshape(Hp, N, d).transpose(1, 0, 2)
        rowsel = (jnp.arange(Hp)[None, None, :]
                  == ridx[:, :, None]).astype(jnp.int32)
        desc = jnp.einsum("nrh,nhc->nrc", rowsel, colsT
                          ).reshape(N, d * d).astype(jnp.float32)
        return jnp.sum(desc) * 1e-12

    chained("concat i8-split single dot", concat_i8_body)

    # stage-2 alternative: take_along_axis row gather
    def ta_body(p, i):
        cs = build_colsel()
        cols = lax.dot_general(p, cs, (((1,), (0,)), ((), ())),
                               precision=lax.Precision.HIGH)
        colsT = cols.reshape(Hp, N, d).transpose(1, 0, 2)   # (N, Hp, d)
        idx = ridx[:, :, None]                              # (N, d, 1)
        desc = jnp.take_along_axis(
            colsT, jnp.broadcast_to(idx, (N, d, d)), axis=1
        ).reshape(N, d * d)
        return jnp.sum(desc) * 1e-12

    chained("stage2 = take_along_axis", ta_body)

    # no transpose: gather rows of (Hp, N*d) per (n,r) — 2D flat gather
    def flat_body(p, i):
        cs = build_colsel()
        cols = lax.dot_general(p, cs, (((1,), (0,)), ((), ())),
                               precision=lax.Precision.HIGH)  # (Hp, N*d)
        colf = cols.reshape(-1)                               # Hp*N*d
        nd = jnp.arange(N * d, dtype=jnp.int32).reshape(N, d)
        rows = y[:, None, None] + off[None, :, None]          # (N, d_r, 1)
        flat = rows * (N * d) + nd[:, None, :]                # (N, d_r, d)
        desc = jnp.take(colf, flat.reshape(N, d * d), axis=0)
        return jnp.sum(desc) * 1e-12

    chained("stage2 = flat take, no transpose", flat_body)


if __name__ == "__main__":
    main()
