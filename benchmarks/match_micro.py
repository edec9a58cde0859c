"""Micro-timing of the matcher's 2-min reduction variants (diagnostics).

two_smallest (ops/matching.py) does argmin + take_along_axis + masked
min — three passes over the (3, N, N) gated distance stack.  A variadic
``lax.reduce`` with a closed-form 2-min-merge combiner (the same merge
the TP matcher uses across shards) does it in ONE pass.  This harness
measures both on the real chip at frame shapes.

Usage: python benchmarks/match_micro.py [--reps=5] [--chain=256]
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

    from libviso_tpu.ops.matching import two_smallest
    from libviso_tpu.utils.profiling import profile_kernel, _per_iteration

    reps = _flag("reps", 5)
    chain = _flag("chain", 256)
    N = 1280
    rng = np.random.default_rng(0)
    base = rng.standard_normal((3, N, N)).astype(np.float32)
    dds = [jnp.asarray(base * (1.0 + 0.001 * k)) for k in range(reps + 4)]

    def chained(name, fn_body):
        def fn(s):
            def body(c, i):
                return fn_body(s + c), None
            return lax.scan(body, jnp.float32(0), jnp.arange(chain))[0]
        st = profile_kernel(name, jax.jit(fn), (), 1.0 * chain,
                            1.0 * chain, reps=reps,
                            make_args=lambda i: (dds[i % len(dds)],))
        st = _per_iteration(st, chain)
        print(f"{name:36s} {st.seconds*1e3:7.3f} ms", file=sys.stderr)

    def cur_body(dd):
        b, s, i = jax.vmap(two_smallest)(dd)
        return (jnp.sum(b) + jnp.sum(s)) * 1e-12 + jnp.sum(i) * 0.0

    chained("two_smallest (3 passes)", cur_body)

    def comb(a, b):
        b1, s1, i1 = a
        b2, s2, i2 = b
        take1 = (b1 < b2) | ((b1 == b2) & (i1 <= i2))
        best = jnp.where(take1, b1, b2)
        idx = jnp.where(take1, i1, i2)
        sec = jnp.where(take1, jnp.minimum(s1, b2), jnp.minimum(b1, s2))
        return best, sec, idx

    def red_body(dd):
        idx = lax.broadcasted_iota(jnp.int32, dd.shape, dd.ndim - 1)
        big = jnp.asarray(jnp.inf, dd.dtype)
        b, s, i = lax.reduce(
            (dd, jnp.full_like(dd, big), idx),
            (big, big, jnp.int32(0)), comb, (dd.ndim - 1,))
        return (jnp.sum(b) + jnp.sum(s)) * 1e-12 + jnp.sum(i) * 0.0

    chained("two_smallest (variadic reduce)", red_body)


if __name__ == "__main__":
    main()
