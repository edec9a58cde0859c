"""Stage decomposition of the monocular frame step (VERDICT r3 #5).

Times the mono pipeline's stages separately with the chained
tunnel-safe pattern (utils/profiling.py): frontend (1536-slot detector,
19x19 Sobel patches), one 1536^2 match, one essential-matrix RANSAC
(5pt or 8pt), and the full step for reference.  Ratios say where the
~20 ms 5-point frame goes.

Usage:  python benchmarks/mono_stage_profile.py [--reps=6] [--chain=16]
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

    from libviso_tpu.config import MonoConfig, PipelineConfig
    from libviso_tpu.geometry.essential import ransac_essential
    from libviso_tpu.ops.features import detect_and_describe
    from libviso_tpu.ops.matching import match_descriptors
    from libviso_tpu.pipeline.mono import build_mono_step, empty_mono_state
    from libviso_tpu.synthetic import generate_sequence
    from libviso_tpu.utils.profiling import _per_iteration, profile_kernel

    reps = _flag("reps", 6)
    chain = _flag("chain", 16)
    only = _flag("only", "")

    cfg = PipelineConfig.mono()
    seq = generate_sequence(num_frames=8, num_points=900, seed=0,
                            width=1241, height=376, f=718.856,
                            base=0.5371657, speed=0.8)
    K = np.array([[718.856, 0.0, 620.5], [0.0, 718.856, 188.0],
                  [0.0, 0.0, 1.0]])
    frames_np = np.stack([f[0] for f in seq.frames]).astype(np.float32)
    stacks = [jnp.asarray(frames_np * (1.0 + 0.002 * k))
              for k in range(reps + 4)]
    key = jax.random.PRNGKey(0)
    rows = []

    def _selected(name):
        return (not only) or any(s in name for s in only.split(","))

    def chained(name, fn_body, ch=None):
        if not _selected(name):
            return
        ch = ch or chain

        def fn(x):
            def body(c, i):
                return fn_body(c, i, x), None
            return lax.scan(body, jnp.float32(0), jnp.arange(ch))[0]
        st = profile_kernel(name, jax.jit(fn), (), 1.0 * ch, 1.0 * ch,
                            reps=reps,
                            make_args=lambda i: (stacks[i % len(stacks)],))
        st = _per_iteration(st, ch)
        rows.append((name, st.seconds * 1e3))
        print(f"{name:34s} {st.seconds*1e3:8.3f} ms", file=sys.stderr)

    # --- full step (5pt and 8pt) ---
    for method in ("5pt", "8pt"):
        step = build_mono_step(K, cfg, method=method)
        st0 = empty_mono_state(cfg)

        def full_body(c, i, x, step=step, st0=st0):
            f = x[i % x.shape[0]]
            st, out = step(st0, f * (1.0 + c), jax.random.fold_in(key, i))
            return jnp.sum(jnp.abs(out.transform)) * 1e-9 + c * 0.5

        chained(f"mono_step[{method}] (stateless)", full_body)

    # --- frontend ---
    def fe_body(c, i, x):
        f = x[i % x.shape[0]]
        kp, d = detect_and_describe(f * (1.0 + c), cfg.detector)
        return (jnp.sum(d) + jnp.sum(kp.xy)) * 1e-12

    chained("  detect_and_describe (1536/19x19)", fe_body)

    # --- one dense 1536^2 match (temporal config) ---
    kp_ref, d_ref = jax.jit(
        lambda im: detect_and_describe(im, cfg.detector))(
            jnp.asarray(frames_np[2]))
    jax.block_until_ready(d_ref)

    def match_body(c, i, x):
        m = match_descriptors(kp_ref, d_ref * (1.0 + c), kp_ref, d_ref,
                              cfg.temporal_match)
        return jnp.sum(m.idx).astype(jnp.float32) * 1e-12

    chained("  match_descriptors 1536^2x384", match_body)

    # --- essential RANSAC on realistic correspondences ---
    mono = MonoConfig()
    rng = np.random.default_rng(0)
    N = cfg.detector.num_slots
    xn1 = jnp.asarray(rng.normal(0, 0.3, (N, 2)), jnp.float32)
    xn2 = xn1 + 0.01 + jnp.asarray(rng.normal(0, 0.002, (N, 2)),
                                   jnp.float32)
    valid = jnp.ones((N,), bool)
    x1s = [xn1 * (1.0 + 0.001 * k) for k in range(reps + 4)]

    for method in ("5pt", "8pt"):
        def er_body(c, i, x, method=method):
            est = ransac_essential(
                jax.random.fold_in(key, i), x1s[0] + c, xn2, valid=valid,
                num_hypotheses=mono.resolved_hypotheses() if method ==
                "5pt" else 128,
                sampson_thresh=mono.sampson_thresh, method=method)
            return jnp.sum(est.E) * 1e-9 + c * 0.5

        chained(f"  ransac_essential[{method}]", er_body)

    print("\nstage table (ms):", file=sys.stderr)
    for n, ms in rows:
        print(f"  {n:34s} {ms:8.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
