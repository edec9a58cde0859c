"""Stage decomposition of the on-chip frame step (diagnostics, stderr).

Times each stage of the stereo frame step SEPARATELY with the chained
pattern from utils/profiling.py (tunnel-memoization-safe, dispatch
amortized): frontend (detect+describe x2), prepare (3x match + circle +
triangulate), solve (RANSAC+GN), plus finer sub-ops.  The sum of stages
slightly exceeds the fused step (XLA fuses across seams), but the RATIOS
say where optimization effort pays.

Usage:  python benchmarks/stage_profile.py [--reps=8] [--chain=128]
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

    from libviso_tpu.config import Calib, PipelineConfig
    from libviso_tpu.geometry.mvg import F_from_P_host
    from libviso_tpu.pipeline.stereo import (
        build_frontend, build_prepare, build_solve, build_frame_step,
        empty_state, zero_solve_input)
    from libviso_tpu.synthetic import generate_sequence
    from libviso_tpu.utils.profiling import profile_kernel, _per_iteration

    reps = _flag("reps", 8)
    chain = _flag("chain", 128)
    only = _flag("only", "")  # comma-separated substrings; empty = all

    cfg = PipelineConfig()
    seq = generate_sequence(num_frames=8, num_points=900, seed=0,
                            width=1241, height=376, f=718.856,
                            base=0.5371657, speed=0.8)
    calib = Calib.from_projections(seq.P1, seq.P2)
    F = jnp.asarray(F_from_P_host(seq.P1, seq.P2))
    frames_np = np.stack(
        [np.stack([f[0], f[1]]) for f in seq.frames]).astype(np.float32)
    stacks = [jnp.asarray(frames_np * (1.0 + 0.002 * k))
              for k in range(reps + 4)]
    key = jax.random.PRNGKey(0)

    frontend = build_frontend(cfg)
    prepare = build_prepare(calib, F, cfg)
    solve = build_solve(calib, cfg)
    step = build_frame_step(calib, F, cfg)

    # Real state/SolveInput for representative sparsity: run 2 steps.
    st = empty_state(cfg)
    for t in range(2):
        st, _ = jax.jit(step)(st, jnp.asarray(frames_np[t][0]),
                              jnp.asarray(frames_np[t][1]),
                              jax.random.fold_in(key, t))
    feats_ref = jax.jit(frontend)(jnp.asarray(frames_np[2][0]),
                                  jnp.asarray(frames_np[2][1]))
    _, si_ref, _ = jax.jit(prepare)(feats_ref, st)
    jax.block_until_ready(si_ref)

    rows = []

    def _selected(name):
        return (not only) or any(s in name for s in only.split(","))

    def chained(name, fn_body):
        """fn_body(carry_scalar, i) -> scalar; chained `chain` times."""
        if not _selected(name):
            return

        def fn(x):
            def body(c, i):
                return fn_body(c, i, x), None
            return lax.scan(body, jnp.float32(0), jnp.arange(chain))[0]
        st_ = profile_kernel(name, jax.jit(fn), (), 1.0 * chain,
                             1.0 * chain, reps=reps,
                             make_args=lambda i: (stacks[i % len(stacks)],))
        st_ = _per_iteration(st_, chain)
        rows.append((name, st_.seconds * 1e3))
        print(f"{name:34s} {st_.seconds*1e3:7.3f} ms", file=sys.stderr)

    # --- full step (reference point) ---
    def full_body(c, i, x):
        s0 = empty_state(cfg)
        f = x[i % x.shape[0]]
        _, out = step(s0._replace(
            kp1=st.kp1, kp2=st.kp2, d1=st.d1, d2=st.d2,
            match_lr=st.match_lr, X=st.X, X_valid=st.X_valid),
            f[0] * (1.0 + c), f[1] * (1.0 + c),
            jax.random.fold_in(key, i))
        return jnp.sum(out.tr) * 1e-9 + c * 0.5

    chained("full_step", full_body)

    # uint8-framed variants: the bench/CLI-realistic path (auto-i8
    # descriptor gather engages for integer sources).  Per-rep variation
    # rides DISTINCT pre-staged uint8 stacks; in-chain variation rides
    # the frame index + fold_in key (XLA cannot CSE across i), with a
    # carry->key data dependency so links stay sequential.
    u8_stacks = [jnp.asarray(
        np.clip(frames_np + rng_k, 0, 255).astype(np.uint8))
        for rng_k in (np.random.default_rng(s).integers(
            0, 6, frames_np.shape) for s in range(reps + 4))]

    def full_u8_body(c, i, x):
        s0 = empty_state(cfg)
        f = x[i % x.shape[0]]
        k = jax.random.fold_in(key, i + (c > 1e30).astype(jnp.int32))
        _, out = step(s0._replace(
            kp1=st.kp1, kp2=st.kp2, d1=st.d1, d2=st.d2,
            match_lr=st.match_lr, X=st.X, X_valid=st.X_valid),
            f[0], f[1], k)
        return jnp.sum(out.tr) * 1e-9 + c * 0.5

    def chained_u8(name, fn_body):
        if not _selected(name):
            return

        def fn(x):
            def body(c, i):
                return fn_body(c, i, x), None
            return lax.scan(body, jnp.float32(0), jnp.arange(chain))[0]
        st_ = profile_kernel(name, jax.jit(fn), (), 1.0 * chain,
                             1.0 * chain, reps=reps,
                             make_args=lambda i: (
                                 u8_stacks[i % len(u8_stacks)],))
        st_ = _per_iteration(st_, chain)
        rows.append((name, st_.seconds * 1e3))
        print(f"{name:34s} {st_.seconds*1e3:7.3f} ms", file=sys.stderr)

    chained_u8("full_step (uint8/auto-i8)", full_u8_body)

    def fe_u8_body(c, i, x):
        f = x[i % x.shape[0]]
        sel = (c > 1e30).astype(jnp.uint8)  # always 0, breaks CSE/hoist
        feats = frontend(f[0] + sel, f[1] + sel)
        return (jnp.sum(feats.d1) + jnp.sum(feats.kp1.xy)) * 1e-12

    chained_u8("frontend x2 (uint8/auto-i8)", fe_u8_body)

    # --- frontend only ---
    def fe_body(c, i, x):
        f = x[i % x.shape[0]]
        feats = frontend(f[0] * (1.0 + c), f[1] * (1.0 + c))
        return (jnp.sum(feats.d1) + jnp.sum(feats.kp1.xy)) * 1e-12

    chained("frontend(detect+describe x2)", fe_body)

    # --- prepare only (features perturbed per link) ---
    def prep_body(c, i, x):
        feats = feats_ref._replace(d1=feats_ref.d1 * (1.0 + c))
        _, si, _ = prepare(feats, st)
        return jnp.sum(si.obs) * 1e-12 + jnp.sum(si.Xp) * 1e-12

    chained("prepare(3xmatch+circle+tri)", prep_body)

    # --- solve only ---
    def solve_body(c, i, x):
        si = si_ref._replace(Xp=si_ref.Xp * (1.0 + c))
        out = solve(si, jax.random.fold_in(key, i))
        return jnp.sum(out.tr) * 1e-9

    chained("solve(ransac+gn)", solve_body)

    # --- sub-ops of prepare ---
    from libviso_tpu.ops.matching import match_frame_triple

    def match_body(c, i, x):
        d1 = feats_ref.d1 * (1.0 + c)
        mlr, m11, m22 = match_frame_triple(
            feats_ref.kp1, d1, feats_ref.kp2, feats_ref.d2,
            st.kp1, st.d1, st.kp2, st.d2,
            cfg.stereo_match, cfg.temporal_match, F)
        return (jnp.sum(mlr.idx) + jnp.sum(m11.idx)
                + jnp.sum(m22.idx)).astype(jnp.float32) * 1e-12

    chained("  match_frame_triple", match_body)

    # --- sub-ops of frontend: detection without descriptors ---
    from libviso_tpu.ops.features import (
        detect_and_describe, detect_harris_binned, extract_descriptors,
        harris_response)

    def det_body(c, i, x):
        f = x[i % x.shape[0]]
        ims = jnp.stack([f[0], f[1]]) * (1.0 + c)
        kps, ds = jax.vmap(
            lambda im: detect_and_describe(im, cfg.detector))(ims)
        return jnp.sum(ds) * 1e-12

    chained("  detect_and_describe x2", det_body)

    det = cfg.detector

    def harris_body(c, i, x):
        f = x[i % x.shape[0]]
        ims = jnp.stack([f[0], f[1]]) * (1.0 + c)
        r = jax.vmap(lambda im: harris_response(
            im, det.block_size, det.aperture, det.harris_k))(ims)
        return jnp.sum(jnp.abs(r)) * 1e-12

    chained("    harris_response x2", harris_body)

    def binned_body(c, i, x):
        f = x[i % x.shape[0]]
        ims = jnp.stack([f[0], f[1]]) * (1.0 + c)
        kps = jax.vmap(lambda im: detect_harris_binned(im, det))(ims)
        return (jnp.sum(kps.xy) + jnp.sum(kps.response)) * 1e-12

    chained("    harris+binned_topk x2", binned_body)

    kp_ref = jax.jit(lambda im: detect_harris_binned(im, det))(
        jnp.asarray(frames_np[2][0]))
    jax.block_until_ready(kp_ref)

    def desc_body(c, i, x):
        f = x[i % x.shape[0]]
        ims = jnp.stack([f[0], f[1]]) * (1.0 + c)
        ds = jax.vmap(lambda im: extract_descriptors(im, kp_ref, det))(ims)
        return jnp.sum(ds) * 1e-12

    chained("    extract_descriptors x2", desc_body)

    import dataclasses as _dc
    det_i8 = _dc.replace(det, descriptor_gather="onehot_i8")
    det_take = _dc.replace(det, descriptor_gather="take")

    def desc_i8_body(c, i, x):
        f = x[i % x.shape[0]]
        ims = jnp.stack([f[0], f[1]]) * (1.0 + c)
        ds = jax.vmap(
            lambda im: extract_descriptors(im, kp_ref, det_i8))(ims)
        return jnp.sum(ds) * 1e-12

    chained("    extract_desc[i8] x2", desc_i8_body)

    def desc_take_body(c, i, x):
        f = x[i % x.shape[0]]
        ims = jnp.stack([f[0], f[1]]) * (1.0 + c)
        ds = jax.vmap(
            lambda im: extract_descriptors(im, kp_ref, det_take))(ims)
        return jnp.sum(ds) * 1e-12

    chained("    extract_desc[take] x2", desc_take_body)

    def desc_banded_body(c, i, x):
        f = x[i % x.shape[0]]
        ims = jnp.stack([f[0], f[1]]) * (1.0 + c)
        ds = jax.vmap(lambda im: extract_descriptors(
            im, kp_ref, det, binned_layout=True))(ims)
        return jnp.sum(ds) * 1e-12

    chained("    extract_desc[banded] x2", desc_banded_body)

    def desc_banded_i8_body(c, i, x):
        f = x[i % x.shape[0]]
        ims = jnp.stack([f[0], f[1]]) * (1.0 + c)
        ds = jax.vmap(lambda im: extract_descriptors(
            im, kp_ref, det_i8, binned_layout=True))(ims)
        return jnp.sum(ds) * 1e-12

    chained("    extract_desc[banded_i8] x2", desc_banded_i8_body)

    print("\nstage table (ms):", file=sys.stderr)
    for n, ms in rows:
        print(f"  {n:34s} {ms:7.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
