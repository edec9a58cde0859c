"""Candidate-match launch cost vs keyframe-store size (VERDICT r3 #4).

The loop-closure candidate search matches a new keyframe against the
WHOLE store as one `match_problem_batch` launch (pipeline/loop.py).
With the fixed-slot design the launch never recompiles, but its cost
scales with `max_keyframes` — this script measures that scaling on the
real chip so the store-size knob has a price tag.

    python benchmarks/loop_store_scaling.py [--reps=6] [--chain=32]

One JSON line per store size to stdout; table to stderr.
"""

import json
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

    from libviso_tpu.config import PipelineConfig
    from libviso_tpu.pipeline.loop import _build_candidate_matcher
    from libviso_tpu.utils.profiling import _per_iteration, profile_kernel

    reps = _flag("reps", 6)
    chain = _flag("chain", 32)
    budget = 256
    cfg = PipelineConfig()
    d = cfg.detector.descriptor_dim_padded
    rng = np.random.default_rng(0)

    rows = []
    for K in (128, 256, 512, 1024):
        match_all = _build_candidate_matcher(cfg, K, budget, "xla", 0.8)
        base_q = rng.standard_normal((budget, d)).astype(np.float32)
        q_xy = jnp.asarray(rng.uniform(0, 400, (budget, 2)), jnp.float32)
        q_valid = jnp.ones((budget,), bool)
        kf_xy = jnp.asarray(rng.uniform(0, 400, (K, budget, 2)),
                            jnp.float32)
        kf_desc = jnp.asarray(
            rng.standard_normal((K, budget, d)), jnp.float32)
        kf_valid = jnp.ones((K, budget), bool)
        qs = [jnp.asarray(base_q * (1.0 + 0.001 * k))
              for k in range(reps + 4)]

        def fn(q):
            def body(c, i):
                idx, valid, scores = match_all(
                    q_xy, q * (1.0 + c), q_valid, kf_xy, kf_desc,
                    kf_valid)
                return jnp.sum(scores).astype(jnp.float32) * 1e-9, None
            return lax.scan(body, jnp.float32(0), jnp.arange(chain))[0]

        # FLOPs: K l2 matmuls (2*b*b*d) + the mask/argmin passes
        flops = K * 2.0 * budget * budget * d
        nbytes = 4.0 * K * (budget * d + budget * budget)
        st = profile_kernel(f"loop_store K={K}", jax.jit(fn), (),
                            flops * chain, nbytes * chain, reps=reps,
                            make_args=lambda i: (qs[i % len(qs)],))
        st = _per_iteration(st, chain)
        rows.append((K, st.seconds * 1e3))
        print(json.dumps({"store": K, "ms": st.seconds * 1e3,
                          "gflops": st.gflops}), flush=True)

    print(f"{'K':>6} {'ms/launch':>10}", file=sys.stderr)
    for K, ms in rows:
        print(f"{K:>6} {ms:10.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
