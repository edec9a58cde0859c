"""Multi-stream serving mode (pipeline/multistream.py).

Contract under test: stream s of a vmapped S-stream run matches running
that sequence alone through run_stereo_sequence with the same seed —
identical discrete decisions (ok flags, match/inlier counts), motions
within f32 float noise (vmap lowers to batched XLA ops whose accumulation
order differs from the solo graph at the ULP level — measured ~1e-7; see
the module docstring), and end-pose/ATE agreement well below any
trajectory-meaningful scale.
"""

import numpy as np
import pytest

from libviso_tpu.config import DetectorConfig, PipelineConfig, RansacConfig
from libviso_tpu.pipeline import run_stereo_sequence
from libviso_tpu.pipeline.multistream import run_multistream
from libviso_tpu.synthetic import generate_sequence


@pytest.fixture(scope="module")
def tiny_cfg():
    return PipelineConfig(
        detector=DetectorConfig(max_features=120, nbinx=6, nbiny=2,
                                num_slots=128),
        ransac=RansacConfig(num_hypotheses=16, gn_iters=10),
    )


def test_multistream_matches_solo_runs(tiny_cfg):
    """Two streams with different scenes, lengths, seeds, and calibration
    (focal lengths differ): each stream must reproduce its solo run —
    discrete stats exactly, motions/poses within f32 float noise.
    Unequal lengths exercise the idle-on-last-frame path for the shorter
    stream."""
    seq_a = generate_sequence(num_frames=6, num_points=300, width=160,
                              height=96, f=120.0, seed=3)
    seq_b = generate_sequence(num_frames=4, num_points=260, width=160,
                              height=96, f=140.0, seed=11, speed=0.6)

    solo_a = run_stereo_sequence(seq_a.frames, seq_a.P1, seq_a.P2,
                                 tiny_cfg, seed=0)
    solo_b = run_stereo_sequence(seq_b.frames, seq_b.P1, seq_b.P2,
                                 tiny_cfg, seed=1)

    multi = run_multistream([seq_a.frames, seq_b.frames],
                            [seq_a.P1, seq_b.P1], [seq_a.P2, seq_b.P2],
                            tiny_cfg, seeds=[0, 1])

    for solo, got in ((solo_a, multi[0]), (solo_b, multi[1])):
        # discrete per-frame decisions: exact
        np.testing.assert_array_equal(got.frame_ok, solo.frame_ok)
        assert len(got.stats) == len(solo.stats)
        for gs, ss in zip(got.stats, solo.stats):
            for k in ("frame", "ok", "num_kp1", "num_lr", "num_circle",
                      "num_inliers"):
                assert gs[k] == ss[k], (k, gs, ss)
        # continuous outputs: f32 float-noise tolerance (vmap batching
        # reorders accumulations; see module docstring)
        np.testing.assert_allclose(got.motions, solo.motions,
                                   rtol=0, atol=5e-6)
        np.testing.assert_allclose(got.poses, solo.poses,
                                   rtol=0, atol=5e-5)


def test_multistream_chunk_matches_per_frame(tiny_cfg):
    """S=2 streams x K=2 frames per dispatch (build_multistream_chunk)
    must reproduce the per-frame multistream drive: discrete decisions
    exactly, motions within f32 float noise (the scan-over-vmapped-step
    composition runs the same batched per-frame program; only fusion
    boundaries differ)."""
    import jax
    import jax.numpy as jnp

    from libviso_tpu.config import Calib
    from libviso_tpu.geometry.mvg import F_from_P_host
    from libviso_tpu.pipeline.multistream import (
        build_multistream_chunk,
        stack_states,
    )
    from libviso_tpu.pipeline.stereo import empty_state

    seq_a = generate_sequence(num_frames=4, num_points=300, width=160,
                              height=96, f=120.0, seed=3)
    seq_b = generate_sequence(num_frames=4, num_points=260, width=160,
                              height=96, f=140.0, seed=11, speed=0.6)
    multi = run_multistream([seq_a.frames, seq_b.frames],
                            [seq_a.P1, seq_b.P1], [seq_a.P2, seq_b.P2],
                            tiny_cfg, seeds=[0, 1])

    S, K, T = 2, 2, 4
    seqs = (seq_a, seq_b)
    calib4 = np.zeros((S, 4), np.float32)
    Fs = np.zeros((S, 3, 3))
    for s, sq in enumerate(seqs):
        c = Calib.from_projections(sq.P1, sq.P2)
        calib4[s] = [c.f, c.cu, c.cv, c.base]
        Fs[s] = F_from_P_host(sq.P1, sq.P2)
    step = jax.jit(build_multistream_chunk(tiny_cfg, K))
    states = stack_states([empty_state(tiny_cfg) for _ in range(S)])
    keys = [jax.random.PRNGKey(s) for s in range(S)]

    motions = [[] for _ in range(S)]
    oks = [[] for _ in range(S)]
    for g in range(T // K):
        ls = jnp.stack([jnp.stack([jnp.asarray(seqs[s].frames[g * K + i][0])
                                   for i in range(K)]) for s in range(S)])
        rs = jnp.stack([jnp.stack([jnp.asarray(seqs[s].frames[g * K + i][1])
                                   for i in range(K)]) for s in range(S)])
        ks = jnp.stack([jnp.stack([jax.random.fold_in(keys[s], g * K + i)
                                   for i in range(K)]) for s in range(S)])
        states, out = step(jnp.asarray(calib4), jnp.asarray(Fs), states,
                           ls, rs, ks)
        for s in range(S):
            for i in range(K):
                t = g * K + i
                motions[s].append(np.asarray(out.tr[s, i]))
                oks[s].append(bool(out.ok[s, i]) and t != 0)

    for s in range(S):
        np.testing.assert_array_equal(np.array(oks[s]),
                                      multi[s].frame_ok)
        np.testing.assert_allclose(np.stack(motions[s]), multi[s].motions,
                                   rtol=0, atol=5e-6)


def test_multistream_dropout_recovery_composes(tiny_cfg):
    """cfg-level dropout recovery (keep_features_on_failure) rides the
    vmapped step unchanged: a stream with a black frame recovers exactly
    like its solo run, and the healthy stream is unaffected."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg, keep_features_on_failure=True)
    seq_a = generate_sequence(num_frames=6, num_points=300, width=160,
                              height=96, f=120.0, seed=3)
    frames_a = list(seq_a.frames)
    black = np.zeros_like(frames_a[3][0])
    frames_a[3] = (black, black)                  # mid-sequence dropout
    seq_b = generate_sequence(num_frames=6, num_points=260, width=160,
                              height=96, f=140.0, seed=11, speed=0.6)

    solo_a = run_stereo_sequence(frames_a, seq_a.P1, seq_a.P2, cfg,
                                 seed=0)
    solo_b = run_stereo_sequence(seq_b.frames, seq_b.P1, seq_b.P2, cfg,
                                 seed=1)
    assert not solo_a.frame_ok[3]                 # the dropout registered
    assert solo_a.frame_ok[4]                     # and the next frame
    #                                               recovered the span
    multi = run_multistream([frames_a, list(seq_b.frames)],
                            [seq_a.P1, seq_b.P1], [seq_a.P2, seq_b.P2],
                            cfg, seeds=[0, 1])
    for solo, got in ((solo_a, multi[0]), (solo_b, multi[1])):
        np.testing.assert_array_equal(got.frame_ok, solo.frame_ok)
        np.testing.assert_allclose(got.motions, solo.motions,
                                   rtol=0, atol=5e-6)


def test_multistream_checkpoint_resume_bit_exact(tiny_cfg, tmp_path):
    """Serving resume: a crash-truncated multistream run + resume with
    the full frame lists reproduces the uninterrupted run bit-exactly
    (per-frame keys are absolute-t fold_ins; the snapshot carries the
    full S-stream state).  Unequal lengths exercise idle-frame replay."""
    from libviso_tpu.utils.checkpoint import CheckpointManager

    seq_a = generate_sequence(num_frames=6, num_points=300, width=160,
                              height=96, f=120.0, seed=3)
    seq_b = generate_sequence(num_frames=5, num_points=260, width=160,
                              height=96, f=140.0, seed=11, speed=0.6)
    seqs = [seq_a.frames, seq_b.frames]
    P1s, P2s = [seq_a.P1, seq_b.P1], [seq_a.P2, seq_b.P2]

    full = run_multistream(seqs, P1s, P2s, tiny_cfg, seeds=[0, 1])

    mgr = CheckpointManager(str(tmp_path / "ck"), every=2)
    run_multistream([s[:4] for s in seqs], P1s, P2s, tiny_cfg,
                    seeds=[0, 1], checkpoint=mgr)
    assert mgr.latest().next_frame == 4

    resumed = run_multistream(seqs, P1s, P2s, tiny_cfg, seeds=[0, 1],
                              checkpoint=mgr)
    for got, ref in zip(resumed, full):
        np.testing.assert_array_equal(got.motions, ref.motions)
        np.testing.assert_array_equal(got.frame_ok, ref.frame_ok)
        np.testing.assert_allclose(got.poses, ref.poses, rtol=0, atol=0)
        assert got.stats == ref.stats

    import pytest as _pytest

    with _pytest.raises(ValueError, match="fingerprint"):
        run_multistream(seqs, P1s, P2s, tiny_cfg, seeds=[0, 2],
                        checkpoint=mgr)


def test_multistream_sharded_over_mesh_matches_unsharded(tiny_cfg):
    """Serving scale-out: the stream axis sharded over the 8-device CPU
    mesh (jit_multistream_sharded) must reproduce the single-device
    vmapped step — streams are independent, the partition inserts no
    collectives, and per-stream compute never crosses the shard
    boundary."""
    import jax
    import jax.numpy as jnp

    from libviso_tpu.config import Calib
    from libviso_tpu.geometry.mvg import F_from_P_host
    from libviso_tpu.parallel import make_mesh
    from libviso_tpu.pipeline.multistream import (
        build_multistream_step,
        jit_multistream_sharded,
        stack_states,
    )
    from libviso_tpu.pipeline.stereo import empty_state

    S = 8
    seqs = [generate_sequence(num_frames=2, num_points=260, width=160,
                              height=96, f=110.0 + 5 * s, seed=s)
            for s in range(S)]
    calib4 = np.zeros((S, 4), np.float32)
    Fs = np.zeros((S, 3, 3))
    for s, sq in enumerate(seqs):
        c = Calib.from_projections(sq.P1, sq.P2)
        calib4[s] = [c.f, c.cu, c.cv, c.base]
        Fs[s] = F_from_P_host(sq.P1, sq.P2)
    calib4, Fs = jnp.asarray(calib4), jnp.asarray(Fs)

    mesh = make_mesh(n_data=8, n_model=1)
    sharded = jit_multistream_sharded(mesh, tiny_cfg)
    plain = jax.jit(build_multistream_step(tiny_cfg))

    def drive(step):
        states = stack_states([empty_state(tiny_cfg) for _ in range(S)])
        outs = []
        for t in range(2):
            im1s = jnp.stack([jnp.asarray(seqs[s].frames[t][0])
                              for s in range(S)])
            im2s = jnp.stack([jnp.asarray(seqs[s].frames[t][1])
                              for s in range(S)])
            ks = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(s), t)
                            for s in range(S)])
            states, out = step(calib4, Fs, states, im1s, im2s, ks)
            outs.append(out)
        return outs

    for o_sh, o_pl in zip(drive(sharded), drive(plain)):
        np.testing.assert_array_equal(np.asarray(o_sh.ok),
                                      np.asarray(o_pl.ok))
        np.testing.assert_array_equal(np.asarray(o_sh.num_inliers),
                                      np.asarray(o_pl.num_inliers))
        np.testing.assert_allclose(np.asarray(o_sh.tr),
                                   np.asarray(o_pl.tr), rtol=0, atol=5e-6)


def test_stream_pool_replacement_no_recompile(tiny_cfg):
    """VERDICT r3 #9 — the serving-fleet lifecycle: a finished slot is
    re-seeded with a NEW sequence (different scene, calibration, seed)
    without recompiling, and every stream — original AND replacement —
    reproduces its solo run under the multistream contract (discrete
    stats exact, motions within f32 batching noise)."""
    import jax

    from libviso_tpu.pipeline.multistream import StreamPool

    seq_a = generate_sequence(num_frames=6, num_points=300, width=160,
                              height=96, f=120.0, seed=3)
    seq_b = generate_sequence(num_frames=3, num_points=260, width=160,
                              height=96, f=140.0, seed=11, speed=0.6)
    seq_c = generate_sequence(num_frames=4, num_points=280, width=160,
                              height=96, f=130.0, seed=21, speed=0.7)

    solos = {
        "a": run_stereo_sequence(seq_a.frames, seq_a.P1, seq_a.P2,
                                 tiny_cfg, seed=0),
        "b": run_stereo_sequence(seq_b.frames, seq_b.P1, seq_b.P2,
                                 tiny_cfg, seed=1),
        "c": run_stereo_sequence(seq_c.frames, seq_c.P1, seq_c.P2,
                                 tiny_cfg, seed=2),
    }

    pool = StreamPool(tiny_cfg, slots=2)
    pool.attach(0, seq_a.frames, seq_a.P1, seq_a.P2, seed=0)
    pool.attach(1, seq_b.frames, seq_b.P1, seq_b.P2, seed=1)
    results = {}
    # drive until b finishes, replace it with c IN THE SAME SLOT
    while 1 not in pool.finished():
        pool.step()
    compiles_before = pool._step._cache_size()
    results["b"] = pool.detach(1)
    pool.attach(1, seq_c.frames, seq_c.P1, seq_c.P2, seed=2)
    while pool.active():
        pool.step()
    # the replacement reused the compiled program: no new jit entries
    assert pool._step._cache_size() == compiles_before
    results["a"] = pool.detach(0)
    results["c"] = pool.detach(1)

    for name in ("a", "b", "c"):
        solo, got = solos[name], results[name]
        np.testing.assert_array_equal(got.frame_ok, solo.frame_ok)
        assert len(got.stats) == len(solo.stats)
        for gs, ss in zip(got.stats, solo.stats):
            for k in ("frame", "ok", "num_kp1", "num_lr", "num_circle",
                      "num_inliers"):
                assert gs[k] == ss[k], (name, k, gs, ss)
        np.testing.assert_allclose(got.motions, solo.motions,
                                   rtol=0, atol=5e-6)
        np.testing.assert_allclose(got.poses, solo.poses,
                                   rtol=0, atol=5e-5)
