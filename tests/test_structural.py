"""Structural place-recognition primitives (ops/structural.py).

These validate the cloud-level algorithms directly: rigid-invariant
kNN-distance descriptors, the batched store matcher, Procrustes RANSAC
seeding, and ICP refinement — including a 180-degree relative rotation
with partial overlap and noise, the regime appearance descriptors
cannot survive.  End-to-end 180-degree closure on RENDERED frames is a
measured dead end for a different reason (co-detection of the same
landmarks across opposite views is below the random floor —
docs/limitations.md "Loop-closure invariance"), so the pipeline-level
capability claims stay honest while the primitives are kept correct
for clouds with real overlap (same-heading keyframes, external
clouds).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libviso_tpu.geometry.procrustes import ransac_rigid_motion
from libviso_tpu.ops.structural import (
    build_icp_refiner,
    build_structural_matcher,
    knn_distance_descriptors,
)


def _cloud(rng, n, span=10.0):
    return np.stack([
        rng.uniform(-span, span, n),
        rng.uniform(-2.0, 2.0, n),
        rng.uniform(2.0, span + 2.0, n),
    ], axis=-1).astype(np.float32)


def _rigid(yaw_deg, t):
    c, s = np.cos(np.radians(yaw_deg)), np.sin(np.radians(yaw_deg))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    T[:3, 3] = t
    return T


def test_knn_descriptors_rigid_invariant():
    rng = np.random.default_rng(0)
    X = _cloud(rng, 200)
    v = np.ones((200,), bool)
    # keep the rotated cloud at positive depth (the descriptor's
    # camera-frame z gate is pipeline semantics, not part of invariance)
    T = _rigid(137.0, [3.0, 0.5, 20.0])
    Xr = X @ T[:3, :3].T + T[:3, 3]
    d1, u1 = knn_distance_descriptors(jnp.asarray(X), jnp.asarray(v),
                                      k=8, max_depth=1e9)
    d2, u2 = knn_distance_descriptors(jnp.asarray(Xr), jnp.asarray(v),
                                      k=8, max_depth=1e9)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


def test_knn_descriptors_depth_gate_and_padding():
    rng = np.random.default_rng(1)
    X = _cloud(rng, 64)
    X[10, 2] = 500.0          # beyond the gate
    v = np.ones((64,), bool)
    v[20:] = False            # padded slots
    d, u = knn_distance_descriptors(jnp.asarray(X), jnp.asarray(v),
                                    k=4, max_depth=50.0)
    u = np.asarray(u)
    assert not u[10] and not u[20:].any()
    # invalid rows are zeroed
    assert np.all(np.asarray(d)[~u] == 0.0)
    # valid rows carry ascending positive distances
    dv = np.asarray(d)[u]
    assert (dv > 0).all() and (np.diff(dv, axis=1) >= 0).all()


def test_structural_match_and_verify_at_180deg():
    """The full cloud-level chain: descriptors -> batched store match ->
    Procrustes RANSAC -> ICP, across a 180-degree yaw with 90% overlap
    and 5 cm noise — a regime where Sobel-patch appearance matching is
    structurally blind (orientation-dependent windows).  90% co-visible
    overlap is the measured working envelope for kNN-profile
    descriptors on UNIFORM random fields (see
    test_structural_overlap_boundary: profiles corrupt below ~85%
    because foreign points intrude into the k-NN sets on both sides)."""
    rng = np.random.default_rng(2)
    B = 256
    n_shared, n_own = 230, 26
    shared = _cloud(rng, n_shared, span=8.0)
    T_true = _rigid(180.0, [0.0, 0.0, 16.0])

    X_old = np.concatenate([shared, _cloud(rng, n_own, span=8.0)])
    new_shared = shared @ T_true[:3, :3].T + T_true[:3, 3]
    X_new = np.concatenate([new_shared
                            + rng.normal(0, 0.05, (n_shared, 3)),
                            _cloud(rng, n_own, span=8.0)]
                           ).astype(np.float32)
    perm = rng.permutation(B)
    X_new = X_new[perm]
    v = np.ones((B,), bool)

    k = 8
    d_old, u_old = knn_distance_descriptors(
        jnp.asarray(X_old), jnp.asarray(v), k=k, max_depth=1e9)
    d_new, u_new = knn_distance_descriptors(
        jnp.asarray(X_new), jnp.asarray(v), k=k, max_depth=1e9)

    # store of 4 keyframes: slot 2 is the true revisit, others decoys
    K = 4
    kf_desc, kf_valid, kf_X = [], [], []
    for i in range(K):
        if i == 2:
            kf_desc.append(np.asarray(d_old))
            kf_valid.append(np.asarray(u_old))
            kf_X.append(X_old)
        else:
            Xd = _cloud(np.random.default_rng(10 + i), B, span=8.0)
            dd, ud = knn_distance_descriptors(
                jnp.asarray(Xd), jnp.asarray(v), k=k, max_depth=1e9)
            kf_desc.append(np.asarray(dd))
            kf_valid.append(np.asarray(ud))
            kf_X.append(Xd)
    matcher = build_structural_matcher(K, B, k, ratio=0.85)
    idx, vmatch, scores = matcher(d_new, u_new,
                                  jnp.asarray(np.stack(kf_desc)),
                                  jnp.asarray(np.stack(kf_valid)))
    scores = np.asarray(scores)
    # raw match counts carry an ALIAS FLOOR (random local distance
    # profiles in a uniform field look alike), so — exactly as in the
    # appearance path — the count only gates candidacy; geometric
    # verification is the arbiter.  The true revisit must be a live
    # candidate...
    assert scores[2] >= 20, scores
    # ...and Procrustes RANSAC must single it out: only the true pair
    # admits a rigid model with real support.
    support = []
    for c in range(K):
        m_idx = np.asarray(idx[c])
        m_val = np.asarray(vmatch[c])
        _, _, n_in = ransac_rigid_motion(
            jax.random.PRNGKey(0), jnp.asarray(X_new),
            jnp.asarray(np.stack(kf_X)[c][np.clip(m_idx, 0, B - 1)]),
            jnp.asarray(m_val), num_hypotheses=512, inlier_thresh=0.3)
        support.append(int(n_in))
    assert support[2] >= 30, support
    assert all(support[c] <= 12 for c in (0, 1, 3)), support
    T_seed, _, _ = ransac_rigid_motion(
        jax.random.PRNGKey(0), jnp.asarray(X_new),
        jnp.asarray(np.stack(kf_X)[2][np.clip(np.asarray(idx[2]), 0,
                                               B - 1)]),
        jnp.asarray(np.asarray(vmatch[2])), num_hypotheses=512,
        inlier_thresh=0.3)

    icp = build_icp_refiner(radius=0.4, iters=3)
    T_fit, _, _, n_icp = icp(T_seed, jnp.asarray(X_old),
                             jnp.asarray(v), jnp.asarray(X_new),
                             jnp.asarray(v))
    T_fit = np.asarray(T_fit)
    dR = T_fit[:3, :3].T @ T_true[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    dt = np.linalg.norm(T_fit[:3, 3] - T_true[:3, 3])
    assert ang < 1.0 and dt < 0.15, (ang, dt)
    assert int(n_icp) >= 100


def test_structural_overlap_boundary():
    """Measured capability boundary, kept as a regression oracle: on a
    UNIFORM random field the kNN-profile descriptors need ~85%+
    co-visible overlap — at 60% the foreign points corrupt both sides'
    neighbor sets and true matches collapse toward the alias floor.
    (Structured real scenes are more distinctive; this is the
    worst-case field.)"""
    rng = np.random.default_rng(2)
    B, k = 256, 8
    results = {}
    for frac in (0.9, 0.6):
        n_shared = int(B * frac)
        shared = _cloud(rng, n_shared, span=8.0)
        T_true = _rigid(180.0, [0.0, 0.0, 16.0])
        X_old = np.concatenate([shared,
                                _cloud(rng, B - n_shared, span=8.0)])
        new_shared = (shared @ T_true[:3, :3].T + T_true[:3, 3]
                      + rng.normal(0, 0.05, (n_shared, 3)))
        X_new = np.concatenate([new_shared,
                                _cloud(rng, B - n_shared, span=8.0)]
                               ).astype(np.float32)
        v = jnp.ones((B,), bool)
        d_old, u_old = knn_distance_descriptors(
            jnp.asarray(X_old), v, k=k, max_depth=1e9)
        d_new, u_new = knn_distance_descriptors(
            jnp.asarray(X_new), v, k=k, max_depth=1e9)
        matcher = build_structural_matcher(1, B, k, ratio=0.85)
        idx, vmatch, _ = matcher(d_new, u_new, d_old[None], u_old[None])
        m_idx = np.asarray(idx[0])
        m_val = np.asarray(vmatch[0])
        true_m = m_val[:n_shared] & (m_idx[:n_shared]
                                     == np.arange(n_shared))
        results[frac] = int(true_m.sum())
    assert results[0.9] >= 40, results
    assert results[0.6] <= results[0.9] // 3, results


def test_structural_matcher_rejects_unrelated_clouds():
    """No-overlap clouds must not produce a confident candidate: scores
    stay at the alias floor and RANSAC support stays minimal."""
    rng = np.random.default_rng(3)
    B, k = 192, 8
    v = jnp.ones((B,), bool)
    Xa = _cloud(rng, B)
    Xb = _cloud(rng, B)
    da, ua = knn_distance_descriptors(jnp.asarray(Xa), v, k=k,
                                      max_depth=1e9)
    db, ub = knn_distance_descriptors(jnp.asarray(Xb), v, k=k,
                                      max_depth=1e9)
    matcher = build_structural_matcher(1, B, k, ratio=0.85)
    idx, vmatch, scores = matcher(da, ua, db[None], ub[None])
    m_val = np.asarray(vmatch[0])
    T, _, n_in = ransac_rigid_motion(
        jax.random.PRNGKey(1), jnp.asarray(Xa),
        jnp.asarray(Xb[np.clip(np.asarray(idx[0]), 0, B - 1)]),
        jnp.asarray(m_val), num_hypotheses=512, inlier_thresh=0.3)
    # alias matches exist, but no rigid model explains more than a few
    assert int(n_in) <= max(8, int(0.15 * max(1, m_val.sum())))


def test_icp_holds_pose_on_support_collapse():
    """A seed far from any alignment must not blow up: with no pairs in
    radius the refiner keeps the seed pose instead of producing NaNs."""
    rng = np.random.default_rng(4)
    X = _cloud(rng, 64)
    v = jnp.ones((64,), bool)
    T0 = jnp.asarray(_rigid(90.0, [500.0, 0.0, 0.0]))
    icp = build_icp_refiner(radius=0.2, iters=2)
    T, _, _, n = icp(T0, jnp.asarray(X), v, jnp.asarray(X), v)
    assert np.isfinite(np.asarray(T)).all()
    assert int(n) == 0
    np.testing.assert_allclose(np.asarray(T), np.asarray(T0), atol=1e-5)
