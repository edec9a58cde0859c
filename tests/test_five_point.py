"""Nister 5-point essential solver (SURVEY.md C3, reference parity with
OpenCV findEssentialMat, src/viso.cpp:1384).

Oracle pattern (SURVEY.md §4): known (R, t) -> exact correspondences ->
the solver's candidate set must contain the true E.  Plus the planar-scene
case where the 8-point solver degenerates and 5-point must not.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libviso_tpu.geometry.essential import (
    ransac_essential,
    recover_pose,
)
from libviso_tpu.geometry.five_point import (
    _constraints,
    five_point_E,
    real_roots_deg10,
)


def _skew(t):
    return np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])


def _euler(rx, ry, rz):
    cx, sx, cy, sy = np.cos(rx), np.sin(rx), np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _scene(seed, n=5, planar=False):
    rng = np.random.default_rng(seed)
    R = _euler(*rng.uniform(-0.3, 0.3, 3))
    t = rng.uniform(-1, 1, 3)
    t /= np.linalg.norm(t)
    E = _skew(t) @ R
    E /= np.linalg.norm(E)
    if planar:
        # all points on a plane: 8-point's F-family degeneracy
        u = rng.uniform(-5, 5, n)
        v = rng.uniform(-3, 3, n)
        X = np.stack([u, v, 10.0 + 0.3 * u + 0.2 * v], axis=-1)
    else:
        X = np.stack([rng.uniform(-5, 5, n), rng.uniform(-3, 3, n),
                      rng.uniform(4, 20, n)], axis=-1)
    x1 = X[:, :2] / X[:, 2:3]
    X2 = (R @ X.T).T + t
    x2 = X2[:, :2] / X2[:, 2:3]
    return R, t, E, x1, x2


def _best_err(E_cands, valid, E_true):
    errs = [min(np.linalg.norm(e - E_true), np.linalg.norm(e + E_true))
            for e, v in zip(np.asarray(E_cands), np.asarray(valid)) if v]
    return min(errs) if errs else np.inf


@pytest.mark.slow
def test_five_point_oracle_recovery(rng):
    """>= 90% of exact minimal problems must contain the true E."""
    ok = 0
    for seed in range(30):
        _, _, E_true, x1, x2 = _scene(seed)
        E, valid = five_point_E(jnp.asarray(x1, jnp.float32),
                                jnp.asarray(x2, jnp.float32))
        if _best_err(E, valid, E_true) < 1e-2:
            ok += 1
    assert ok >= 27, f"only {ok}/30 oracle recoveries"


def test_candidates_satisfy_constraints_and_epipolar():
    _, _, _, x1, x2 = _scene(3)
    x1j = jnp.asarray(x1, jnp.float32)
    x2j = jnp.asarray(x2, jnp.float32)
    E, valid = five_point_E(x1j, x2j)
    E = np.asarray(E)
    h1 = np.concatenate([x1, np.ones((5, 1))], axis=1)
    h2 = np.concatenate([x2, np.ones((5, 1))], axis=1)
    for e, v in zip(E, np.asarray(valid)):
        if not v:
            continue
        # essential-manifold constraints
        c = np.asarray(_constraints(jnp.asarray(e)))
        assert np.abs(c).max() < 1e-3
        # epipolar fit of the 5 sample points
        resid = np.abs(np.einsum("ni,ij,nj->n", h2, e, h1))
        assert resid.max() < 1e-4


def test_batched_under_jit(rng):
    x1 = jnp.asarray(rng.uniform(-0.5, 0.5, (16, 5, 2)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(-0.5, 0.5, (16, 5, 2)), jnp.float32)
    E, valid = jax.jit(five_point_E)(x1, x2)
    assert E.shape == (16, 22, 3, 3)
    assert valid.shape == (16, 22)
    assert bool(valid.any())


def test_real_roots_known_polynomial():
    # p(z) = (z-1)(z+2)(z-0.5)(z^2+1) * (z^5 + 3) has real roots
    # {1, -2, 0.5, -3^(1/5)}
    import numpy.polynomial.polynomial as P

    p = P.polyfromroots([1.0, -2.0, 0.5])
    p = P.polymul(p, [1.0, 0, 1.0])          # z^2 + 1 (no real roots)
    p = P.polymul(p, [3.0, 0, 0, 0, 0, 1.0])  # z^5 + 3
    coeffs = jnp.asarray(p, jnp.float32)      # degree 10, ascending
    roots, valid = real_roots_deg10(coeffs)
    got = np.sort(np.asarray(roots)[np.asarray(valid)])
    expect = np.sort([1.0, -2.0, 0.5, -3.0 ** 0.2])
    # sign-change slots must contain all 4 real roots
    found = [np.min(np.abs(got - e)) < 1e-4 for e in expect]
    assert all(found), (got, expect)


@pytest.mark.slow
def test_ransac_5pt_planar_scene(rng):
    """Planar scenes break the 8-point minimal solver; 5-point must not."""
    R, t, E_true, x1, x2 = _scene(7, n=120, planar=True)
    key = jax.random.PRNGKey(0)
    res = ransac_essential(key, jnp.asarray(x1, jnp.float32),
                           jnp.asarray(x2, jnp.float32),
                           num_hypotheses=64, method="5pt",
                           sampson_thresh=1e-6)
    assert bool(res.ok)
    # pose recovery from the estimated E
    Rr, tr, _, n_good = recover_pose(
        res.E, jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32))
    assert int(n_good) > 100
    assert np.allclose(np.asarray(Rr), R, atol=5e-2)
    assert np.abs(np.asarray(tr) @ t) > 0.99


def test_ransac_5pt_with_outliers(rng):
    R, t, E_true, x1, x2 = _scene(11, n=150)
    x2 = x2.copy()
    out = rng.random(150) < 0.3
    x2[out] += rng.uniform(-0.2, 0.2, (int(out.sum()), 2))
    key = jax.random.PRNGKey(1)
    res = ransac_essential(key, jnp.asarray(x1, jnp.float32),
                           jnp.asarray(x2, jnp.float32),
                           num_hypotheses=64, method="5pt",
                           sampson_thresh=1e-6)
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    # inliers should be mostly the clean points
    assert inl[~out].mean() > 0.9
    assert inl[out].mean() < 0.2


def test_ransac_method_validation(rng):
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (30, 2)), jnp.float32)
    with pytest.raises(ValueError, match="unknown method"):
        ransac_essential(jax.random.PRNGKey(0), x, x, method="7pt")
