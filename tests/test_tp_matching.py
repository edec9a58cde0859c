"""Tensor-parallel matcher (SURVEY.md P3): bit-equality with the local one.

The contract: sharding the match-cost matrix column-wise over the 'model'
axis changes WHERE the work runs, not WHAT is computed — including argmin
tie-breaking (lowest global column index wins).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libviso_tpu.config import MatchConfig
from libviso_tpu.ops.features import Keypoints
from libviso_tpu.ops.matching import match_descriptors
from libviso_tpu.parallel import make_mesh, tp_match_descriptors
from libviso_tpu.parallel.tp_matching import merge_shard_minima


def _random_problem(rng, n1=64, n2=128, d=32, w=200.0, h=100.0):
    kp1 = Keypoints(
        xy=jnp.asarray(rng.uniform(0, [w, h], (n1, 2)), jnp.float32),
        response=jnp.asarray(rng.random(n1), jnp.float32),
        valid=jnp.asarray(rng.random(n1) > 0.1),
    )
    kp2 = Keypoints(
        xy=jnp.asarray(rng.uniform(0, [w, h], (n2, 2)), jnp.float32),
        response=jnp.asarray(rng.random(n2), jnp.float32),
        valid=jnp.asarray(rng.random(n2) > 0.1),
    )
    d1 = jnp.asarray(rng.standard_normal((n1, d)), jnp.float32)
    d2 = jnp.asarray(rng.standard_normal((n2, d)), jnp.float32)
    return kp1, d1, kp2, d2


def _assert_same(a, b):
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.dist), np.asarray(b.dist),
                               rtol=0, atol=0)


@pytest.mark.parametrize("n_model", [2, 4, 8])
def test_tp_matches_local_exactly(rng, n_model):
    kp1, d1, kp2, d2 = _random_problem(rng)
    cfg = MatchConfig(radius=120.0, use_ratio=True, ratio=0.9,
                      metric="l1")
    mesh = make_mesh(n_data=1, n_model=n_model)
    ref = match_descriptors(kp1, d1, kp2, d2, cfg)
    got = tp_match_descriptors(mesh, kp1, d1, kp2, d2, cfg)
    _assert_same(got, ref)


@pytest.mark.slow
def test_tp_with_epipolar_gate(rng):
    kp1, d1, kp2, d2 = _random_problem(rng, n1=32, n2=64, d=16)
    F = jnp.asarray(rng.standard_normal((3, 3)), jnp.float32)
    cfg = MatchConfig(radius=500.0, use_epipolar=True, sampson_thresh=50.0,
                      metric="l1",
                      use_ratio=False)
    mesh = make_mesh(n_data=1, n_model=4)
    ref = match_descriptors(kp1, d1, kp2, d2, cfg, F=F)
    got = tp_match_descriptors(mesh, kp1, d1, kp2, d2, cfg, F=F)
    _assert_same(got, ref)


@pytest.mark.slow
def test_tp_on_2d_mesh(rng):
    """'model' sharding must also work when a 'data' axis is present."""
    kp1, d1, kp2, d2 = _random_problem(rng, n1=32, n2=64, d=16)
    cfg = MatchConfig(radius=150.0, metric="l1")
    mesh = make_mesh(n_data=2, n_model=4)
    ref = match_descriptors(kp1, d1, kp2, d2, cfg)
    got = tp_match_descriptors(mesh, kp1, d1, kp2, d2, cfg)
    _assert_same(got, ref)


def test_merge_tie_breaking_prefers_lowest_global_index():
    # two shards, one row; equal minima in both shards
    bests = jnp.asarray([[1.0], [1.0]])
    seconds = jnp.asarray([[5.0], [7.0]])
    idxs = jnp.asarray([[3], [9]], dtype=jnp.int32)
    best, second, idx = merge_shard_minima(bests, seconds, idxs)
    assert int(idx[0]) == 3          # first shard wins ties
    assert float(best[0]) == 1.0
    assert float(second[0]) == 1.0   # the other shard's equal best


def test_merge_second_best_across_shards():
    # winner's runner-up lives in ANOTHER shard
    bests = jnp.asarray([[1.0], [2.0]])
    seconds = jnp.asarray([[10.0], [11.0]])
    idxs = jnp.asarray([[0], [5]], dtype=jnp.int32)
    best, second, idx = merge_shard_minima(bests, seconds, idxs)
    assert float(best[0]) == 1.0 and int(idx[0]) == 0
    assert float(second[0]) == 2.0


def test_tp_matcher_under_jit(rng):
    from libviso_tpu.parallel import build_tp_matcher

    kp1, d1, kp2, d2 = _random_problem(rng, n1=32, n2=64, d=16)
    cfg = MatchConfig(radius=150.0, metric="l1")
    mesh = make_mesh(n_data=1, n_model=4)
    fn = jax.jit(build_tp_matcher(mesh, cfg))
    got = fn(kp1, d1, kp2, d2)
    ref = match_descriptors(kp1, d1, kp2, d2, cfg)
    _assert_same(got, ref)


def test_tp_l2_metric_matches_local_within_tolerance(rng):
    """The default l2 metric computes distances via the matmul identity,
    whose cross-shard reduction order differs from the local kernel's —
    bit-equality (the l1 tests above) cannot hold, but the sharded
    result must agree to f32 reduction noise and produce the same match
    assignments wherever the margin exceeds that noise."""
    mesh = make_mesh(n_data=1, n_model=8)
    kp1, d1, kp2, d2 = _random_problem(rng, n1=128, n2=256)
    cfg = MatchConfig(radius=120.0, use_ratio=True, ratio=0.9, metric="l2")
    ref = match_descriptors(kp1, d1, kp2, d2, cfg)
    got = tp_match_descriptors(mesh, kp1, d1, kp2, d2, cfg)
    same = np.asarray(ref.idx) == np.asarray(got.idx)
    assert same.mean() > 0.99, same.mean()
    rd = np.asarray(ref.dist)[same]
    gd = np.asarray(got.dist)[same]
    finite = np.isfinite(rd)
    np.testing.assert_allclose(gd[finite], rd[finite], rtol=1e-5)
