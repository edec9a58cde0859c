"""Fused gated-match Pallas kernel: bit-equality with the unfused path.

Runs in Pallas interpret mode on the CPU test mesh (the TPU-compiled
variant was verified bit-exact on-chip; see the module docstring).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from libviso_tpu.config import MatchConfig
from libviso_tpu.ops.features import Keypoints
from libviso_tpu.ops.matching import gated_distance_matrix, two_smallest
from libviso_tpu.ops.pallas_fused_match import fused_gated_two_min


@pytest.mark.parametrize("use_epi", [False, True])
def test_fused_matches_unfused(rng, use_epi):
    N, D = 256, 128
    xy1 = jnp.asarray(rng.uniform(0, [400, 200], (N, 2)), jnp.float32)
    xy2 = jnp.asarray(rng.uniform(0, [400, 200], (N, 2)), jnp.float32)
    v1 = jnp.asarray(rng.random(N) > 0.1)
    v2 = jnp.asarray(rng.random(N) > 0.1)
    d1 = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    d2 = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((3, 3)), jnp.float32)

    cfg = MatchConfig(radius=120.0, metric="l1", use_epipolar=use_epi,
                      sampson_thresh=200.0)
    kp1 = Keypoints(xy=xy1, response=jnp.zeros(N), valid=v1)
    kp2 = Keypoints(xy=xy2, response=jnp.zeros(N), valid=v2)
    dd = gated_distance_matrix(kp1, d1, kp2, d2, cfg,
                               F=F if use_epi else None)
    rb, rs, ri = map(np.asarray, two_smallest(dd))

    b, s, i = map(np.asarray, fused_gated_two_min(
        xy1, v1, d1, xy2, v2, d2, F=F if use_epi else None,
        use_epi=use_epi, sampson_thresh=200.0, radius=120.0,
        interpret=True))

    has = np.isfinite(rb)
    assert has.sum() > 0
    np.testing.assert_allclose(b[has], rb[has], rtol=1e-6)
    np.testing.assert_allclose(s[has], rs[has], rtol=1e-6)
    np.testing.assert_array_equal(i[has], ri[has])
    # rows without candidates: -1 index, inf distances
    assert np.all(i[~has] == -1)
    assert np.all(np.isinf(b[~has]))


@pytest.mark.parametrize("use_epi", [False, True])
def test_sorted_fused_matches_unfused(rng, use_epi):
    """x-sorted kernel + unsort mapping reproduces the unfused result
    (random f32 descriptors: no exact ties, so tie-break order cannot
    differ)."""
    from libviso_tpu.ops.pallas_fused_match import sorted_fused_two_min

    N, D = 256, 128
    xy1 = jnp.asarray(rng.uniform(0, [400, 200], (N, 2)), jnp.float32)
    xy2 = jnp.asarray(rng.uniform(0, [400, 200], (N, 2)), jnp.float32)
    v1 = jnp.asarray(rng.random(N) > 0.15)
    v2 = jnp.asarray(rng.random(N) > 0.15)
    d1 = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    d2 = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((3, 3)), jnp.float32)

    cfg = MatchConfig(radius=90.0, metric="l1", use_epipolar=use_epi,
                      sampson_thresh=150.0)
    kp1 = Keypoints(xy=xy1, response=jnp.zeros(N), valid=v1)
    kp2 = Keypoints(xy=xy2, response=jnp.zeros(N), valid=v2)
    dd = gated_distance_matrix(kp1, d1, kp2, d2, cfg,
                               F=F if use_epi else None)
    rb, rs, ri = map(np.asarray, two_smallest(dd))

    b, s, i = map(np.asarray, sorted_fused_two_min(
        xy1, v1, d1, xy2, v2, d2, F=F if use_epi else None,
        use_epi=use_epi, sampson_thresh=150.0, radius=90.0,
        interpret=True))

    has = np.isfinite(rb)
    assert has.sum() > 0
    np.testing.assert_allclose(b[has], rb[has], rtol=1e-6)
    np.testing.assert_allclose(s[has], rs[has], rtol=1e-6)
    np.testing.assert_array_equal(i[has], ri[has])
    assert np.all(i[~has] == -1)
