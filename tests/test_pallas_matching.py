"""Pallas L1-distance kernel vs the XLA reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from libviso_tpu.ops.matching import _l1_desc_dist_xla
from libviso_tpu.ops.pallas_matching import l1_distance_matrix


def test_l1_kernel_matches_xla(rng):
    d1 = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32)) * 10
    d2 = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32)) * 10
    ours = l1_distance_matrix(d1, d2, interpret=True)
    ref = _l1_desc_dist_xla(d1, d2)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)


def test_l1_kernel_zero_padding_invariance(rng):
    # zero descriptor rows (invalid slots) must give the plain |sum| of the
    # other row — exactly like the XLA path
    d1 = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
    d1 = d1.at[5].set(0.0)
    d2 = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
    out = np.asarray(l1_distance_matrix(d1, d2, interpret=True))
    np.testing.assert_allclose(out[5], np.abs(np.asarray(d2)).sum(-1),
                               rtol=1e-5)
