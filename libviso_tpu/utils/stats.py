"""Fixed-shape masked robust statistics shared by the estimators.

The engine's padded slot tensors mean every reduction must ignore
invalid rows WITHOUT dynamic shapes: sort with +inf padding and index by
the (traced) valid count.  One implementation here instead of per-module
near-twins (mono scale regression, relative-pose IRLS, three-view
bundle) whose n==0 / clip conventions would otherwise drift.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_quantile(x, valid, q):
    """q-quantile of ``x`` over ``valid`` slots (+inf when none are
    valid); nearest-rank, fixed shapes, jit/vmap-safe.  q=0.5 = median."""
    big = jnp.asarray(jnp.inf, x.dtype)
    n = jnp.sum(valid.astype(jnp.int32))
    xs = jnp.sort(jnp.where(valid, x, big))
    k = jnp.clip((q * (n - 1).astype(x.dtype)).astype(jnp.int32),
                 0, x.shape[0] - 1)
    return xs[k]


def masked_median(x, valid):
    return masked_quantile(x, valid, 0.5)


def masked_median_abs(x, valid):
    """Median of |x| over ``valid`` rows — the MAD building block."""
    return masked_median(jnp.abs(x), valid)
