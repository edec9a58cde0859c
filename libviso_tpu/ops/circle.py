"""Circular-consistency match filter (SURVEY.md C8).

The reference's ``match_circle`` (src/viso.cpp:206-243) is a 4-deep nested
scan over match lists checking that a feature tracks consistently around
the loop  left -> right -> right_prev -> left_prev -> left.  Because every
match list maps each view-1 slot to at most one view-2 index, the loop is a
composition of partial maps — here three gathers and one equality test,
O(N) instead of O(n^4).

Index-table convention: a match list is an (N,) int32 array over view-1
slots holding the matched view-2 slot or -1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CircleResult(NamedTuple):
    valid: jax.Array      # (N,) bool over current-left slots: in a circle
    right: jax.Array      # (N,) int32 current-right slot (match_lr)
    left_prev: jax.Array  # (N,) int32 previous-left slot (match11)
    right_prev: jax.Array  # (N,) int32 previous-right slot
    count: jax.Array      # () int32 number of circular matches


def _safe_gather(table, idx):
    """table[idx] with -1 indices mapping to -1."""
    safe = jnp.clip(idx, 0, table.shape[0] - 1)
    return jnp.where(idx >= 0, table[safe], -1)


def circle_filter(match_lr, match_lr_prev, match11, match22) -> CircleResult:
    """Keep matches consistent around the stereo/temporal loop.

    For each current-left slot l with r = match_lr[l]:
      lp = match11[l]           (left  -> left_prev)
      rp = match_lr_prev[lp]    (left_prev -> right_prev)
      consistent iff match22[r] == rp    (right -> right_prev closes the loop)

    Matches the reference's acceptance condition exactly
    (src/viso.cpp:229-235); the reference's quadruple loop can in principle
    emit duplicate tuples for repeated (i2) values, but its match lists are
    unique in the first index, making the composition single-valued — as
    here.

    Args:
      match_lr: (N,) current left->right matches.
      match_lr_prev: (N,) previous left->right matches.
      match11: (N,) current-left -> previous-left matches.
      match22: (N,) current-right -> previous-right matches.
    """
    r = jnp.asarray(match_lr)
    lp = jnp.asarray(match11)
    rp = _safe_gather(jnp.asarray(match_lr_prev), lp)
    r_to_rp = _safe_gather(jnp.asarray(match22), r)
    valid = (r >= 0) & (lp >= 0) & (rp >= 0) & (r_to_rp == rp)
    return CircleResult(
        valid=valid,
        right=jnp.where(valid, r, -1),
        left_prev=jnp.where(valid, lp, -1),
        right_prev=jnp.where(valid, rp, -1),
        count=jnp.sum(valid.astype(jnp.int32)),
    )
