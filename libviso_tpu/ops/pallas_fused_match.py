"""Fully-fused gated matcher as one Pallas kernel (SURVEY.md §7 stage 4).

The dense matcher pipeline materializes several (N1, N2) arrays in HBM per
problem (position gate, Sampson gate, distance matrix, argmin mask).  This
kernel fuses the whole row: for each 128-row output block it sweeps the
column blocks, computes the gated L1 tile in VMEM, and folds it into a
running per-row (best, second, argmin) — nothing of size N1 x N2 ever
touches HBM.

Layout choices are Mosaic-driven (everything 2-D with 128 lanes):
  - keypoint gate data is packed as (N, 128) f32 with columns
    [x, y, valid, 0...]; the target side is passed TRANSPOSED (128, N2)
    so a column block yields (1, 128) lane vectors directly;
  - F rides in an (8, 128) constant block, 9 values at [0, :9];
  - running best/second/idx live in the (N1, 128) outputs (column 0),
    revisited across the j grid dimension (j innermost), initialized at
    j == 0.

Static variants: ``use_epi`` bakes the Sampson gate in or out at build
time (the pipeline needs exactly two variants).  Ratio test and final
validity stay outside (O(N) work on the results).

Semantics match ops/matching.py::gated_distance_matrix + two_smallest
bit-for-bit except argmin tie-breaking across column BLOCKS: ties keep the
earlier block (same as jnp.argmin) and, within a block, the lowest column
(same) — i.e. identical.

Measured (v5e, RPC-amortized): 0.72 ms vs the unfused XLA path's 0.67 ms
at KITTI shapes — XLA's own fusion already keeps the (N, N) intermediates
out of HBM's critical path at this size, and both sit at the VPU's L1
ceiling (docs/performance.md).  The kernel therefore is NOT wired as a
default backend; it exists as the explicit fused-dataflow implementation
of SURVEY.md stage 4 and becomes the right tool when N grows past what
XLA's fusion window covers (the running 2-min needs O(N1) memory vs the
unfused path's O(N1*N2)).

Block-sparse variants (``fused_sweep_two_min``/``sorted_fused_two_min``):
the 80 px position gate rejects ~85% of pairs, and with x-sorted slots a
per-tile bounding-box test (SMEM-precomputed boxes) skips whole 128x128
tiles EXACTLY — the gated sparsity turned into skipped compute.  Verified
bit-equal to the dense path and ~18% faster standalone at KITTI shapes
(1.44 vs 1.72 ms incl. wrapper), but NOT a pipeline win on this
development tunnel: decomposition shows (a) jnp.argsort(1280) costs
~0.6 ms each (XLA bitonic = ~110 serial VPU passes) and (b) a pallas_call
carries ~1.2 ms of launch overhead here even when every tile skips —
together they exceed the ~0.6 ms of skippable arithmetic, so the dense
batched XLA matcher (3 problems in one launch, ops/matching.py) stays the
default.  At production dispatch latencies (or N >= 4-8k slots where
compute dominates fixed costs) the sorted sweep becomes the right
backend; the x-ordering can then come free from a static bin permutation
(detection emits bin-major slots) instead of a runtime sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
_BIG = 3.0e38  # ~f32 max: "no candidate" sentinel (inf-safe arithmetic)


def _init_running(best_ref, second_ref, idx_ref):
    best_ref[:] = jnp.full((TILE, TILE), _BIG, jnp.float32)
    second_ref[:] = jnp.full((TILE, TILE), _BIG, jnp.float32)
    idx_ref[:] = jnp.full((TILE, TILE), -1, jnp.int32)


def _tile_pass(qg, tgb, bdesc, qd_ref, f_ref, dd_ref,
               best_ref, second_ref, idx_ref, col_base,
               use_epi, sampson_thresh, radius, sub):
    """One (TILE_q, TILE_t) tile: gates + L1 distance + 2-min merge into
    the running (best, second, idx) refs.  Shared by the dense 2-D-grid
    kernel and the block-sparse sweep kernel — the semantics both
    advertise as bit-equal live in exactly one place.

    Args:
      qg: (TILE, 128) query gate block (cols [x, y, valid]).
      tgb: (128, TILE) target gate block (rows [x, y, valid]).
      bdesc: (TILE, D) target descriptor block.
      col_base: global column index of this tile's first target slot.
    """
    # gates: (TILE_q, TILE_t)
    qx = qg[:, 0:1]
    qy = qg[:, 1:2]
    qv = qg[:, 2:3]
    tx = tgb[0:1, :]
    ty = tgb[1:2, :]
    tv = tgb[2:3, :]
    pos = jnp.abs(qx - tx) + jnp.abs(qy - ty)
    ok = (pos < radius) & (qv > 0.5) & (tv > 0.5)
    if use_epi:
        f = f_ref[:]                  # (8, 128), F at [0, :9]
        f00, f01, f02 = f[0, 0], f[0, 1], f[0, 2]
        f10, f11, f12 = f[0, 3], f[0, 4], f[0, 5]
        f20, f21, f22 = f[0, 6], f[0, 7], f[0, 8]
        # Sampson distance of (q -> x1, t -> x2): x2' F x1
        # Fx1 rows evaluated at q (broadcast over columns):
        a1 = f00 * qx + f01 * qy + f02   # (TILE, 1)
        a2 = f10 * qx + f11 * qy + f12
        a3 = f20 * qx + f21 * qy + f22
        # F' x2 at t (broadcast over rows):
        b1 = f00 * tx + f10 * ty + f20   # (1, TILE)
        b2 = f01 * tx + f11 * ty + f21
        num = (tx * a1 + ty * a2 + a3) ** 2
        den = a1 * a1 + a2 * a2 + b1 * b1 + b2 * b2
        s = num / jnp.maximum(den, 1e-30)
        # den == 0 gives 0/0 = NaN in the unfused path, which its
        # isfinite() gate REJECTS — match that (degenerate F / null
        # point), instead of admitting s=0 through the clamp
        ok &= (s <= sampson_thresh) & (den > 1e-30)

    # gated L1 distance tile into VMEM scratch (proven sub-chunk form)
    def body(k, _):
        a_chunk = qd_ref[pl.ds(k * sub, sub), :]
        diff = jnp.abs(a_chunk[:, None, :] - bdesc[None, :, :])
        dd_ref[pl.ds(k * sub, sub), :] = jnp.sum(diff, axis=-1)
        return 0

    jax.lax.fori_loop(0, TILE // sub, body, 0, unroll=True)

    dd = jnp.where(ok, dd_ref[:], _BIG)

    # tile-local 2-min over columns + global column indices
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    tb = jnp.min(dd, axis=1, keepdims=True)              # (TILE, 1)
    is_min = dd == tb
    tidx_loc = jnp.min(jnp.where(is_min, lane, TILE), axis=1,
                       keepdims=True)
    dd2 = jnp.where(lane == tidx_loc, _BIG, dd)
    ts = jnp.min(dd2, axis=1, keepdims=True)
    tidx = (tidx_loc + col_base).astype(jnp.int32)

    # merge with the running 2-min (k=2 merge, columns 0 only)
    rb = best_ref[:, 0:1]
    rs = second_ref[:, 0:1]
    ri = idx_ref[:, 0:1]
    new_better = tb < rb
    nb = jnp.where(new_better, tb, rb)
    ni = jnp.where(new_better, tidx, ri)
    # runner-up: min of (loser of the best comparison, both seconds)
    loser = jnp.where(new_better, rb, tb)
    ns = jnp.minimum(loser, jnp.minimum(rs, ts))
    best_ref[:, 0:1] = nb
    second_ref[:, 0:1] = ns
    idx_ref[:, 0:1] = ni


def _pack_inputs(q_xy, q_valid, t_xy, t_valid, F):
    """Gate/F operand packing shared by both kernel wrappers.

    Invalid slots take far-apart x sentinels (query +1e6, target -1e6):
    the position gate then rejects them exactly like the validity gate
    does, AND blocks of padding become provably skippable by the sweep
    kernel's bounding-box test (zeros would pin every padded block's
    bbox to the image origin and defeat the skip)."""
    f32 = jnp.float32
    N1 = q_xy.shape[0]
    N2 = t_xy.shape[0]
    qxs = jnp.where(q_valid, q_xy[:, 0].astype(f32), 1e6)
    txs = jnp.where(t_valid, t_xy[:, 0].astype(f32), -1e6)
    qg = jnp.zeros((N1, TILE), f32)
    qg = qg.at[:, 0].set(qxs)
    qg = qg.at[:, 1].set(q_xy[:, 1].astype(f32))
    qg = qg.at[:, 2].set(q_valid.astype(f32))
    tg = jnp.zeros((TILE, N2), f32)
    tg = tg.at[0, :].set(txs)
    tg = tg.at[1, :].set(t_xy[:, 1].astype(f32))
    tg = tg.at[2, :].set(t_valid.astype(f32))
    fblk = jnp.zeros((8, TILE), f32)
    if F is not None:
        fblk = fblk.at[0, :9].set(jnp.asarray(F, f32).reshape(9))
    return qxs, txs, qg, tg, fblk


def _unpack_outputs(best, second, idx):
    """_BIG -> inf / -1 result unpacking shared by both wrappers."""
    best = best[:, 0]
    second = second[:, 0]
    idx = jnp.where(best >= _BIG, -1, idx[:, 0])
    inf = jnp.asarray(jnp.inf, jnp.float32)
    best = jnp.where(best >= _BIG, inf, best)
    second = jnp.where(second >= _BIG, inf, second)
    return best, second, idx


def _make_kernel(use_epi: bool, sampson_thresh: float, radius: float,
                 sub: int = 8):
    def kernel(qg_ref, tg_ref, qd_ref, td_ref, f_ref,
               best_ref, second_ref, idx_ref, dd_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            _init_running(best_ref, second_ref, idx_ref)

        # (No per-tile bbox skip here: this dense-grid kernel is called on
        # UNSORTED slots, whose tile boxes span the whole image — the
        # in-kernel vector->scalar reductions would be pure overhead.
        # The block-sparse path is _make_sweep_kernel + sorted wrapper.)
        _tile_pass(qg_ref[:], tg_ref[:], td_ref[:], qd_ref, f_ref, dd_ref,
                   best_ref, second_ref, idx_ref, j * TILE,
                   use_epi, sampson_thresh, radius, sub)

    return kernel


@functools.partial(jax.jit, static_argnames=("use_epi", "sampson_thresh",
                                             "radius", "interpret"))
def fused_gated_two_min(q_xy, q_valid, q_d, t_xy, t_valid, t_d, F=None,
                        use_epi: bool = False,
                        sampson_thresh: float = 1.0,
                        radius: float = 80.0, interpret: bool = False):
    """Row-wise (best, second, argmin) of the gated L1 match problem.

    Args mirror gated_distance_matrix; returns (best (N1,), second (N1,),
    idx (N1,) int32 — global column index, -1 when the row has no
    candidate).  N1, N2, D must be multiples of 128.
    """
    N1, D = q_d.shape
    N2 = t_d.shape[0]
    assert N1 % TILE == 0 and N2 % TILE == 0 and D % TILE == 0

    f32 = jnp.float32
    _, _, qg, tg, fblk = _pack_inputs(q_xy, q_valid, t_xy, t_valid, F)

    grid = (N1 // TILE, N2 // TILE)
    kernel = _make_kernel(use_epi, float(sampson_thresh), float(radius))
    best, second, idx = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N1, TILE), f32),
            jax.ShapeDtypeStruct((N1, TILE), f32),
            jax.ShapeDtypeStruct((N1, TILE), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE, TILE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TILE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TILE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((TILE, TILE), f32)],
        interpret=interpret,
    )(qg, tg, q_d.astype(f32), t_d.astype(f32), fblk)

    return _unpack_outputs(best, second, idx)


def _make_sweep_kernel(use_epi: bool, sampson_thresh: float, radius: float,
                       n2_tiles: int, sub: int = 8):
    """1-D-grid variant: each program owns a 128-row block and sweeps all
    column blocks in an in-kernel loop, testing each block's bounding box
    first.  The per-block bounds are PRECOMPUTED on the XLA side into
    SMEM tables (qbox/tbox), so a skipped block costs a few scalar ops —
    in-kernel vector->scalar reductions measured ~1 ms of overhead across
    the sweep."""

    def kernel(qbox_ref, tbox_ref, qg_ref, tg_ref, qd_ref, td_ref, f_ref,
               best_ref, second_ref, idx_ref, dd_ref):
        i = pl.program_id(0)
        _init_running(best_ref, second_ref, idx_ref)

        qg = qg_ref[:]                    # (TILE, 128): cols x, y, valid
        qx_min = qbox_ref[0, i]
        qx_max = qbox_ref[1, i]
        qy_min = qbox_ref[2, i]
        qy_max = qbox_ref[3, i]

        def jblock(jb):
            dx_gap = jnp.maximum(tbox_ref[0, jb] - qx_max,
                                 qx_min - tbox_ref[1, jb])
            dy_gap = jnp.maximum(tbox_ref[2, jb] - qy_max,
                                 qy_min - tbox_ref[3, jb])
            live = (jnp.maximum(dx_gap, 0.0) + jnp.maximum(dy_gap, 0.0)
                    < radius)

            @pl.when(live)
            def _compute():
                _tile_pass(qg, tg_ref[:, pl.ds(jb * TILE, TILE)],
                           td_ref[pl.ds(jb * TILE, TILE), :],
                           qd_ref, f_ref, dd_ref,
                           best_ref, second_ref, idx_ref, jb * TILE,
                           use_epi, sampson_thresh, radius, sub)

        # static unroll: static block slices compile to direct VMEM
        # addressing; only the skip predicate is data-dependent
        for jb in range(n2_tiles):
            jblock(jb)

    return kernel


@functools.partial(jax.jit, static_argnames=("use_epi", "sampson_thresh",
                                             "radius", "interpret"))
def fused_sweep_two_min(q_xy, q_valid, q_d, t_xy, t_valid, t_d, F=None,
                        use_epi: bool = False,
                        sampson_thresh: float = 1.0,
                        radius: float = 80.0, interpret: bool = False):
    """fused_gated_two_min semantics via the 1-D-grid sweep kernel."""
    N1, D = q_d.shape
    N2 = t_d.shape[0]
    assert N1 % TILE == 0 and N2 % TILE == 0 and D % TILE == 0

    f32 = jnp.float32
    qxs, txs, qg, tg, fblk = _pack_inputs(q_xy, q_valid, t_xy, t_valid, F)

    # per-block bounding boxes, precomputed where XLA reduces well:
    # rows [x_min, x_max, y_min, y_max] per 128-slot block
    def boxes(xs, ys, n):
        xb = xs.reshape(n, TILE)
        yb = ys.reshape(n, TILE)
        return jnp.stack([jnp.min(xb, 1), jnp.max(xb, 1),
                          jnp.min(yb, 1), jnp.max(yb, 1)])
    qbox = boxes(qxs, q_xy[:, 1].astype(f32), N1 // TILE)    # (4, n1t)
    tbox = boxes(txs, t_xy[:, 1].astype(f32), N2 // TILE)    # (4, n2t)

    kernel = _make_sweep_kernel(use_epi, float(sampson_thresh),
                                float(radius), N2 // TILE)
    best, second, idx = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N1, TILE), f32),
            jax.ShapeDtypeStruct((N1, TILE), f32),
            jax.ShapeDtypeStruct((N1, TILE), jnp.int32),
        ),
        grid=(N1 // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, N2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N2, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((TILE, TILE), f32)],
        interpret=interpret,
    )(qbox, tbox, qg, tg, q_d.astype(f32), t_d.astype(f32), fblk)

    return _unpack_outputs(best, second, idx)


def sorted_fused_two_min(q_xy, q_valid, q_d, t_xy, t_valid, t_d, F=None,
                         use_epi: bool = False,
                         sampson_thresh: float = 1.0,
                         radius: float = 80.0, interpret: bool = False):
    """fused_gated_two_min on x-SORTED slots, results mapped back.

    Sorting both sides by x makes each 128-slot tile's x-range ~1/10 of
    the image width, so the kernel's bounding-box test skips the ~85% of
    tile pairs whose boxes sit further than the radius apart — the
    position gate's sparsity turned into real compute savings (the dense
    paths spend full FLOPs on 100% of the gated-out pairs).

    Results are identical to the unsorted kernel except argmin
    TIE-breaking: among equidistant candidates the lowest x-sorted (not
    lowest slot-index) one wins.  Exact descriptor-distance ties between
    distinct in-radius candidates are the only way to observe this.

    Returns (best (N1,), second (N1,), idx (N1,) int32 into the ORIGINAL
    target slots, -1 when gated out).
    """
    N1 = q_d.shape[0]
    N2 = t_d.shape[0]
    # invalid slots sort to the far ends (matching the kernel sentinels)
    qkey = jnp.where(q_valid, q_xy[:, 0], 1e6)
    tkey = jnp.where(t_valid, t_xy[:, 0], -1e6)
    qperm = jnp.argsort(qkey)
    tperm = jnp.argsort(tkey)
    best, second, idx = fused_sweep_two_min(
        q_xy[qperm], q_valid[qperm], q_d[qperm],
        t_xy[tperm], t_valid[tperm], t_d[tperm],
        F=F, use_epi=use_epi, sampson_thresh=sampson_thresh,
        radius=radius, interpret=interpret)
    inv_q = jnp.zeros((N1,), jnp.int32).at[qperm].set(
        jnp.arange(N1, dtype=jnp.int32))
    best = best[inv_q]
    second = second[inv_q]
    idx = idx[inv_q]
    idx = jnp.where(idx >= 0, tperm[jnp.clip(idx, 0, N2 - 1)], -1)
    return best, second, idx.astype(jnp.int32)
