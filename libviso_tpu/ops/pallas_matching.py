"""Pallas TPU kernel for the matcher's all-pairs L1 descriptor distance.

The throughput kernel of the engine (SURVEY.md §3.4): three calls per frame,
each an (N1 x N2 x D) reduction with N = 1280, D = 128.  The reference does
this as a scalar FLANN scan with per-candidate cv::norm (src/viso.cpp:684-702);
here it is a tiled VMEM kernel: 128x128 output tiles, each reducing a
(128, D) x (128, D) descriptor block pair on the VPU, with the row-block
kept resident while the kernel sweeps column blocks (grid order exploits
pallas' automatic block revisiting-cache).

L1 cannot ride the MXU (no bilinear form), so the kernel is VPU work:
|a[i,:] - b[j,:]| summed over D.  To bound VMEM the j-dimension is processed
in sub-chunks of 8 rows (a (128, 8, D) broadcast = 512 KB per step).

Speed-of-light note (measured on v5e, RPC-amortized chained timing): this
kernel, XLA's own lowering of the chunked broadcast, a transposed
outer-product formulation (accumulating |a[:, d] - b[d, :]| over d), and a
bf16-input variant all land at ~1.2 TFLOP/s — the practical VPU ceiling
for a 3-op dependent chain (sub, abs, accumulate).  The matcher is
compute-bound at that ceiling; the only way faster is to change the math:
``MatchConfig.metric = 'l2'`` expands to a matmul and runs on the MXU at
~100x lower cost (ops/matching.py::_l2_desc_dist).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _l1_kernel(d1_ref, d2_ref, out_ref, *, sub=8):
    b = d2_ref[:]  # (TILE, D)

    def body(k, _):
        # rows k*sub : (k+1)*sub of the output tile (ref slicing — value
        # dynamic_slice has no Mosaic lowering)
        a_chunk = d1_ref[pl.ds(k * sub, sub), :]
        # (sub, TILE, D): |a_chunk[i, :] - b[j, :]|
        diff = jnp.abs(a_chunk[:, None, :] - b[None, :, :])
        out_ref[pl.ds(k * sub, sub), :] = jnp.sum(diff, axis=-1)
        return 0

    jax.lax.fori_loop(0, TILE // sub, body, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def l1_distance_matrix(d1, d2, interpret=False):
    """All-pairs L1 distance: (N1, D), (N2, D) -> (N1, N2).

    N1, N2 must be multiples of 128 and D a multiple of 128 (the pipeline
    pads descriptors to 128, config.descriptor_dim_padded); zero-padded
    descriptor tails contribute nothing to L1.
    """
    N1, D = d1.shape
    N2, _ = d2.shape
    assert N1 % TILE == 0 and N2 % TILE == 0, (N1, N2)
    assert D % TILE == 0, D

    grid = (N1 // TILE, N2 // TILE)
    return pl.pallas_call(
        _l1_kernel,
        out_shape=jax.ShapeDtypeStruct((N1, N2), d1.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * N1 * N2 * D,  # sub + abs + add per element
            bytes_accessed=(N1 * D + N2 * D * grid[0] + N1 * N2) * 4,
            transcendentals=0,
        ),
    )(d1, d2)
