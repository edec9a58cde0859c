"""Pipeline-parallel staged odometry (SURVEY.md P4).

The reference computes each frame's whole step on one core
(src/viso.cpp:1205-1321).  This module stages the per-frame step across a
2-device ``('pipe',)`` mesh axis, GPipe-style:

  stage 0 (front-end): Harris detection + Sobel-patch description for
      frame t                                  (pipeline/stereo.py frontend)
  stage 1 (back-end):  3x matching, circle filter, triangulation and
      RANSAC+GN pose for frame t-1             (pipeline/stereo.py backend)

expressed as ONE jit graph: a ``lax.scan`` over T+1 ticks inside a
``shard_map`` over the ``pipe`` axis.  At tick k, device 0 extracts
features of frame k while device 1 solves frame k-1 from the features it
received last tick; the ``ppermute`` handoff of the (N, D) feature block
rides ICI and overlaps with the next tick's compute.  Each device picks
its stage with a ``lax.cond`` on ``axis_index`` — manual-mode SPMD with
per-device control flow.

Steady-state throughput is bounded by max(stage cost) instead of the sum
(~2.8 ms detect vs ~4 ms solve per docs/performance.md), so PP buys ~1.6x
latency on a live stream where chunked data parallelism
(parallel/odometry.py) cannot apply because future frames do not exist
yet.  For offline sequences DP scales better; this is the
latency-optimized streaming layout.

Trajectories are bit-identical to the serial streaming path
(pipeline/stereo.py::run_stereo_sequence): the tick-0 bubble runs the
back-end on all-invalid features, which reproduces exactly the empty
first-frame state, and per-frame PRNG keys are the same
``fold_in(key, t)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from libviso_tpu.config import Calib, PipelineConfig
from libviso_tpu.geometry.se3 import chain_motions, pose_vector_to_matrix
from libviso_tpu.pipeline.stereo import (
    FrameOutput,
    build_backend,
    build_frontend,
    empty_state,
    zero_feats,
)

NUM_STAGES = 2


def build_pipelined_program(calib: Calib, F, cfg: PipelineConfig,
                            mesh: Mesh, backend: str = "xla"):
    """Build fn(ims1 (T,H,W), ims2 (T,H,W), key) -> FrameOutput over T
    frames, jit-compiled over the mesh's 2-device ``pipe`` axis.

    Output row t is frame t's result (row 0 is the first frame — always
    not-ok, like the reference's `first` skip, src/viso.cpp:1256-1260).
    """
    if mesh.shape["pipe"] != NUM_STAGES:
        raise ValueError(
            f"pipe axis must have {NUM_STAGES} devices "
            f"(got {mesh.shape['pipe']}): the VO step splits into "
            "front-end and back-end stages")

    frontend = build_frontend(cfg)
    backend_fn = build_backend(calib, F, cfg, backend=backend)

    def program(ims1, ims2, key):
        T = ims1.shape[0]

        def body(ims1, ims2, key):
            stage = jax.lax.axis_index("pipe")

            def zero_out(dtype):
                z = jnp.zeros((), jnp.int32)
                return FrameOutput(
                    tr=jnp.zeros((6,), dtype), ok=jnp.zeros((), bool),
                    num_circle=z, num_inliers=z, num_lr=z, num_kp1=z)

            def stage0(feats_in, state, k):
                # features of frame k (clamped past the end: those ticks'
                # results never leave the bubble)
                t = jnp.minimum(k, T - 1)
                feats = frontend(
                    jax.lax.dynamic_index_in_dim(ims1, t, keepdims=False),
                    jax.lax.dynamic_index_in_dim(ims2, t, keepdims=False))
                return feats, state, zero_out(feats.d1.dtype)

            def stage1(feats_in, state, k):
                # solve frame k-1 from the features received last tick;
                # tick 0 runs on zero_feats, reproducing the empty-state
                # first step bit-exactly (state leaves: all valid=False)
                t = jnp.maximum(k - 1, 0)
                new_state, out = backend_fn(feats_in, state,
                                            jax.random.fold_in(key, t))
                return feats_in, new_state, out

            def tick(carry, k):
                feats_in, state = carry
                feats, state, out = jax.lax.cond(
                    stage == 0, stage0, stage1, feats_in, state, k)
                # hand stage 0's features to stage 1 for the next tick
                feats_next = jax.lax.ppermute(
                    feats, "pipe", perm=[(0, 1)])
                return (feats_next, state), out

            carry0 = (zero_feats(cfg), empty_state(cfg))
            _, outs = jax.lax.scan(tick, carry0,
                                   jnp.arange(T + 1, dtype=jnp.int32))
            # outs live on stage 1 (stage 0 rows are zeros) -> replicate
            # (bools ride the sum as int32)
            outs = jax.tree_util.tree_map(
                lambda x: jax.lax.psum(
                    x.astype(jnp.int32) if x.dtype == jnp.bool_ else x,
                    "pipe"), outs)
            return outs._replace(ok=outs.ok.astype(bool))

        # check_vma off: the stages' per-device control flow (cond on
        # axis_index, solver while_loops over device-varying data) is
        # exactly what the varying-mode analysis cannot type; the psum
        # above makes the outputs replicated by construction
        outs = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P()), out_specs=P(),
            check_vma=False,
        )(ims1, ims2, key)
        # tick k solved frame k-1: drop the tick-0 bubble row
        return jax.tree_util.tree_map(lambda x: x[1:], outs)

    return program


def run_pipelined_odometry(mesh: Mesh, P1, P2, frames_left, frames_right,
                           cfg: PipelineConfig = PipelineConfig(),
                           seed: int = 0, backend: str = "xla"):
    """Run staged-pipeline odometry over a ('pipe',) mesh of 2 devices.

    Args:
      mesh: mesh with a 'pipe' axis of size 2.
      P1, P2: 3x4 rectified projections.
      frames_left/right: (T, H, W) image stacks.

    Returns (poses (T, 4, 4), motions (T, 6), ok (T,)) as numpy arrays;
    bit-identical to `run_stereo_sequence` on the same inputs.
    """
    from libviso_tpu.geometry.mvg import F_from_P_host

    calib = Calib.from_projections(P1, P2)
    F = F_from_P_host(P1, P2)
    program = jax.jit(build_pipelined_program(calib, F, cfg, mesh,
                                              backend=backend))

    replicated = NamedSharding(mesh, P())
    ims1 = jax.device_put(jnp.asarray(np.asarray(frames_left)), replicated)
    ims2 = jax.device_put(jnp.asarray(np.asarray(frames_right)), replicated)
    key = jax.device_put(jax.random.PRNGKey(seed), replicated)

    outs = program(ims1, ims2, key)
    motions = np.asarray(outs.tr)
    ok = np.array(outs.ok)
    ok[0] = False  # reference skips the first frame (viso.cpp:1256)
    Ts = pose_vector_to_matrix(jnp.asarray(motions))
    poses = np.asarray(chain_motions(Ts, jnp.asarray(ok)))
    return poses, motions, ok
