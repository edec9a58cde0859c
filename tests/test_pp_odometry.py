"""Pipeline-parallel staged odometry (SURVEY.md P4) on the virtual CPU
mesh: stage 0 (detect/describe) and stage 1 (match/solve) on separate
devices must reproduce the serial streaming trajectory bit-exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libviso_tpu.config import DetectorConfig, PipelineConfig, RansacConfig
from libviso_tpu.parallel import make_pipe_mesh, run_pipelined_odometry
from libviso_tpu.pipeline import run_stereo_sequence
from libviso_tpu.synthetic import generate_sequence


def tiny_config():
    return PipelineConfig(
        detector=DetectorConfig(max_features=240, nbinx=8, nbiny=3,
                                num_slots=256),
        ransac=RansacConfig(num_hypotheses=32, gn_iters=50),
    )


def test_pipe_mesh_needs_two_devices():
    with pytest.raises(ValueError):
        make_pipe_mesh(devices=jax.devices()[:1])


def test_pipelined_matches_serial_bitexact():
    cfg = tiny_config()
    seq = generate_sequence(num_frames=6, num_points=420, seed=3,
                            width=416, height=160)
    left = np.stack([f[0] for f in seq.frames]).astype(np.float32)
    right = np.stack([f[1] for f in seq.frames]).astype(np.float32)

    serial = run_stereo_sequence(list(seq.frames), seq.P1, seq.P2,
                                 cfg=cfg, seed=0)

    mesh = make_pipe_mesh()
    poses, motions, ok = run_pipelined_odometry(
        mesh, seq.P1, seq.P2, left, right, cfg=cfg, seed=0)

    assert motions.shape == serial.motions.shape
    # frame 0 is the pipeline bubble / reference `first` skip on both paths
    np.testing.assert_array_equal(ok, serial.frame_ok)
    np.testing.assert_array_equal(motions[1:], serial.motions[1:])
    np.testing.assert_array_equal(poses, serial.poses)
    assert ok[1:].all()


def test_pipelined_rejects_wrong_axis_size():
    from jax.sharding import Mesh

    from libviso_tpu.config import Calib
    from libviso_tpu.parallel.pp_odometry import build_pipelined_program

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
    with pytest.raises(ValueError):
        build_pipelined_program(
            Calib(f=700.0, cu=200.0, cv=80.0, base=0.5),
            np.eye(3), tiny_config(), mesh)


def test_stream_pipeline_matches_serial_bitexact():
    """Host-driven live-stream pipeline (prepare on dev0, solve on dev1,
    async overlap) reproduces the serial trajectory bit-exactly."""
    from libviso_tpu.parallel.pp_odometry import StreamPipeline

    cfg = tiny_config()
    seq = generate_sequence(num_frames=6, num_points=420, seed=3,
                            width=416, height=160)
    serial = run_stereo_sequence(list(seq.frames), seq.P1, seq.P2,
                                 cfg=cfg, seed=0)

    sp = StreamPipeline(seq.P1, seq.P2, cfg, devices=jax.devices()[:2],
                        seed=0)
    outs = []
    for im1, im2 in seq.frames:
        out = sp.push(im1, im2)
        if out is not None:
            outs.append(out)
    outs.append(sp.flush())
    assert len(outs) == len(seq.frames)

    motions = np.stack([np.asarray(o.tr) for o in outs])
    ok = np.array([bool(o.ok) for o in outs])
    ok[0] = False
    np.testing.assert_array_equal(ok, serial.frame_ok)
    np.testing.assert_array_equal(motions[1:], serial.motions[1:])
