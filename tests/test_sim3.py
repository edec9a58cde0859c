"""Sim(3) back-end: geometry ops, Umeyama RANSAC, scale-drift pose
graph, and the end-to-end monocular loop-closure driver.

The capability under test is beyond-reference (the reference's mono
path abandons reconstruction at src/viso.cpp:1393-1396); the oracle is
synthetic: injected per-step scale drift on a closed circuit, where the
correct loop edge and node scales are known in closed form.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- ops

def test_sim3_vector_matrix_roundtrip():
    from libviso_tpu.geometry.se3 import pose_vector_to_matrix
    from libviso_tpu.geometry.sim3 import (
        invert_sim3,
        matrix_to_sim3_vector,
        sim3_scale,
        sim3_vector_to_matrix,
    )

    rng = np.random.default_rng(0)
    xi = rng.uniform(-0.5, 0.5, (16, 7))
    xi[:, 6] = rng.uniform(-0.3, 0.3, 16)
    S = sim3_vector_to_matrix(jnp.asarray(xi, jnp.float32))
    assert float(jnp.abs(matrix_to_sim3_vector(S) - xi).max()) < 1e-6
    assert float(jnp.abs(sim3_scale(S) - np.exp(xi[:, 6])).max()) < 1e-6
    # inverse: S @ S^-1 = I
    assert float(jnp.abs(S @ invert_sim3(S) - jnp.eye(4)).max()) < 1e-5
    # log_s = 0 reproduces the SE(3) map bit-for-bit
    xi0 = xi.copy()
    xi0[:, 6] = 0.0
    assert float(jnp.abs(
        sim3_vector_to_matrix(jnp.asarray(xi0, jnp.float32))
        - pose_vector_to_matrix(
            jnp.asarray(xi0[:, :6], jnp.float32))).max()) == 0.0


def test_sim3_composition_scales_multiply():
    from libviso_tpu.geometry.sim3 import (
        sim3_scale,
        sim3_vector_to_matrix,
    )

    rng = np.random.default_rng(1)
    a = sim3_vector_to_matrix(jnp.asarray(rng.uniform(-0.4, 0.4, 7)))
    b = sim3_vector_to_matrix(jnp.asarray(rng.uniform(-0.4, 0.4, 7)))
    assert np.isclose(float(sim3_scale(a @ b)),
                      float(sim3_scale(a)) * float(sim3_scale(b)),
                      rtol=1e-5)


def test_sim3_to_se3_drops_scale_keeps_translation():
    from libviso_tpu.geometry.sim3 import sim3_to_se3, sim3_vector_to_matrix

    S = sim3_vector_to_matrix(
        jnp.asarray([0.1, -0.2, 0.05, 1.0, 2.0, -0.5, 0.4]))
    T = sim3_to_se3(S)
    R = np.asarray(T[:3, :3])
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.allclose(np.asarray(T[:3, 3]), [1.0, 2.0, -0.5], atol=1e-5)


# ------------------------------------------------- Umeyama / RANSAC

def _random_sim3(rng, s_range=(0.7, 1.4)):
    from libviso_tpu.geometry.sim3 import sim3_vector_to_matrix

    xi = rng.uniform(-0.5, 0.5, 7)
    xi[6] = np.log(rng.uniform(*s_range))
    return sim3_vector_to_matrix(jnp.asarray(xi, jnp.float32))


def test_solve_similarity_recovers_exact_transform():
    from libviso_tpu.geometry.procrustes import solve_similarity

    rng = np.random.default_rng(2)
    B = jnp.asarray(rng.uniform(-5, 5, (64, 3)), jnp.float32)
    T_true = _random_sim3(rng)
    A = B @ T_true[:3, :3].T + T_true[:3, 3]
    T = solve_similarity(A, B)
    assert float(jnp.abs(T - T_true).max()) < 1e-4


def test_ransac_similarity_rejects_outliers():
    from libviso_tpu.geometry.procrustes import ransac_similarity

    rng = np.random.default_rng(3)
    B = jnp.asarray(rng.uniform(-5, 5, (80, 3)), jnp.float32)
    T_true = _random_sim3(rng)
    A = np.array(B @ T_true[:3, :3].T + T_true[:3, 3])
    A[:30] += rng.uniform(-8, 8, (30, 3))    # 37% gross outliers
    T, inl, n = ransac_similarity(jax.random.PRNGKey(0),
                                  jnp.asarray(A), B,
                                  num_hypotheses=128,
                                  inlier_thresh=0.1)
    assert int(n) >= 45
    assert float(jnp.abs(T - T_true).max()) < 1e-3


# ------------------------------------------- Sim(3) pose graph

def _drifted_circuit(T=41, radius=5.0, g=1.01):
    """Closed GT circle + a VO chain whose step translations carry
    compounding scale drift ``g**k``.  Returns (P_gt, P_vo, drift)."""
    from libviso_tpu.geometry.se3 import euler_to_rotation

    yaw = 2 * np.pi / (T - 1)
    R_step = np.asarray(euler_to_rotation(jnp.asarray([0.0, yaw, 0.0])))
    chord = 2 * radius * np.sin(yaw / 2)
    m_gt = np.eye(4)
    m_gt[:3, :3] = R_step
    m_gt[:3, 3] = [0, 0, chord]
    drift = g ** np.arange(T)
    P_gt, P_vo = [np.eye(4)], [np.eye(4)]
    for k in range(1, T):
        P_gt.append(P_gt[-1] @ m_gt)
        m_vo = m_gt.copy()
        m_vo[:3, 3] = drift[k] * m_gt[:3, 3]
        P_vo.append(P_vo[-1] @ m_vo)
    return np.stack(P_gt), np.stack(P_vo), drift


def _close_drifted(P_vo, P_gt, drift, extra_edges=(),
                   schedule=(0.5, 0.15, 0.05)):
    """Assemble nodes every 4 frames + endpoint, the TRUE loop edge
    from the closed-form drift relation, optional planted edges; run the
    annealed Sim(3) graph; return (corrected poses, result)."""
    from libviso_tpu.geometry.se3 import invert_se3
    from libviso_tpu.geometry.sim3 import sim3_from_parts
    from libviso_tpu.solvers.pose_graph_sim3 import (
        optimize_sim3_graph,
        reanchor_segments_sim3,
    )

    T = len(P_vo)
    node_frames = np.asarray(sorted(set(range(0, T, 4)) | {T - 1}),
                             np.int64)
    node_of = {int(f): k for k, f in enumerate(node_frames)}
    Kn = len(node_frames)
    P_nodes = P_vo[node_frames]
    ei = np.arange(Kn - 1, dtype=np.int32)
    ej = ei + 1
    z = np.asarray(invert_se3(jnp.asarray(P_nodes[:-1]))
                   @ jnp.asarray(P_nodes[1:]))
    # True loop edge, frame T-1 revisits frame 0.  Trajectory units at
    # frame k are 1/drift[k] of physical (VO over-scales by drift), so
    # the edge scale u_new/u_old = 1/drift[T-1].
    rel_gt = np.linalg.inv(P_gt[0]) @ P_gt[T - 1]
    z_loop = np.asarray(sim3_from_parts(
        jnp.asarray(1.0 / drift[T - 1]), jnp.asarray(rel_gt[:3, :3]),
        jnp.asarray(rel_gt[:3, 3])))
    edges = [(0, T - 1, z_loop)] + list(extra_edges)
    ei = np.concatenate([ei, [node_of[a] for a, _, _ in edges]])
    ej = np.concatenate([ej, [node_of[b] for _, b, _ in edges]])
    z = np.concatenate([z] + [zz[None] for _, _, zz in edges])
    w = np.concatenate([np.ones(Kn - 1), [20.0] * len(edges)])
    rmask = np.concatenate([np.zeros(Kn - 1, bool), [True] * len(edges)])

    P = jnp.asarray(P_nodes)
    for delta in schedule:
        res = optimize_sim3_graph(
            P, jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(z), weights=jnp.asarray(w, jnp.float32),
            iters=10, robust_mask=jnp.asarray(rmask), robust_delta=delta)
        P = res.poses
    poses = np.asarray(reanchor_segments_sim3(
        jnp.asarray(P_vo), jnp.asarray(node_frames, jnp.int32),
        res.poses))
    return poses, res, Kn


def _ate(a, b):
    return float(np.sqrt(((a[:, :3, 3] - b[:, :3, 3]) ** 2)
                         .sum(-1).mean()))


def test_sim3_graph_removes_scale_drift():
    """Injected 1%/step compounding scale drift on a closed circuit:
    the annealed Sim(3) graph cuts ATE ~8x, snaps the endpoint, and
    recovers the closed-form node scale corrections."""
    from libviso_tpu.geometry.sim3 import sim3_scale

    P_gt, P_vo, drift = _drifted_circuit()
    ate_vo = _ate(P_vo, P_gt)
    poses, res, Kn = _close_drifted(P_vo, P_gt, drift)
    assert bool(res.ok)
    ate_c = _ate(poses, P_gt)
    assert ate_c < 0.25 * ate_vo, (ate_c, ate_vo)
    end_err = np.linalg.norm(poses[-1][:3, 3] - P_gt[-1][:3, 3])
    assert end_err < 0.05, end_err
    # last node's optimized scale ~ 1/drift (the closed-form correction)
    s_last = float(sim3_scale(res.poses)[-1])
    assert abs(s_last - 1.0 / drift[-1]) < 0.02, s_last
    # the true loop edge keeps ~unit robust weight
    assert float(res.edge_scale[-1]) > 0.8


def test_sim3_graph_annealing_rejects_false_edge():
    """A planted gross loop edge (wrong pose AND scale) must end at
    ~zero robust weight without poisoning the true closure — the
    calibration behind the (0.5, 0.15, 0.05) schedule."""
    from libviso_tpu.geometry.sim3 import sim3_from_parts

    P_gt, P_vo, drift = _drifted_circuit()
    z_false = np.asarray(sim3_from_parts(
        jnp.asarray(1.3), jnp.asarray(np.eye(3)),
        jnp.asarray([15.0, 0.0, -9.0])))
    poses, res, Kn = _close_drifted(P_vo, P_gt, drift,
                                    extra_edges=[(0, 20, z_false)])
    ate_c = _ate(poses, P_gt)
    assert ate_c < 0.25 * _ate(P_vo, P_gt), ate_c
    w_true, w_false = np.asarray(res.edge_scale)[-2:]
    assert w_true > 0.8 and w_false < 0.01, (w_true, w_false)


def test_reanchor_sim3_identity_is_noop():
    from libviso_tpu.solvers.pose_graph_sim3 import reanchor_segments_sim3

    _, P_vo, _ = _drifted_circuit(T=13)
    node_frames = np.asarray([0, 4, 8, 12], np.int64)
    out = np.asarray(reanchor_segments_sim3(
        jnp.asarray(P_vo), jnp.asarray(node_frames, jnp.int32),
        jnp.asarray(P_vo[node_frames])))
    assert np.abs(out - P_vo).max() < 1e-5


# ------------------------------------------- end-to-end mono driver

@pytest.mark.slow
def test_mono_sim3_loop_closes_plaza_circuit():
    """Two laps around the plaza on photograph-like frames, monocular —
    the full driver path: keyframe snapshots, appearance candidates,
    Umeyama Sim(3) verification, annealed graph, reanchor.

    Measured regime (pinned here; docs/realism.md "Monocular scale on
    rotation-dominant circuits"): at 9 deg/frame yaw the mono scale
    chain WANDERS ~2-3x per lap (per-step depth-ratio evidence is
    rotation-dominated and thin), so lap-2 revisits measure large and
    mutually inconsistent relative scales (~3.4 / 2.0 / 1.1 on this
    seed).  The back-end's job under that front-end is containment:
    verify the revisits geometrically, keep a consistent closure,
    robust-kill the rest, and never make the trajectory worse.  The
    quantitative 8x drift-removal capability is pinned by the
    injected-drift battery above, where the front-end noise is
    controlled."""
    import dataclasses

    from libviso_tpu.pipeline.mono_loop import run_mono_sim3_loop
    from libviso_tpu.synthetic_world import generate_plaza_sequence
    from libviso_tpu.utils.metrics import ate_rmse
    from tests.test_mono import mono_config

    laps, T = 2, 81
    seq = generate_plaza_sequence(num_frames=T, seed=5, circuits=laps)
    cfg = mono_config()
    cfg = dataclasses.replace(
        cfg, detector=dataclasses.replace(cfg.detector, subpixel=True))
    K = seq.P1[:, :3]
    res = run_mono_sim3_loop([f[0] for f in seq.frames], K, cfg, seed=0,
                             keyframe_every=4, min_gap=20)
    assert res.frame_ok[1:].all()
    # lap-2 keyframes verify against their lap-1 revisits (one lap =
    # 40 frames) with solid 3D consensus
    assert len(res.loops) >= 2, "revisits not verified"
    for le in res.loops:
        assert 36 <= le.frame_new - le.frame_old <= 44
        assert le.num_inliers >= 20
    # the annealed graph keeps at least one closure at real weight and
    # suppresses the mutually-inconsistent rest instead of averaging
    w = np.asarray(res.edge_scale)
    assert w.max() > 0.5, w
    # node scales re-inflate lap 2 where the kept edge gives evidence
    assert np.asarray(res.node_scales).max() > 1.3
    # containment: corrected is never worse than open-chain VO
    gt = seq.gt_poses
    ate_vo = ate_rmse(res.poses_vo, gt, align="sim3")
    ate_c = ate_rmse(res.poses, gt, align="sim3")
    assert ate_c <= 1.01 * ate_vo, (ate_c, ate_vo)
