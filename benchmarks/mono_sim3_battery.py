"""Mono Sim(3) back-end battery: injected scale drift x odometry noise.

Pins the drift-removal capability of the annealed Sim(3) pose graph
(solvers/pose_graph_sim3.py; docs/limitations.md candidate #0) on the
controlled oracle: a closed circuit whose VO chain carries compounding
per-step scale drift ``g**k`` plus white per-step pose noise, with the
TRUE loop edge derived in closed form (trajectory units at frame k are
1/drift[k] of physical — tests/test_sim3.py::_close_drifted).  Rows:
drift rate x seed, ATE before/after, endpoint error, recovered vs true
end scale, loop-edge robust weight.

    JAX_PLATFORMS=cpu python benchmarks/mono_sim3_battery.py \
        [--out=benchmarks/mono_sim3_battery_r5.jsonl]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from libviso_tpu.geometry.se3 import (
        euler_to_rotation,
        invert_se3,
        pose_vector_to_matrix,
    )
    from libviso_tpu.geometry.sim3 import sim3_from_parts, sim3_scale
    from libviso_tpu.solvers.pose_graph_sim3 import (
        optimize_sim3_graph,
        reanchor_segments_sim3,
    )

    out_path = "benchmarks/mono_sim3_battery_r5.jsonl"
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=")[1]

    T, radius = 41, 5.0
    yaw = 2 * np.pi / (T - 1)
    R_step = np.asarray(euler_to_rotation(jnp.asarray([0.0, yaw, 0.0])))
    chord = 2 * radius * np.sin(yaw / 2)
    m_gt = np.eye(4)
    m_gt[:3, :3] = R_step
    m_gt[:3, 3] = [0, 0, chord]

    rows = []
    for g in (1.005, 1.01, 1.02):
        for seed in (0, 1, 2):
            rng = np.random.default_rng(seed)
            drift = g ** np.arange(T)
            P_gt, P_vo = [np.eye(4)], [np.eye(4)]
            for k in range(1, T):
                P_gt.append(P_gt[-1] @ m_gt)
                # VO measurement: drifted scale + white pose noise
                # (~0.2 deg rot, 1% trans per step)
                n = rng.normal(0, 1, 6) * [3e-3, 3e-3, 3e-3,
                                           0.015, 0.015, 0.015]
                m_vo = m_gt.copy()
                m_vo[:3, 3] = drift[k] * m_gt[:3, 3]
                m_vo = m_vo @ np.asarray(
                    pose_vector_to_matrix(jnp.asarray(n)))
                P_vo.append(P_vo[-1] @ m_vo)
            P_gt = np.stack(P_gt)
            P_vo = np.stack(P_vo)

            node_frames = np.asarray(
                sorted(set(range(0, T, 4)) | {T - 1}), np.int64)
            node_of = {int(f): k for k, f in enumerate(node_frames)}
            Kn = len(node_frames)
            P_nodes = P_vo[node_frames]
            ei = np.arange(Kn - 1, dtype=np.int32)
            ej = ei + 1
            z = np.asarray(invert_se3(jnp.asarray(P_nodes[:-1]))
                           @ jnp.asarray(P_nodes[1:]))
            rel_gt = np.linalg.inv(P_gt[0]) @ P_gt[T - 1]
            z_loop = np.asarray(sim3_from_parts(
                jnp.asarray(1.0 / drift[T - 1]),
                jnp.asarray(rel_gt[:3, :3]), jnp.asarray(rel_gt[:3, 3])))
            ei = np.concatenate([ei, [node_of[0]]])
            ej = np.concatenate([ej, [node_of[T - 1]]])
            z = np.concatenate([z, z_loop[None]])
            w = np.concatenate([np.ones(Kn - 1), [20.0]]).astype(
                np.float32)
            rmask = np.concatenate([np.zeros(Kn - 1, bool), [True]])

            P = jnp.asarray(P_nodes)
            for delta in (0.5, 0.15, 0.05):
                res = optimize_sim3_graph(
                    P, jnp.asarray(ei, jnp.int32),
                    jnp.asarray(ej, jnp.int32), jnp.asarray(z),
                    weights=jnp.asarray(w), iters=10,
                    robust_mask=jnp.asarray(rmask), robust_delta=delta)
                P = res.poses
            poses = np.asarray(reanchor_segments_sim3(
                jnp.asarray(P_vo), jnp.asarray(node_frames, jnp.int32),
                res.poses))

            def ate(a):
                return float(np.sqrt(((a[:, :3, 3] - P_gt[:, :3, 3]) ** 2)
                                     .sum(-1).mean()))

            row = {
                "drift_per_step": g, "seed": seed,
                "ate_vo": round(ate(P_vo), 4),
                "ate_corrected": round(ate(poses), 4),
                "end_err_vo": round(float(np.linalg.norm(
                    P_vo[-1][:3, 3] - P_gt[-1][:3, 3])), 4),
                "end_err_corrected": round(float(np.linalg.norm(
                    poses[-1][:3, 3] - P_gt[-1][:3, 3])), 4),
                "end_scale_recovered": round(
                    float(sim3_scale(res.poses)[-1]), 4),
                "end_scale_true": round(1.0 / drift[-1], 4),
                "loop_edge_weight": round(float(res.edge_scale[-1]), 4),
            }
            rows.append(row)
            print(row, file=sys.stderr, flush=True)

    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    imp = [r["ate_vo"] / max(r["ate_corrected"], 1e-9) for r in rows]
    print(f"median ATE improvement {np.median(imp):.2f}x over "
          f"{len(rows)} rows -> {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
