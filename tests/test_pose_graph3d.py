"""Full SE(3) pose-graph optimizer tests (pose_graph3d) — the
strict-fidelity counterpart of g2o VertexSE3/EdgeSE3 (graph_slam.cpp:43-49)
and computeEdgeInformationLUM (graphSlamTools.cpp:108-214).

Coverage:
  - SO(3) exp/log/quat manifold helpers (identity, generic, near-pi)
  - 6x6 LUM information vs a sequential f64 NumPy transcription of the
    reference's correspondence loop
  - SE(3) GN on the reference's own gs_test.cpp fixture, lifted from the
    planar graph: must agree with the SE(2) x z optimizer (quantifies the
    documented deviation at exactly 0 on planar data)
  - a genuinely 6-DoF noisy loop (roll/pitch in the nodes AND edges) that
    the planar optimizer cannot represent: convergence to ground truth
  - lossless VERTEX_SE3:QUAT/EDGE_SE3:QUAT round-trip
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import GraphConfig
from slam_tpu.graph import pose_graph as pg
from slam_tpu.graph import pose_graph3d as pg3
from slam_tpu.graph.g2o_io import load_g2o_se3, save_g2o_se3
from tests.test_gs_fixture import NODE_IDS, _fixture_graph, _oracle_solution


def _rand_rotvecs():
    rng = np.random.RandomState(3)
    small = rng.randn(16, 3) * 1e-5
    mid = rng.randn(64, 3)
    axes = rng.randn(16, 3)
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    near_pi = axes * (np.pi - 1e-5)
    at_pi = axes[:4] * np.pi
    return np.concatenate([np.zeros((1, 3)), small, mid, near_pi, at_pi])


def test_so3_exp_log_roundtrip():
    w = jnp.asarray(_rand_rotvecs(), jnp.float64) \
        if jax.config.jax_enable_x64 else jnp.asarray(_rand_rotvecs(),
                                                      jnp.float32)
    R = pg3.so3_exp(w)
    # orthonormality
    eye = jnp.einsum("nab,ncb->nac", R, R)
    np.testing.assert_allclose(np.asarray(eye),
                               np.broadcast_to(np.eye(3), eye.shape),
                               atol=2e-6)
    w2 = pg3.so3_log(R)
    # log returns the rotvec up to the 2pi ambiguity; for |w| <= pi the
    # ROTATIONS must match (axis sign may flip only at exactly pi)
    R2 = pg3.so3_exp(w2)
    # f32: near-pi samples pay ~2e-5 from the big-branch t ~= pi snap plus
    # normal rounding; measured max 4.4e-5 on this seed
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)
    # and away from pi the vectors themselves match
    t = np.linalg.norm(np.asarray(w), axis=-1)
    away = t < np.pi - 1e-3
    np.testing.assert_allclose(np.asarray(w2)[away], np.asarray(w)[away],
                               atol=1e-5)


def test_so3_log_gradient_finite_at_identity():
    """optimize_se3 differentiates through exp/log at the zero tangent every
    iteration — the small-angle branches must have NaN-free JVPs."""
    def f(w):
        return jnp.sum(pg3.so3_log(pg3.so3_exp(w) @ pg3.so3_exp(-w * 0.5)))

    g = jax.jacfwd(f)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_rot_quat_roundtrip():
    w = jnp.asarray(_rand_rotvecs(), jnp.float32)
    R = pg3.so3_exp(w)
    q = pg3.rot_to_quat(R)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0,
                               atol=1e-6)
    assert np.all(np.asarray(q[:, 0]) >= 0)
    R2 = pg3.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


# --------------------------------------------------------------------------
# LUM 6x6 information vs the reference loop
# --------------------------------------------------------------------------


def _oracle_lum6(source, target_matched, mask):
    """Sequential f64 transcription of computeEdgeInformationLUM
    (graphSlamTools.cpp:108-214): correspondences are given (the kd-tree NN
    lookup happens outside, like the production op's `target[idx]`)."""
    MM = np.zeros((6, 6))
    MZ = np.zeros(6)
    avers, diffs = [], []
    for s, t, m in zip(source, target_matched, mask):
        if not m:
            continue
        aver = 0.5 * (s + t)
        diff = s - t
        avers.append(aver)
        diffs.append(diff)
        MM[0, 4] -= aver[1]
        MM[0, 5] += aver[2]
        MM[1, 3] -= aver[2]
        MM[1, 4] += aver[0]
        MM[2, 3] += aver[1]
        MM[2, 5] -= aver[0]
        MM[3, 4] -= aver[0] * aver[2]
        MM[3, 5] -= aver[0] * aver[1]
        MM[4, 5] -= aver[1] * aver[2]
        MM[3, 3] += aver[1] ** 2 + aver[2] ** 2
        MM[4, 4] += aver[0] ** 2 + aver[1] ** 2
        MM[5, 5] += aver[0] ** 2 + aver[2] ** 2
        MZ[0] += diff[0]
        MZ[1] += diff[1]
        MZ[2] += diff[2]
        MZ[3] += aver[1] * diff[2] - aver[2] * diff[1]
        MZ[4] += aver[0] * diff[1] - aver[1] * diff[0]
        MZ[5] += aver[2] * diff[0] - aver[0] * diff[2]
    n = len(avers)
    MM[0, 0] = MM[1, 1] = MM[2, 2] = n
    for (r, c) in [(0, 4), (0, 5), (1, 3), (1, 4), (2, 3), (2, 5),
                   (3, 4), (3, 5), (4, 5)]:
        MM[c, r] = MM[r, c]
    D = np.linalg.inv(MM) @ MZ
    ss = 0.0
    for aver, diff in zip(avers, diffs):
        ss += (diff[0] - (D[0] + aver[2] * D[5] - aver[1] * D[4])) ** 2
        ss += (diff[1] - (D[1] + aver[0] * D[4] - aver[2] * D[3])) ** 2
        ss += (diff[2] - (D[2] + aver[1] * D[3] - aver[0] * D[5])) ** 2
    if ss < 1e-13 or not np.isfinite(ss):
        return np.eye(6)
    return MM / ss


def test_lum6_matches_reference_oracle():
    rng = np.random.RandomState(11)
    source = rng.randn(200, 3) * np.array([4.0, 3.0, 0.4])
    noise = rng.randn(200, 3) * 0.03
    target = source + noise
    mask = rng.rand(200) < 0.8

    want = _oracle_lum6(source, target, mask)
    got = pg3.edge_information_lum6(
        jnp.asarray(source, jnp.float32), jnp.asarray(target, jnp.float32),
        jnp.asarray(mask, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_lum6_degenerate_returns_identity():
    # zero residual (exact match) and too-few correspondences both route to
    # identity like graphSlamTools.cpp:204-210
    pts = jnp.asarray(np.random.RandomState(0).randn(50, 3), jnp.float32)
    got = pg3.edge_information_lum6(pts, pts, jnp.ones(50))
    np.testing.assert_allclose(np.asarray(got), np.eye(6), atol=1e-6)
    got2 = pg3.edge_information_lum6(pts, pts + 0.1, jnp.zeros(50))
    np.testing.assert_allclose(np.asarray(got2), np.eye(6), atol=1e-6)


# --------------------------------------------------------------------------
# Optimizer
# --------------------------------------------------------------------------


def test_se3_matches_se2z_on_gs_fixture():
    """Lift the reference's gs_test.cpp loop into SE(3) and optimize with
    the full 6-DoF solver: it must land on the same optimum as the SE(2) x z
    production path AND the f64 least-squares oracle — the documented
    planar deviation costs exactly nothing on planar data."""
    gcfg = dataclasses.replace(GraphConfig(), max_nodes=8, max_edges=8,
                               keyframe_points=8, opt_iterations=30)
    planar = _fixture_graph(gcfg)
    lifted = pg3.from_planar(planar)

    chi_before = float(pg3.total_chi2(lifted))
    opt3 = pg3.optimize_se3(lifted, iterations=30)
    chi_after = float(pg3.total_chi2(opt3))
    assert chi_after < chi_before

    expect, _ = _oracle_solution()
    for nid in NODE_IDS:
        t = np.asarray(opt3.node_t[nid])
        np.testing.assert_allclose(t[:2], expect[nid][:2], atol=2e-3,
                                   err_msg=f"node {nid} xy")
        assert abs(t[2]) < 1e-5                      # z stays 0
        R = np.asarray(opt3.node_R[nid])
        yaw = np.arctan2(R[1, 0], R[0, 0])
        dyaw = np.arctan2(np.sin(yaw - expect[nid][2]),
                          np.cos(yaw - expect[nid][2]))
        assert abs(dyaw) < 2e-3, f"node {nid} yaw"
        # roll/pitch never excited by planar edges
        assert abs(R[2, 0]) < 1e-5 and abs(R[2, 1]) < 1e-5

    # agreement with the production SE(2) x z optimizer on the same graph
    opt2, _ = pg.optimize(planar, gcfg)
    for nid in NODE_IDS:
        np.testing.assert_allclose(np.asarray(opt3.node_t[nid][:2]),
                                   np.asarray(opt2.node_pose[nid][:2]),
                                   atol=3e-3)


def _se3_compose(tA, RA, tB, RB):
    return tA + RA @ tB, RA @ RB


def test_se3_converges_on_noisy_6dof_loop():
    """A 10-node loop whose edges carry REAL roll/pitch (a ramp circuit) —
    the capability the planar optimizer lacks. Noisy odometry chain init +
    exact loop-closure edges; GN must pull every node near ground truth."""
    rng = np.random.RandomState(5)
    M = 10
    # ground truth: circle of radius 5 with a sinusoidal ramp, body frames
    # tangent to the path with pitch following the slope
    ts, Rs = [], []
    for k in range(M):
        th = 2 * np.pi * k / M
        z = 1.5 * np.sin(th)
        pitch = -np.arctan2(1.5 * np.cos(th) * (2 * np.pi / M),
                            5.0 * (2 * np.pi / M))
        yaw = th + np.pi / 2
        t = np.array([5 * np.cos(th), 5 * np.sin(th), z])
        cy, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        R = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]]) @ \
            np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
        ts.append(t)
        Rs.append(R)

    g = pg3.init_se3_graph(16, 32)
    node_t = np.zeros((16, 3), np.float32)
    node_R = np.tile(np.eye(3, dtype=np.float32), (16, 1, 1))
    node_valid = np.zeros(16, bool)
    edge_rows = []
    # exact relative edges: consecutive + two chords
    pairs = [(k, (k + 1) % M) for k in range(M)] + [(0, 5), (2, 7)]
    for (i, j) in pairs:
        rel_R = Rs[i].T @ Rs[j]
        rel_t = Rs[i].T @ (ts[j] - ts[i])
        edge_rows.append((i, j, rel_t, rel_R))

    # noisy chain init (drifted odometry integration)
    node_t[0], node_R[0] = ts[0], Rs[0]
    node_valid[0] = True
    for k in range(1, M):
        i, j, rel_t, rel_R = edge_rows[k - 1]
        nt = rel_t + rng.randn(3) * 0.08
        w = rng.randn(3) * 0.03
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        nR = rel_R @ (np.eye(3) + np.sin(th) / max(th, 1e-9) * K +
                      (1 - np.cos(th)) / max(th, 1e-9) ** 2 * (K @ K))
        node_t[j], node_R[j] = _se3_compose(node_t[i], node_R[i], nt, nR)
        node_valid[j] = True

    E = len(edge_rows)
    g = g.replace(
        node_t=jnp.asarray(node_t), node_R=jnp.asarray(node_R),
        node_valid=jnp.asarray(node_valid),
        edge_ij=g.edge_ij.at[:E].set(
            jnp.asarray([(i, j) for (i, j, *_) in edge_rows])),
        edge_t=g.edge_t.at[:E].set(
            jnp.asarray(np.stack([r[2] for r in edge_rows]), jnp.float32)),
        edge_R=g.edge_R.at[:E].set(
            jnp.asarray(np.stack([r[3] for r in edge_rows]), jnp.float32)),
        edge_info=g.edge_info.at[:E].set(jnp.eye(6)),
        edge_valid=g.edge_valid.at[:E].set(True),
    )

    init_err = max(np.linalg.norm(node_t[k] - ts[k]) for k in range(M))
    assert init_err > 0.1                             # the problem is real

    opt = jax.jit(lambda gg: pg3.optimize_se3(gg, iterations=20))(g)
    chi = float(pg3.total_chi2(opt))
    assert chi < 1e-4, chi                            # edges are exact
    for k in range(M):
        np.testing.assert_allclose(np.asarray(opt.node_t[k]), ts[k],
                                   atol=5e-3, err_msg=f"node {k} t")
        dR = np.asarray(opt.node_R[k]) @ Rs[k].T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 2e-3, f"node {k} rotation {ang}"
    # untouched invalid slots
    np.testing.assert_allclose(np.asarray(opt.node_t[M:]), 0.0)


def test_g2o_se3_full_roundtrip(tmp_path):
    rng = np.random.RandomState(7)
    g = pg3.init_se3_graph(6, 8)
    w = rng.randn(6, 3).astype(np.float32) * 0.7
    t = rng.randn(6, 3).astype(np.float32) * 3
    R = pg3.so3_exp(jnp.asarray(w))
    info = rng.randn(8, 6, 6).astype(np.float32)
    info = np.einsum("eab,ecb->eac", info, info) + np.eye(6) * 0.1
    g = g.replace(
        node_t=jnp.asarray(t), node_R=R,
        node_valid=jnp.ones(6, bool).at[3].set(False),
        edge_ij=jnp.asarray([[0, 1], [1, 2], [2, 4], [4, 5], [5, 0],
                             [0, 0], [0, 0], [0, 0]], jnp.int32),
        edge_t=jnp.asarray(rng.randn(8, 3), jnp.float32),
        edge_R=pg3.so3_exp(jnp.asarray(rng.randn(8, 3), jnp.float32)),
        edge_info=jnp.asarray(info),
        edge_valid=jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], bool),
    )
    path = str(tmp_path / "full.g2o")
    n, e = save_g2o_se3(path, g)
    assert (n, e) == (5, 5)
    g2 = load_g2o_se3(path, 6, 8)
    np.testing.assert_array_equal(np.asarray(g2.node_valid),
                                  np.asarray(g.node_valid))
    live = np.asarray(g.node_valid)
    np.testing.assert_allclose(np.asarray(g2.node_t)[live],
                               np.asarray(g.node_t)[live], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.node_R)[live],
                               np.asarray(g.node_R)[live], atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2.edge_t)[:5],
                               np.asarray(g.edge_t)[:5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.edge_R)[:5],
                               np.asarray(g.edge_R)[:5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2.edge_info)[:5],
                               np.asarray(g.edge_info)[:5], rtol=1e-5,
                               atol=1e-4)


def test_se3_engine_in_pipeline_matches_se2z():
    """`GraphConfig.engine = "se3"` routes the production graph tick through
    the full 6-DoF optimizer (the reference's literal g2o VertexSE3 typing,
    graph_slam.cpp:43-49). On the 2D pipeline's planar edges the two engines
    must produce the same trajectory and graph geometry."""
    import dataclasses as dc

    from slam_tpu.config import sim2d_config
    from slam_tpu.pipeline import slam2d
    from slam_tpu.sim import world2d

    base = sim2d_config()
    base = dc.replace(
        base,
        graph=dc.replace(base.graph, max_nodes=16, max_edges=64,
                         keyframe_points=256, knn_dist_thresh=3.0))
    world = world2d.make_world(jax.random.PRNGKey(42), base.sim)

    results = {}
    for engine in ("se2z", "se3"):
        cfg = dc.replace(base, graph=dc.replace(base.graph, engine=engine))
        state = slam2d.init_state(jax.random.PRNGKey(0), cfg,
                                  with_graph=True)
        final, (est, true) = slam2d.rollout_with_graph(
            state, world, cfg, num_macro=10, graph_every=4)
        results[engine] = (final, np.asarray(est), np.asarray(true))

    f2, est2, true2 = results["se2z"]
    f3, est3, _ = results["se3"]
    assert int(f3.graph.num_nodes) == int(f2.graph.num_nodes) >= 2
    assert int(f3.graph.num_edges) == int(f2.graph.num_edges) >= 1
    # both engines track the world...
    assert float(slam2d.ate(est3[8:], true2[8:])) < 0.5
    # ...and agree with each other (identical planar measurements; the SE(3)
    # solve differs only by manifold bookkeeping and the pinned roll/pitch
    # rows, so any gap is solver slack, not model difference)
    assert float(np.abs(est3 - est2).max()) < 0.05
    n = int(f2.graph.num_nodes)
    np.testing.assert_allclose(np.asarray(f3.graph.node_pose[:n]),
                               np.asarray(f2.graph.node_pose[:n]), atol=0.05)
