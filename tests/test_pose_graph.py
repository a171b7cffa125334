"""Pose-graph SLAM tests: gating, edge creation, GN optimization vs oracle,
loop-closure correction (graph_slam behavior parity, incl. the gs_test.cpp
manual loop fixture the reference never automated)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import GraphConfig, IcpConfig
from slam_tpu.graph import pose_graph as pg
from slam_tpu.types import PointCloud


def _cloud(pts, capacity=64):
    n = pts.shape[0]
    xyz = np.zeros((capacity, 3), np.float32)
    xyz[:n, :2] = pts
    valid = np.zeros(capacity, bool)
    valid[:n] = True
    return PointCloud(xyz=jnp.array(xyz), valid=jnp.array(valid),
                      flags=jnp.zeros(capacity, jnp.int32))


def _cfgs():
    g = GraphConfig(max_nodes=16, max_edges=64, keyframe_points=64,
                    knn_dist_thresh=2.0, opt_iterations=10)
    icp = IcpConfig(max_points=64, inlier_dist=4.0, min_scene_points=5,
                    max_iterations=10)
    return g, icp


def _landmarks(seed=0, n=40):
    rng = np.random.default_rng(seed)
    return rng.uniform(-6, 6, size=(n, 2)).astype(np.float32)


def world_cloud_at(pose, pts):
    """Points observed from pose, expressed in the robot frame."""
    c, s = np.cos(pose[2]), np.sin(pose[2])
    R = np.array([[c, -s], [s, c]])
    local = (pts - pose[:2]) @ R
    return _cloud(local)


def test_keyframe_gating():
    gcfg, icfg = _cfgs()
    graph = pg.init_graph(gcfg)
    pts = _landmarks()
    p0 = np.array([0.0, 0.0, 0.0, 0.0], np.float32)
    graph, added = pg.add_keyframe(graph, jnp.array(p0),
                                   world_cloud_at(p0, pts), icfg, gcfg)
    assert bool(added) and int(graph.num_nodes) == 1
    # too close -> rejected (graphSlamTools.h:26 KNN_DIST_THRESH)
    p1 = np.array([0.5, 0.0, 0.0, 0.0], np.float32)
    graph, added = pg.add_keyframe(graph, jnp.array(p1),
                                   world_cloud_at(p1, pts), icfg, gcfg)
    assert not bool(added) and int(graph.num_nodes) == 1
    # far enough -> added, with an edge to the previous node
    p2 = np.array([3.0, 0.0, 0.1, 0.0], np.float32)
    graph, added = pg.add_keyframe(graph, jnp.array(p2),
                                   world_cloud_at(p2, pts), icfg, gcfg)
    assert bool(added) and int(graph.num_nodes) == 2
    assert int(graph.num_edges) >= 1
    # edge measurement should match the true relative pose (poses are exact)
    rel = np.asarray(graph.edge_rel[0])
    assert abs(rel[0] - 3.0) < 0.05
    assert abs(rel[2] - 0.1) < 0.01


def oracle_gn_se2(poses, edges, iters=10, lam=1e-4):
    """Dense NumPy GN oracle for SE(2) pose graphs."""
    poses = poses.copy()
    N = len(poses)
    for _ in range(iters):
        H = np.zeros((3 * N, 3 * N))
        b = np.zeros(3 * N)
        for (i, j, z, Om) in edges:
            xi, xj = poses[i], poses[j]
            ci, si = np.cos(xi[2]), np.sin(xi[2])
            Ri = np.array([[ci, -si], [si, ci]])
            cz, sz = np.cos(z[2]), np.sin(z[2])
            Rz = np.array([[cz, -sz], [sz, cz]])
            dt = xj[:2] - xi[:2]
            et = Rz.T @ (Ri.T @ dt - z[:2])
            eth = np.arctan2(np.sin(xj[2] - xi[2] - z[2]),
                             np.cos(xj[2] - xi[2] - z[2]))
            e = np.array([et[0], et[1], eth])
            dRiT = np.array([[-si, ci], [-ci, -si]])
            A = np.zeros((3, 3))
            A[:2, :2] = -Rz.T @ Ri.T
            A[:2, 2] = Rz.T @ (dRiT @ dt)
            A[2, 2] = -1
            B = np.zeros((3, 3))
            B[:2, :2] = Rz.T @ Ri.T
            B[2, 2] = 1
            H[3*i:3*i+3, 3*i:3*i+3] += A.T @ Om @ A
            H[3*i:3*i+3, 3*j:3*j+3] += A.T @ Om @ B
            H[3*j:3*j+3, 3*i:3*i+3] += B.T @ Om @ A
            H[3*j:3*j+3, 3*j:3*j+3] += B.T @ Om @ B
            b[3*i:3*i+3] += A.T @ Om @ e
            b[3*j:3*j+3] += B.T @ Om @ e
        H += np.eye(3 * N) * lam
        H[:3, :3] += np.eye(3) * 1e8
        dx = np.linalg.solve(H, -b).reshape(N, 3)
        poses += dx
        poses[:, 2] = np.arctan2(np.sin(poses[:, 2]), np.cos(poses[:, 2]))
    return poses


def _manual_graph(gcfg):
    """Square loop with drifted odometry + a loop closure — the gs_test.cpp
    fixture (graph_slam/src/gs_test.cpp:1-79) rebuilt as an automated test."""
    true = np.array([
        [0, 0, 0],
        [5, 0, np.pi / 2],
        [5, 5, np.pi],
        [0, 5, -np.pi / 2],
    ], np.float32)
    rng = np.random.default_rng(1)
    noisy = true + np.concatenate(
        [rng.normal(0, 0.3, (4, 2)), rng.normal(0, 0.05, (4, 1))], 1
    ).astype(np.float32)
    noisy[0] = true[0]

    def rel(a, b):
        c, s = np.cos(a[2]), np.sin(a[2])
        R = np.array([[c, -s], [s, c]])
        t = R.T @ (b[:2] - a[:2])
        return np.array([t[0], t[1],
                         np.arctan2(np.sin(b[2]-a[2]), np.cos(b[2]-a[2]))])

    Om = np.eye(3) * 100
    edges = [(i, i + 1, rel(true[i], true[i + 1]), Om) for i in range(3)]
    edges.append((3, 0, rel(true[3], true[0]), Om))  # loop closure

    graph = pg.init_graph(gcfg)
    N = gcfg.max_nodes
    node_pose = np.zeros((N, 4), np.float32)
    node_pose[:4, :3] = noisy
    node_valid = np.zeros(N, bool); node_valid[:4] = True
    E = gcfg.max_edges
    edge_ij = np.zeros((E, 2), np.int32)
    edge_rel = np.zeros((E, 4), np.float32)
    edge_info = np.zeros((E, 4, 4), np.float32)
    edge_valid = np.zeros(E, bool)
    for k, (i, j, z, om) in enumerate(edges):
        edge_ij[k] = [i, j]
        edge_rel[k, :3] = z
        edge_info[k, :3, :3] = om
        edge_info[k, 3, 3] = 1.0
        edge_valid[k] = True
    node_stamp = -np.ones(N, np.int32); node_stamp[:4] = np.arange(4)
    graph = graph.replace(
        node_pose=jnp.array(node_pose), node_valid=jnp.array(node_valid),
        node_stamp=jnp.array(node_stamp),
        edge_ij=jnp.array(edge_ij), edge_rel=jnp.array(edge_rel),
        edge_info=jnp.array(edge_info), edge_valid=jnp.array(edge_valid),
        num_nodes=jnp.int32(4), num_edges=jnp.int32(len(edges)))
    return graph, true, noisy, edges


def test_gn_matches_numpy_oracle():
    gcfg, _ = _cfgs()
    graph, true, noisy, edges = _manual_graph(gcfg)
    opt, delta = pg.optimize(graph, gcfg)
    oracle = oracle_gn_se2(noisy.astype(np.float64), edges,
                           iters=gcfg.opt_iterations, lam=gcfg.lm_lambda)
    got = np.asarray(opt.node_pose[:4, :3])
    np.testing.assert_allclose(got, oracle, atol=2e-3)


def test_loop_closure_recovers_truth():
    gcfg, _ = _cfgs()
    graph, true, noisy, _ = _manual_graph(gcfg)
    pre_err = np.abs(noisy[:, :2] - true[:, :2]).max()
    opt, delta = pg.optimize(graph, gcfg)
    got = np.asarray(opt.node_pose[:4, :3])
    post_err = np.abs(got[:, :2] - true[:, :2]).max()
    assert post_err < 0.05 < pre_err
    # delta reports the last node's shift (graph_slam.cpp:357-384)
    np.testing.assert_allclose(np.asarray(delta[:3]),
                               got[3] - noisy[3], atol=1e-5)


def test_optimize_is_vmappable():
    gcfg, _ = _cfgs()
    graph, *_ = _manual_graph(gcfg)
    batched = jax.tree.map(lambda x: jnp.stack([x, x]), graph)
    opt, delta = jax.vmap(lambda g: pg.optimize(g, gcfg))(batched)
    assert opt.node_pose.shape[0] == 2
    np.testing.assert_allclose(np.asarray(opt.node_pose[0]),
                               np.asarray(opt.node_pose[1]), atol=1e-6)


def test_regenerate_map():
    gcfg, icfg = _cfgs()
    graph = pg.init_graph(gcfg)
    pts = _landmarks()
    poses = [np.array([0, 0, 0, 0], np.float32),
             np.array([3, 0, 0.2, 0], np.float32),
             np.array([6, 1, 0.4, 0], np.float32)]
    for p in poses:
        graph, _ = pg.add_keyframe(graph, jnp.array(p), world_cloud_at(p, pts),
                                   icfg, gcfg)
    m = pg.regenerate_map(graph, capacity=256, voxel_leaf=(0.25, 0.25, 2.0))
    world = np.asarray(m.xyz[np.asarray(m.valid)])
    # every map point should be near some true landmark
    d = np.linalg.norm(world[:, None, :2] - pts[None], axis=-1).min(1)
    assert d.max() < 0.5


def test_z_solve_moves_toward_measurement():
    """Two nodes at z=0 with one edge measuring dz=+1: optimize must move
    node 1 TOWARD +1 (the b-vector signs were once flipped, driving it to
    -1 — z drift corrections applied doubled in the wrong direction)."""
    gcfg, _ = _cfgs()
    g = pg.init_graph(gcfg)
    g = g.replace(
        node_pose=g.node_pose.at[0].set(jnp.array([0., 0., 0., 0.]))
                             .at[1].set(jnp.array([3., 0., 0., 0.])),
        node_valid=g.node_valid.at[0].set(True).at[1].set(True),
        node_stamp=g.node_stamp.at[0].set(0).at[1].set(1),
        edge_ij=g.edge_ij.at[0].set(jnp.array([0, 1])),
        edge_rel=g.edge_rel.at[0].set(jnp.array([3., 0., 0., 1.0])),
        edge_info=g.edge_info.at[0].set(jnp.eye(4)),
        edge_valid=g.edge_valid.at[0].set(True),
        num_nodes=jnp.int32(2), num_edges=jnp.int32(1))
    g2, _ = pg.optimize(g, gcfg)
    z1 = float(g2.node_pose[1, 3])
    assert z1 > 0.9, f"z moved to {z1}, expected ~+1 (sign regression)"


def test_edges_dropped_counted_when_table_full():
    """An accepted edge that finds no free slot must increment
    edges_dropped, never vanish silently."""
    import dataclasses
    gcfg, icfg = _cfgs()
    gcfg = dataclasses.replace(gcfg, max_edges=1)  # room for one edge only
    pts = _landmarks()
    graph = pg.init_graph(gcfg)
    poses = ([0, 0, 0, 0], [3, 0, 0.1, 0], [6, 0, 0.2, 0], [9, 0, 0.3, 0])
    for pose in poses:
        p = np.asarray(pose, np.float32)
        graph, _ = pg.add_keyframe(graph, jnp.array(p),
                                   world_cloud_at(p, pts), icfg, gcfg)
    assert int(graph.num_edges) == 1
    assert int(graph.edges_dropped) >= 1


def test_regenerate_map_grid_matches_voxel_on_flat_graph():
    """map_regen="grid" (sort-free scatter engine) must produce EXACTLY the
    voxel engine's centroid set when cells span <2 m of z (always true in
    2D graphs) — the documented equivalence domain of
    pose_graph.regenerate_map_grid."""
    import dataclasses

    import numpy as np

    from slam_tpu.config import sim2d_config

    cfg = sim2d_config()
    g = pg.init_graph(dataclasses.replace(
        cfg.graph, max_nodes=8, max_edges=16, keyframe_points=64))
    rng = np.random.RandomState(0)
    node_pose = np.zeros((8, 4), np.float32)
    node_pose[:3, :2] = rng.uniform(-5, 5, (3, 2))
    node_pose[:3, 2] = rng.uniform(-1, 1, 3)
    g = g.replace(
        node_pose=jnp.asarray(node_pose),
        node_valid=g.node_valid.at[:3].set(True),
        node_stamp=g.node_stamp.at[:3].set(jnp.arange(3)),
        num_nodes=jnp.int32(3),
        kf_xyz=g.kf_xyz.at[:3, :, :2].set(jnp.asarray(
            rng.uniform(-8, 8, (3, 64, 2)).astype(np.float32))),
        kf_valid=g.kf_valid.at[:3].set(True))
    vox = pg.regenerate_map(g, 256, (0.5, 0.5, 2.0))
    grd = pg.regenerate_map_grid(g, 256, 0.5, 384, recall=1.0)

    def cellset(c):
        xy = np.asarray(c.xyz)[np.asarray(c.valid)][:, :2]
        return sorted((round(float(x), 3), round(float(y), 3))
                      for x, y in xy)

    assert cellset(vox) == cellset(grd)


def test_early_exit_matches_fixed_iterations():
    """The GN batch early exit (GraphConfig.opt_min_delta) is a pure
    latency optimization: results must match the fixed-length scan to the
    exit tolerance, including under vmap where graphs converge at
    DIFFERENT iteration counts (jax freezes finished batch elements while
    the slowest one keeps iterating)."""
    import dataclasses
    gcfg, _ = _cfgs()
    graph, true, noisy, _ = _manual_graph(gcfg)

    fixed = dataclasses.replace(gcfg, opt_min_delta=0.0)
    eager = dataclasses.replace(gcfg, opt_min_delta=1e-5)
    opt_fixed, d_fixed = pg.optimize(graph, fixed)
    opt_eager, d_eager = pg.optimize(graph, eager)
    np.testing.assert_allclose(np.asarray(opt_eager.node_pose),
                               np.asarray(opt_fixed.node_pose), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_eager), np.asarray(d_fixed),
                               atol=1e-4)

    # heterogeneous batch: one graph already at its optimum (converges in
    # 1 iteration), one starting far away (needs several) — the early-exit
    # while under vmap must keep iterating the slow one without perturbing
    # the converged one
    far = graph.replace(node_pose=graph.node_pose.at[1:4, :2].add(1.5))
    batched = jax.tree.map(lambda a, b: jnp.stack([a, b]), opt_fixed, far)
    ov_eager, _ = jax.vmap(lambda g: pg.optimize(g, eager))(batched)
    ov_fixed, _ = jax.vmap(lambda g: pg.optimize(g, fixed))(batched)
    np.testing.assert_allclose(np.asarray(ov_eager.node_pose),
                               np.asarray(ov_fixed.node_pose), atol=1e-4)
