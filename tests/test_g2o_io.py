"""g2o text-format interop (graph/g2o_io.py) — the exchange format of the
optimizer the reference builds on (g2o VertexSE3/EdgeSE3,
graph_slam.cpp:43-49)."""

import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.config import GraphConfig, IcpConfig
from slam_tpu.graph import pose_graph as pg
from slam_tpu.graph.g2o_io import load_g2o, save_g2o
from slam_tpu.types import PointCloud


def _cloud(pts, capacity=64):
    n = pts.shape[0]
    xyz = np.zeros((capacity, 3), np.float32)
    xyz[:n, :2] = pts
    valid = np.zeros(capacity, bool)
    valid[:n] = True
    return PointCloud(xyz=jnp.array(xyz), valid=jnp.array(valid),
                      flags=jnp.zeros(capacity, jnp.int32))


def _built_graph():
    """A real graph: 4 keyframes around a square + their ICP edges."""
    gcfg = GraphConfig(max_nodes=16, max_edges=64, keyframe_points=64,
                       knn_dist_thresh=2.0, opt_iterations=10)
    icfg = IcpConfig(max_points=64, inlier_dist=4.0, min_scene_points=5,
                     max_iterations=10)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-6, 6, size=(40, 2)).astype(np.float32)
    graph = pg.init_graph(gcfg)
    for pose in ([0, 0, 0, 0.0], [3, 0, 0.2, 0.1], [3, 3, 1.5, 0.2],
                 [0, 3, 3.0, 0.15]):
        p = np.asarray(pose, np.float32)
        c, s = np.cos(p[2]), np.sin(p[2])
        local = (pts - p[:2]) @ np.array([[c, -s], [s, c]])
        graph, _ = pg.add_keyframe(graph, jnp.array(p), _cloud(local),
                                   icfg, gcfg)
    assert int(graph.num_nodes) == 4 and int(graph.num_edges) >= 3
    return graph, gcfg


@pytest.mark.parametrize("mode", ["se2", "se3"])
def test_roundtrip(tmp_path, mode):
    graph, gcfg = _built_graph()
    path = str(tmp_path / f"graph.{mode}.g2o")
    n, e = save_g2o(path, graph, mode=mode)
    assert n == 4 and e == int(graph.num_edges)
    back = load_g2o(path, gcfg)
    assert int(back.num_nodes) == 4 and int(back.num_edges) == e

    nv = np.asarray(graph.node_valid)
    keep = 4 if mode == "se3" else 3       # se2 drops z
    np.testing.assert_allclose(
        np.asarray(back.node_pose)[nv][:, :keep],
        np.asarray(graph.node_pose)[nv][:, :keep], atol=1e-6)
    ev = np.asarray(graph.edge_valid)
    order = np.flatnonzero(ev)
    np.testing.assert_array_equal(np.asarray(back.edge_ij)[:e],
                                  np.asarray(graph.edge_ij)[order])
    np.testing.assert_allclose(np.asarray(back.edge_rel)[:e, :keep],
                               np.asarray(graph.edge_rel)[order][:, :keep],
                               atol=1e-6)
    # information: full 4x4 through se3 (roll/pitch padding stripped);
    # planar 3x3 block through se2
    d = 4 if mode == "se3" else 3
    np.testing.assert_allclose(
        np.asarray(back.edge_info)[:e, :d, :d],
        np.asarray(graph.edge_info)[order][:, :d, :d], atol=1e-5)


def test_optimize_after_reload_matches(tmp_path):
    """A reloaded graph (keyframe clouds gone, everything else intact) must
    optimize to the same poses as the original — the GN solve reads only
    poses/edges/info."""
    graph, gcfg = _built_graph()
    ref, _ = pg.optimize(graph, gcfg)
    path = str(tmp_path / "g.g2o")
    save_g2o(path, graph, mode="se3")
    back, _ = pg.optimize(load_g2o(path, gcfg), gcfg)
    nv = np.asarray(graph.node_valid)
    np.testing.assert_allclose(np.asarray(back.node_pose)[nv],
                               np.asarray(ref.node_pose)[nv], atol=1e-4)


def test_quaternion_yaw_roundtrip():
    from slam_tpu.graph.g2o_io import _quat_to_yaw, _yaw_to_quat
    for yaw in (-3.0, -1.2, 0.0, 0.7, 2.9):
        qx, qy, qz, qw = _yaw_to_quat(yaw)
        assert abs(_quat_to_yaw(qx, qy, qz, qw) - yaw) < 1e-12


def test_gapped_ids_do_not_collide_with_add_keyframe(tmp_path):
    """External files with 1-based or gapped vertex ids: num_nodes must be
    the high-water mark (max id + 1), because add_keyframe allocates its
    next slot AT index num_nodes — a plain count would overwrite a node."""
    gcfg = GraphConfig(max_nodes=16, max_edges=64, keyframe_points=64,
                       knn_dist_thresh=2.0, opt_iterations=5)
    icfg = IcpConfig(max_points=64, inlier_dist=4.0, min_scene_points=5,
                     max_iterations=5)
    path = tmp_path / "gapped.g2o"
    path.write_text(
        "VERTEX_SE2 1 0 0 0\n"
        "VERTEX_SE2 3 5 0 0.1\n"
        "EDGE_SE2 1 3 5 0 0.1 1 0 0 1 0 1\n")
    g = load_g2o(str(path), gcfg)
    assert int(g.num_nodes) == 4               # high-water mark, not count 2
    assert int(np.asarray(g.node_valid).sum()) == 2
    rng = np.random.default_rng(1)
    pts = rng.uniform(-6, 6, size=(40, 2)).astype(np.float32)
    p = np.array([10.0, 0, 0, 0], np.float32)
    c, s = np.cos(p[2]), np.sin(p[2])
    local = (pts - p[:2]) @ np.array([[c, -s], [s, c]], np.float32)
    g2, added = pg.add_keyframe(g, jnp.array(p), _cloud(local), icfg, gcfg)
    assert bool(added)
    # both original nodes survive untouched
    np.testing.assert_allclose(np.asarray(g2.node_pose)[1],
                               np.asarray(g.node_pose)[1])
    np.testing.assert_allclose(np.asarray(g2.node_pose)[3],
                               np.asarray(g.node_pose)[3])
    assert bool(np.asarray(g2.node_valid)[4])  # new node took slot 4

    dup = tmp_path / "dup.g2o"
    dup.write_text("VERTEX_SE2 2 0 0 0\nVERTEX_SE2 2 1 1 0\n")
    with pytest.raises(ValueError, match="duplicate vertex"):
        load_g2o(str(dup), gcfg)


def test_capacity_overflow_raises(tmp_path):
    graph, _ = _built_graph()
    path = str(tmp_path / "g.g2o")
    save_g2o(path, graph)
    small = GraphConfig(max_nodes=2, max_edges=64, keyframe_points=8)
    with pytest.raises(ValueError, match="max_nodes"):
        load_g2o(path, small)
