"""Long-horizon soak: the full graph-SLAM pipeline driven far enough that
keyframe EVICTION fires inside the fused rollout (not just at the graph-API
level, tests/test_graph_capacity.py). The reference grows its graph without
bound (graph_slam.cpp:260-280); our fixed-slot graph must keep tracking with
bounded memory and no silent degradation once slots recycle."""

import dataclasses

import jax
import numpy as np

from slam_tpu.config import sim2d_config
from slam_tpu.pipeline import slam2d
from slam_tpu.sim import world2d


def _cfg(max_nodes):
    c = sim2d_config()
    return dataclasses.replace(
        c,
        graph=dataclasses.replace(c.graph, max_nodes=max_nodes, max_edges=48,
                                  keyframe_points=256, knn_dist_thresh=2.0),
    )


def test_soak_eviction_inside_pipeline():
    cfg = _cfg(max_nodes=5)
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    state = slam2d.init_state(jax.random.PRNGKey(0), cfg, with_graph=True)

    final, (est, true) = slam2d.rollout_with_graph(state, world, cfg,
                                                   num_macro=40, graph_every=4)

    # the run must have outgrown capacity: all slots in use and at least one
    # eviction (insertion stamps exceed max_nodes)
    assert int(final.graph.num_nodes) == 5
    total_inserted = int(np.asarray(final.graph.node_stamp).max()) + 1
    assert total_inserted > 5, (
        "soak never overflowed capacity — lengthen the run or lower max_nodes")

    # tracking never silently degrades across the recycle point
    err = np.linalg.norm(np.asarray(est[:, :2] - true[:, :2]), axis=1)
    assert float(err[8:].max()) < 1.0, f"soak ATE blew up: {err.max():.2f} m"
    assert np.isfinite(np.asarray(final.pose)).all()
    assert np.isfinite(np.asarray(final.graph.node_pose)).all()

    # the newest keyframe tracks the robot's recent trajectory (the graph is
    # not stuck on stale pre-eviction keyframes)
    from slam_tpu.graph import pose_graph as pg
    last, ok = pg.newest_node(final.graph)
    assert bool(ok)
    node_xy = np.asarray(final.graph.node_pose)[int(last), :2]
    d = np.linalg.norm(np.asarray(true[:, :2]) - node_xy, axis=1).min()
    assert d < 1.5, "newest keyframe far from the whole true trajectory"
