"""Full 3D stack with pose-graph SLAM (config 2 + config 4 combined)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import sim3d_config
from slam_tpu.pipeline import slam2d, slam3d
from slam_tpu.sim import world3d
from slam_tpu.types import make_cloud


def test_rollout3d_graph():
    c = sim3d_config()
    cfg = dataclasses.replace(
        c, graph=dataclasses.replace(c.graph, max_nodes=16, max_edges=64,
                                     keyframe_points=256,
                                     knn_dist_thresh=2.5))
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam3d.init_state_3d(jax.random.PRNGKey(0), cfg, world,
                              with_graph=True)
    gmap = make_cloud(cfg.cloud.map_capacity)
    final, gmap, (est, true) = slam3d.rollout_3d_with_graph(
        st, world, gmap, cfg, num_macro=8, graph_every=4)
    est, true = np.asarray(est), np.asarray(true)
    assert int(final.graph.num_nodes) >= 2
    err = float(slam2d.ate(jnp.array(est[8:, :3]), jnp.array(true[8:, :3])))
    assert err < 0.6, f"3D graph-mode ATE {err}"
    n = int(final.graph.num_nodes)
    node_xy = np.asarray(final.graph.node_pose[:n, :2])
    d = np.linalg.norm(node_xy[:, None] - true[None, :, :2], axis=-1).min(1)
    assert d.max() < 0.8
