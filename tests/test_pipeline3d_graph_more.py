"""3D graph-rollout tests split from test_pipeline3d_graph.py so the
per-file suite runner parallelizes the compile-heavy rollouts (each config
compiles rollout_3d_with_graph from scratch on XLA:CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import sim3d_config
from slam_tpu.pipeline import slam2d, slam3d
from slam_tpu.sim import world3d
from slam_tpu.types import make_cloud


def test_graph_z_chain_bounded_after_optimization():
    """VERDICT r2 weak 5: the graph's z measurements are odometry differences
    of height-interpolated poses (pose_graph edge z = pj[3] - pi[3]) — this
    bounds the z CHAIN after optimization against terrain ground truth over
    a loop-closing 3D rollout, so z drift inheriting into the optimized
    graph cannot regress silently. Checks both the optimized node z's and
    the trajectory z estimate."""
    c = sim3d_config()
    cfg = dataclasses.replace(
        c, graph=dataclasses.replace(c.graph, max_nodes=24, max_edges=96,
                                     keyframe_points=256,
                                     knn_dist_thresh=1.5))
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam3d.init_state_3d(jax.random.PRNGKey(1), cfg, world,
                              with_graph=True)
    gmap = make_cloud(cfg.cloud.map_capacity)
    final, gmap, (est, true) = slam3d.rollout_3d_with_graph(
        st, world, gmap, cfg, num_macro=16, graph_every=4)
    est, true = np.asarray(est), np.asarray(true)

    # trajectory z must track true sensor height (est[:, 3] vs true[:, 3])
    z_err = np.abs(est[8:, 3] - true[8:, 3])
    assert z_err.mean() < 0.15, f"trajectory z drift {z_err.mean():.3f} m"
    assert z_err.max() < 0.5, f"trajectory z worst {z_err.max():.3f} m"

    # optimized node z's vs terrain truth at each node's ESTIMATED xy (the
    # question is the z chain's consistency, not xy accuracy re-tested)
    n = int(final.graph.num_nodes)
    assert n >= 4, "need a real graph to validate the z chain"
    node = np.asarray(final.graph.node_pose[:n])
    true_z = np.asarray(
        jax.vmap(lambda p: world3d.terrain_height(world, p))(
            jnp.asarray(node[:, :2]))) + cfg.sim.sensor_height
    nz_err = np.abs(node[:, 3] - true_z)
    assert nz_err.mean() < 0.2, f"node z mean err {nz_err.mean():.3f} m"
    assert nz_err.max() < 0.6, f"node z worst err {nz_err.max():.3f} m"



def test_rollout3d_graph_se3_engine():
    """The full 3D stack with the SE(3) graph engine in the loop tracks like
    the default engine (the edges are planar-ICP derived either way)."""
    c = sim3d_config()
    cfg = dataclasses.replace(
        c, graph=dataclasses.replace(c.graph, max_nodes=16, max_edges=64,
                                     keyframe_points=256,
                                     knn_dist_thresh=2.5, engine="se3"))
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam3d.init_state_3d(jax.random.PRNGKey(0), cfg, world,
                              with_graph=True)
    gmap = make_cloud(cfg.cloud.map_capacity)
    final, gmap, (est, true) = slam3d.rollout_3d_with_graph(
        st, world, gmap, cfg, num_macro=8, graph_every=4)
    est, true = np.asarray(est), np.asarray(true)
    assert int(final.graph.num_nodes) >= 2
    err = float(slam2d.ate(jnp.array(est[8:, :3]), jnp.array(true[8:, :3])))
    assert err < 0.6, f"3D graph-mode (se3 engine) ATE {err}"
