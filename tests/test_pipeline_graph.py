"""Full-stack rollout with graph SLAM in the loop (BASELINE config 4 slice)."""

import jax
import numpy as np

from slam_tpu.config import sim2d_config
from slam_tpu.pipeline import slam2d
from slam_tpu.sim import world2d


def _cfg():
    import dataclasses
    c = sim2d_config()
    return dataclasses.replace(
        c,
        graph=dataclasses.replace(c.graph, max_nodes=16, max_edges=64,
                                  keyframe_points=256, knn_dist_thresh=3.0),
    )


def test_graph_rollout_tracks_and_builds_graph():
    cfg = _cfg()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    state = slam2d.init_state(jax.random.PRNGKey(0), cfg, with_graph=True)
    final, (est, true) = slam2d.rollout_with_graph(state, world, cfg,
                                                   num_macro=12, graph_every=4)
    assert int(final.graph.num_nodes) >= 2, "should have added keyframes"
    assert int(final.graph.num_edges) >= 1, "should have created edges"
    err = float(slam2d.ate(est[8:], true[8:]))
    assert err < 0.5, f"graph-mode ATE too large: {err}"
    # graph poses should sit near the true trajectory
    n = int(final.graph.num_nodes)
    node_xy = np.asarray(final.graph.node_pose[:n, :2])
    true_xy = np.asarray(true[:, :2])
    d = np.linalg.norm(node_xy[:, None] - true_xy[None], axis=-1).min(1)
    assert d.max() < 0.6


def test_graph_rollout_vmappable():
    cfg = _cfg()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    B = 2
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    states = jax.vmap(lambda k: slam2d.init_state(k, cfg, with_graph=True))(keys)
    step = jax.jit(jax.vmap(
        lambda s: slam2d.graph_update(
            slam2d.slam_step(s, world, cfg, incremental_map=False), cfg)))
    out = step(states)
    assert out.graph.num_nodes.shape == (B,)
    assert int(out.graph.num_nodes[0]) == 1


def test_graph_rollout_mls_target_path():
    """The reference-faithful MLS cluster-mean target path (map_regen="mls",
    graph_slam.cpp:260-280 -> mls.cpp:520-555) in the full graph loop, vs
    the default voxel-merge variant: both must track; their ATEs must be in
    the same regime (the targets are both per-cell means of the same
    keyframe points — see ARCHITECTURE.md for why voxel is the default)."""
    import dataclasses

    cfg_v = _cfg()
    cfg_m = dataclasses.replace(
        cfg_v, graph=dataclasses.replace(cfg_v.graph, map_regen="mls"))
    world = world2d.make_world(jax.random.PRNGKey(42), cfg_v.sim)
    state = slam2d.init_state(jax.random.PRNGKey(0), cfg_v, with_graph=True)
    _, (est_v, true_v) = slam2d.rollout_with_graph(state, world, cfg_v,
                                                   num_macro=10,
                                                   graph_every=4)
    _, (est_m, true_m) = slam2d.rollout_with_graph(state, world, cfg_m,
                                                   num_macro=10,
                                                   graph_every=4)
    ate_v = float(slam2d.ate(est_v[8:], true_v[8:]))
    ate_m = float(slam2d.ate(est_m[8:], true_m[8:]))
    assert ate_v < 0.5 and ate_m < 0.5, (ate_v, ate_m)
    # same regime: neither path degrades tracking by more than 3x + 5 cm
    assert ate_m < 3.0 * ate_v + 0.05, (ate_v, ate_m)
