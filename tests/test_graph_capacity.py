"""Graph capacity policy + relocalization loop-closure pathway
(VERDICT r1 missing #3/#4, next-round items 6/7).

The reference grows its graph without bound and rebuilds the map at O(N)
(graph_slam.cpp:260-280); round 1 hard-capped at max_nodes and silently
stopped adding. Now a full graph EVICTS the most redundant keyframe, and an
accepted global match injects an Edge{from: 0} that re-optimizes the whole
history (global_match.cpp:177-221)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import sim2d_config
from slam_tpu.graph import pose_graph as pg
from slam_tpu.types import PointCloud, cloud_from_xyz


def _cfg(max_nodes=6, max_edges=24):
    c = sim2d_config()
    return dataclasses.replace(
        c,
        graph=dataclasses.replace(c.graph, max_nodes=max_nodes,
                                  max_edges=max_edges, keyframe_points=128,
                                  knn_dist_thresh=4.0),
        icp=dataclasses.replace(c.icp, max_points=128, inlier_dist=1.0,
                                max_iterations=10),
    )


def _scene(rng, n=96):
    """A distinctive local scene (same landmarks for every keyframe so edge
    ICP converges to the odometry-consistent relative pose)."""
    pts = rng.uniform(-8, 8, (n, 2)).astype(np.float32)
    return cloud_from_xyz(jnp.array(
        np.concatenate([pts, np.zeros((n, 1), np.float32)], 1)))


def _world_landmarks(rng, n=600, span=((-15.0, 55.0), (-15.0, 15.0))):
    (x0, x1), (y0, y1) = span
    return np.stack([rng.uniform(x0, x1, n),
                     rng.uniform(y0, y1, n)], 1).astype(np.float32)


def _kf_scene(world_pts, true_pose, radius=12.0, cap=160):
    """Landmarks visible from the TRUE pose, expressed in its frame — so
    relative scene geometry reflects true motion, not the belief."""
    local = world_pts - true_pose[:2]
    keep = np.linalg.norm(local, axis=1) < radius
    pts = local[keep][:cap]
    pad = cap - len(pts)
    xyz = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)
    xyz = np.concatenate([xyz, np.zeros((pad, 3), np.float32)], 0)
    valid = np.concatenate([np.ones(len(pts), bool), np.zeros(pad, bool)])
    return cloud_from_xyz(jnp.array(xyz), valid=jnp.array(valid))


def test_eviction_keeps_adding_past_capacity():
    """Driving far past 64x5 m must keep inserting keyframes: the newest pose
    is always in the graph, node 0 survives, and capacity is bounded."""
    cfg = _cfg(max_nodes=6)
    rng = np.random.default_rng(0)
    scene = _scene(rng)
    graph = pg.init_graph(cfg.graph)

    poses = [np.array([5.0 * i, 0.2 * i, 0.0, 0.0], np.float32)
             for i in range(12)]  # 2x capacity
    added_count = 0
    step = jax.jit(lambda g, p: pg.add_keyframe(g, p, scene, cfg.icp,
                                                cfg.graph))
    for p in poses:
        graph, added = step(graph, jnp.array(p))
        added_count += int(added)

    assert added_count == 12, "keyframes stopped being added at capacity"
    assert int(graph.num_nodes) == 6  # bounded
    # newest pose present
    last, ok = pg.newest_node(graph)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(graph.node_pose[last]),
                               poses[-1], atol=1e-5)
    # node 0 (home anchor) never evicted
    assert bool(graph.node_valid[0])
    np.testing.assert_allclose(np.asarray(graph.node_pose[0]), poses[0],
                               atol=1e-5)
    # no edge references a dead or re-used slot inconsistently: all valid
    # edges connect valid nodes
    eij = np.asarray(graph.edge_ij)
    ev = np.asarray(graph.edge_valid)
    nv = np.asarray(graph.node_valid)
    assert nv[eij[ev, 0]].all() and nv[eij[ev, 1]].all()
    # optimize still runs at capacity
    opt, delta = pg.optimize(graph, cfg.graph)
    assert np.isfinite(np.asarray(opt.node_pose)).all()


def test_graph_full_flag_surfaces():
    """The pipeline surfaces graph_full instead of degrading silently."""
    import dataclasses as dc

    from slam_tpu.pipeline import slam2d
    from slam_tpu.sim import world2d

    cfg = _cfg(max_nodes=2)
    cfg = dc.replace(cfg, graph=dc.replace(cfg.graph, knn_dist_thresh=0.05))
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam2d.init_state(jax.random.PRNGKey(0), cfg, with_graph=True)
    assert not bool(st.graph_full)
    step = jax.jit(lambda s: slam2d.graph_update(
        slam2d.slam_step(s, world, cfg, incremental_map=False), cfg))
    for _ in range(3):
        st = step(st)
    assert bool(st.graph_full)


def test_relocalization_edge_snaps_history_back():
    """Kidnapped robot: keyframes 3.. live in a frame offset by (6, -4) m
    after a belief teleport (their edges to the pre-kidnap graph were
    rejected by the >10 m gate, so the subgraph floats). One accepted match
    + optimize must snap the whole post-kidnap history back to truth."""
    cfg = _cfg(max_nodes=10, max_edges=40)
    rng = np.random.default_rng(1)
    world = _world_landmarks(rng)
    graph = pg.init_graph(cfg.graph)
    step = jax.jit(lambda g, p, s: pg.add_keyframe(g, p, s, cfg.icp,
                                                   cfg.graph))

    kidnap = np.array([26.0, -14.0, 0.0, 0.0], np.float32)  # belief offset
    true_poses, belief_poses = [], []
    for i in range(8):
        t = np.array([5.0 * i, 0.0, 0.0, 0.0], np.float32)
        b = t + (kidnap if i >= 4 else 0.0)
        true_poses.append(t)
        belief_poses.append(b)
        graph, added = step(graph, jnp.array(b), _kf_scene(world, t))
        assert bool(added)

    # pre-kidnap nodes 0-3 are right; post-kidnap nodes 4-7 are offset and,
    # because the 4->3 jump exceeded the 10 m edge gate, disconnected
    eij = np.asarray(graph.edge_ij)[np.asarray(graph.edge_valid)]
    crosses = ((eij[:, 0] < 4) != (eij[:, 1] < 4))
    assert not crosses.any(), f"kidnap edges should be gated: {eij[crosses]}"

    # global match: the robot (belief = belief_poses[-1]) is truly at
    # true_poses[-1]
    match_pose = jnp.array(true_poses[-1][:3])
    graph2, injected = pg.relocalization_edge(
        graph, jnp.array(belief_poses[-1]), match_pose, jnp.asarray(True),
        cfg.graph)
    assert bool(injected)
    opt, _ = pg.optimize(graph2, cfg.graph)

    got = np.asarray(opt.node_pose[:8, :2])
    want = np.stack([t[:2] for t in true_poses])
    err = np.abs(got - want).max()
    pre_err = np.abs(np.stack([b[:2] for b in belief_poses]) - want).max()
    assert pre_err > 10.0
    assert err < 0.5, f"history did not snap back: max err {err}"


def test_relocalization_graph_pipeline():
    """apply_relocalization_graph end-to-end: EKF belief shifts AND the graph
    re-optimizes in one call."""
    from slam_tpu.ops.fft_match import MatchResult
    from slam_tpu.pipeline import slam2d
    from slam_tpu.pipeline.relocalize import apply_relocalization_graph

    cfg = _cfg(max_nodes=8, max_edges=32)
    st = slam2d.init_state(jax.random.PRNGKey(0), cfg, with_graph=True)
    rng = np.random.default_rng(2)
    # sparse world: accidental (non-overlap) ICP correspondences stay under
    # the >=5 inlier gate, so cross-kidnap edges are provably rejected
    world = _world_landmarks(rng, n=120)
    graph = st.graph
    kidnap = np.array([16.0, -12.0, 0, 0], np.float32)  # > 10 m: gates reject
    for i in range(4):
        t = np.array([5.0 * i, 0, 0, 0], np.float32)
        b = t + (kidnap if i >= 2 else 0.0)
        graph, _ = pg.add_keyframe(graph, jnp.array(b),
                                   _kf_scene(world, t), cfg.icp, cfg.graph)
    # no surviving edge crosses the kidnap discontinuity
    eij = np.asarray(graph.edge_ij)[np.asarray(graph.edge_valid)]
    assert not ((eij[:, 0] < 2) != (eij[:, 1] < 2)).any(), eij
    # robot drove 5 m past the last keyframe, still in the kidnapped frame
    st = st.replace(graph=graph,
                    pose=jnp.array([36.0, -12.0, 0.0, 0.0]))

    match = MatchResult(pose=jnp.array([20.0, 0.0, 0.0]),
                        score=jnp.asarray(0.9), ok=jnp.asarray(True))
    out = jax.jit(apply_relocalization_graph,
                  static_argnames="cfg")(st, match, cfg)
    np.testing.assert_allclose(np.asarray(out.pose[:2]), [20.0, 0.0],
                               atol=1e-4)
    # the kidnapped tail nodes snapped back to truth
    tail = np.asarray(out.graph.node_pose[2:4, :2])
    np.testing.assert_allclose(tail, [[10.0, 0.0], [15.0, 0.0]], atol=0.5)


def test_fallback_match_never_creates_loop_closure_edge():
    """VERDICT r3 weak 7: relocalize_with_fallback's give-up republishes the
    PRIOR as ok=True with score exactly 0 (global_match.cpp:204-221) — a
    pose publication, NOT a measurement. apply_relocalization_graph must not
    anchor the graph to it: no edge, no re-optimization, graph untouched.
    A genuine match (score > 0) on the same state still injects one."""
    from slam_tpu.ops.fft_match import MatchResult
    from slam_tpu.pipeline import slam2d
    from slam_tpu.pipeline.relocalize import apply_relocalization_graph

    cfg = _cfg(max_nodes=8, max_edges=32)
    st = slam2d.init_state(jax.random.PRNGKey(0), cfg, with_graph=True)
    rng = np.random.default_rng(2)
    world = _world_landmarks(rng, n=120)
    graph = st.graph
    for i in range(3):
        t = np.array([5.0 * i, 0, 0, 0], np.float32)
        graph, _ = pg.add_keyframe(graph, jnp.array(t),
                                   _kf_scene(world, t), cfg.icp, cfg.graph)
    st = st.replace(graph=graph, pose=jnp.array([12.0, 0.0, 0.0, 0.0]))
    n_edges = int(graph.num_edges)

    run = jax.jit(apply_relocalization_graph, static_argnames="cfg")

    fallback = MatchResult(pose=st.pose[:3], score=jnp.float32(0.0),
                           ok=jnp.asarray(True))
    out = run(st, fallback, cfg)
    assert int(out.graph.num_edges) == n_edges, "fallback injected an edge"
    np.testing.assert_array_equal(np.asarray(out.graph.node_pose),
                                  np.asarray(st.graph.node_pose))

    genuine = MatchResult(pose=jnp.array([12.0, 0.0, 0.0]),
                          score=jnp.asarray(0.9), ok=jnp.asarray(True))
    out2 = run(st, genuine, cfg)
    assert int(out2.graph.num_edges) == n_edges + 1, "genuine match must inject"
