"""The 6-DoF edge chain (edge_registration="3d") — proof that 3D-registered
edges observe what planar edges structurally cannot.

The SE(2) x z production graph takes each edge's z from the pose-estimate
difference (pose_graph._edge_measurement: rel z = pj[3] - pi[3]), so a
loop-closure edge CONFIRMS accumulated z drift instead of correcting it.
The reference's chain — 3D GICP between keyframe clouds
(graphSlamTools.cpp:241-298) + LUM 6x6 information
(graphSlamTools.cpp:108-214) into VertexSE3/EdgeSE3
(graph_slam.cpp:43-49) — measures relative z/attitude from the DATA.
These tests pin that boundary with numbers:

  1. a controlled drifted-z loop: the 3D chain recovers true node z after
     optimization, the planar chain keeps the drift (the measured boundary
     for the deviation note in pose_graph.py:17-21);
  2. planar-world agreement: on benign terrain both engines deliver the
     same mission accuracy (the deviation is safe where it claims to be).

(The end-to-end biased-IMU ramp mission A/B lives in
tests/test_graph_se3_mission.py — split for per-file suite parallelism.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import sim3d_config
from slam_tpu.geometry import rot3_from_rpy
from slam_tpu.graph import pose_graph as pg
from slam_tpu.graph.pose_graph3d import optimize_native
from slam_tpu.pipeline import slam2d, slam3d
from slam_tpu.sim import world3d
from slam_tpu.types import PointCloud, make_cloud


def _graph_cfg(c, engine, edge_reg):
    return dataclasses.replace(
        c, graph=dataclasses.replace(
            c.graph, max_nodes=16, max_edges=64, keyframe_points=320,
            knn_dist_thresh=1.0, knn_edges=3, engine=engine,
            edge_registration=edge_reg),
        icp=dataclasses.replace(c.icp, inlier_dist=4.0))


def _loop_fixture(cfg, z_drift_per_node=0.15):
    """5 true poses on a loop over a ramp; keyframe clouds sampled from the
    true world geometry; belief poses carry cumulative z drift. Returns
    (graph_after_insertions, true_poses, true_rp, drifted_poses)."""
    world = world3d.make_world(jax.random.PRNGKey(7), cfg.sim,
                              terrain_amp=2.5)
    rng = np.random.RandomState(11)
    # shared world obstacle scatter (constrains x/y/yaw in every frame)
    obst_w = rng.uniform(-8, 8, (96, 2)).astype(np.float32)
    obst_z = np.asarray(world3d.terrain_height(
        world, jnp.asarray(obst_w))) + rng.uniform(0.5, 2.0, 96)
    obst_w3 = np.concatenate([obst_w, obst_z[:, None]], -1).astype(
        np.float32)

    angles = np.linspace(0, 2 * np.pi, 6)[:5]
    xy = np.stack([4.0 * np.cos(angles), 4.0 * np.sin(angles)],
                  -1).astype(np.float32)
    yaws = (angles + np.pi / 2).astype(np.float32)
    tz = np.asarray(world3d.terrain_height(world, jnp.asarray(xy))) + \
        cfg.sim.sensor_height

    graph = pg.init_graph(cfg.graph)
    true_poses, true_rps, drifted = [], [], []
    for k in range(5):
        pose_true = np.array([xy[k, 0], xy[k, 1], yaws[k], tz[k]],
                             np.float32)
        roll, pitch = (float(v) for v in world3d.terrain_attitude(
            world, jnp.asarray(xy[k])))
        rp = np.array([roll, pitch], np.float32)
        R_w = np.asarray(rot3_from_rpy(rp[0], rp[1], pose_true[2]))
        t_w = np.array([pose_true[0], pose_true[1], pose_true[3]],
                       np.float32)

        # ground samples around the pose, from the true surface
        gxy = t_w[:2] + rng.uniform(-6, 6, (224, 2)).astype(np.float32)
        gz = np.asarray(world3d.terrain_height(world, jnp.asarray(gxy)))
        gnd_w = np.concatenate([gxy, gz[:, None]], -1).astype(np.float32)
        pts_w = np.concatenate([obst_w3, gnd_w])
        flags = np.concatenate([
            np.zeros(96, np.int32),
            np.full(224, PointCloud.FLAG_GROUND, np.int32)])
        # world -> body (true pose) -> upright (what the pipeline stores;
        # add_keyframe tilts back by the passed attitude)
        p_body = (pts_w - t_w) @ R_w
        R_rp = np.asarray(rot3_from_rpy(rp[0], rp[1], 0.0))
        p_up = p_body @ R_rp.T
        cloud = PointCloud(xyz=jnp.asarray(p_up),
                           valid=jnp.ones(len(p_up), bool),
                           flags=jnp.asarray(flags))

        pose_bad = pose_true.copy()
        pose_bad[3] += z_drift_per_node * k       # cumulative z drift
        graph, added = pg.add_keyframe(
            graph, jnp.asarray(pose_bad), cloud, cfg.icp, cfg.graph,
            attitude=jnp.asarray(rp))
        assert bool(added), f"keyframe {k} rejected"
        true_poses.append(pose_true)
        true_rps.append(rp)
        drifted.append(pose_bad)
    return graph, np.stack(true_poses), np.stack(true_rps), np.stack(drifted)


def test_3d_edges_recover_z_drift_planar_edges_cannot():
    """The measured boundary: after a drifted-z loop, optimization over
    3D-registered edges recovers true node z to centimeters; the planar
    chain's edges (z = belief difference) keep the drift almost exactly."""
    c = sim3d_config()

    cfg3 = _graph_cfg(c, "se3", "3d")
    g3, true_poses, true_rps, _ = _loop_fixture(cfg3)
    assert int(g3.num_edges) >= 5
    # the loop must actually close (some edge touches node 0 beyond the
    # chain edge 0-1)
    eij = np.asarray(g3.edge_ij)[np.asarray(g3.edge_valid)]
    assert ((eij == 0).any(1) & (eij.max(1) >= 2)).any(), eij
    g3_opt, _ = optimize_native(g3, cfg3.graph)
    z_err_3d = np.abs(np.asarray(g3_opt.node_pose[:5, 3]) - true_poses[:, 3])

    cfg2 = _graph_cfg(c, "se2z", "2d")
    g2, _, _, drifted = _loop_fixture(cfg2)
    g2_opt, _ = pg.optimize(g2, cfg2.graph)
    z_err_2d = np.abs(np.asarray(g2_opt.node_pose[:5, 3]) - true_poses[:, 3])

    drift = np.abs(drifted[:, 3] - true_poses[:, 3])   # 0 .. 0.6
    # planar chain: edges measured the drift itself -> error stays ~drift
    assert z_err_2d.max() > 0.75 * drift.max(), (z_err_2d, drift)
    # 3D chain: edges measured true relative z -> drift collapses
    assert z_err_3d.max() < 0.06, z_err_3d
    assert z_err_3d.max() < 0.2 * z_err_2d.max(), (z_err_3d, z_err_2d)
    # attitude consistent with terrain truth after optimization
    rp_err = np.abs(np.asarray(g3_opt.node_rp[:5]) - true_rps)
    assert rp_err.max() < 0.03, rp_err


def test_se3_3d_agrees_with_se2z_on_benign_terrain():
    """Where the planar deviation is valid (mild terrain, good IMU), the
    6-DoF chain must not degrade mission accuracy."""
    c = sim3d_config()
    world = world3d.make_world(jax.random.PRNGKey(42), c.sim)

    cfg = dataclasses.replace(
        c, graph=dataclasses.replace(
            c.graph, max_nodes=16, max_edges=64, keyframe_points=256,
            knn_dist_thresh=2.5, engine="se3", edge_registration="3d"))
    st = slam3d.init_state_3d(jax.random.PRNGKey(0), cfg, world,
                              with_graph=True)
    gmap = make_cloud(cfg.cloud.map_capacity)
    final, _, (est, true) = slam3d.rollout_3d_with_graph(
        st, world, gmap, cfg, num_macro=8, graph_every=4)
    est, true = np.asarray(est), np.asarray(true)
    assert int(final.graph.num_nodes) >= 2
    ate = float(slam2d.ate(jnp.array(est[8:, :3]), jnp.array(true[8:, :3])))
    assert ate < 0.6, f"6-DoF chain ATE on benign terrain {ate}"
    z_err = np.abs(est[8:, 3] - true[8:, 3])
    assert z_err.mean() < 0.15, z_err.mean()
