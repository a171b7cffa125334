"""End-to-end 6-DoF-chain mission A/B (split from test_graph_se3_edges.py
for per-file suite parallelism; two full graph-rollout compiles live here)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import sim3d_config
from slam_tpu.pipeline import slam2d, slam3d
from slam_tpu.sim import world3d
from slam_tpu.types import make_cloud


def test_ramp_mission_se3_tracks_attitude():
    """End-to-end on steep terrain with a 0.05 rad IMU pitch miscalibration
    (SimConfig.imu_pitch_bias — a realistic mounting error):

      - node z: the 6-DoF chain must beat the planar chain (measured 0.20
        vs 0.27 m mean at this fixture; the planar chain's edge z is the
        belief difference, so the bias-skewed height-interpolation drift is
        baked into its graph, while 3D edge registration between the
        equally-leaned keyframe clouds measures bias-free relative z);
      - attitude: the 6-DoF engine carries node attitude bounded by the
        sensor-bias floor (the gauge pins node 0 at its biased IMU
        attitude; edges are relative, so the bias stays common-mode). The
        planar engine has no attitude state at all — the structural gap
        this engine exists to close. (The per-edge measured-attitude
        accuracy claim lives in test_3d_edges_recover_z_drift...: this
        terrain's node-to-node relative attitudes (~0.007 rad) sit below
        edge-ICP attitude noise, so an e2e comparative assert here would
        be noise-driven.)"""
    c = sim3d_config()
    c = dataclasses.replace(c, sim=dataclasses.replace(
        c.sim, imu_pitch_bias=0.05))
    world = world3d.make_world(jax.random.PRNGKey(42), c.sim,
                               terrain_amp=2.5)

    def run(engine, edge_reg):
        cfg = dataclasses.replace(
            c, graph=dataclasses.replace(
                c.graph, max_nodes=24, max_edges=96, keyframe_points=256,
                knn_dist_thresh=1.5, engine=engine,
                edge_registration=edge_reg))
        st = slam3d.init_state_3d(jax.random.PRNGKey(0), cfg, world,
                                  with_graph=True)
        gmap = make_cloud(cfg.cloud.map_capacity)
        final, _, (est, true) = slam3d.rollout_3d_with_graph(
            st, world, gmap, cfg, num_macro=16, graph_every=4)
        return final, np.asarray(est), np.asarray(true)

    f2, est2, true2 = run("se2z", "2d")
    f3, est3, true3 = run("se3", "3d")

    n = int(f3.graph.num_nodes)
    assert n >= 4
    node3 = np.asarray(f3.graph.node_pose[:n])
    true_att = np.asarray(jax.vmap(
        lambda p: jnp.stack(world3d.terrain_attitude(world, p)))(
            jnp.asarray(node3[:, :2])))
    att_err_3d = np.abs(np.asarray(f3.graph.node_rp[:n]) - true_att)
    # bounded by the injected bias + edge-ICP noise floor (measured 0.031)
    assert att_err_3d.mean() < 0.05 + 0.02, att_err_3d
    # the planar engine has no attitude state to compare — structural gap
    assert f2.graph.node_rp is None

    def node_z_err(f):
        m = int(f.graph.num_nodes)
        node = np.asarray(f.graph.node_pose[:m])
        tz = np.asarray(jax.vmap(
            lambda p: world3d.terrain_height(world, p))(
                jnp.asarray(node[:, :2]))) + c.sim.sensor_height
        return np.abs(node[:, 3] - tz)
    z3, z2 = node_z_err(f3), node_z_err(f2)
    # the measured win: 0.20 vs 0.27 m mean node-z error at this fixture
    assert z3.mean() <= z2.mean() * 0.9, (z3.mean(), z2.mean())
    # both engines must still deliver the mission in xy
    for est, true in ((est2, true2), (est3, true3)):
        ate = float(slam2d.ate(jnp.array(est[8:, :3]),
                               jnp.array(true[8:, :3])))
        assert ate < 0.6, ate


