"""Integrated loop closure: a robot drives a square loop with a biased,
uncalibrated gyro; the keyframe graph acquires KNN edges back to early
keyframes on return (graph_slam.cpp:508-519) and scan-to-map registration +
optimization keep the loop consistent where dead reckoning drifts away."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import sim2d_config
from slam_tpu.pipeline import slam2d
from slam_tpu.sim import world2d


def _square_cmds(leg_m=10.0, v=1.5, om=0.75, dt=0.1):
    """Command sequence: 4 x (straight leg + quarter turn in place)."""
    leg_steps = int(leg_m / (v * dt))
    turn_steps = int((np.pi / 2) / (om * dt))
    cmds = []
    for _ in range(4):
        cmds += [[v, 0.0, 0.0]] * leg_steps
        cmds += [[0.0, 0.0, om]] * turn_steps
    return np.array(cmds, np.float32)


def test_square_loop_closes():
    c = sim2d_config()
    cfg = dataclasses.replace(
        c,
        graph=dataclasses.replace(c.graph, max_nodes=24, max_edges=96,
                                  keyframe_points=256, knn_dist_thresh=3.0),
        sim=dataclasses.replace(c.sim, gyro_bias=0.02, gyro_noise=0.001),
    )
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    cmds = _square_cmds()
    n = len(cmds)

    # render the sensor feed along the true square
    def body(pose, cmd):
        pose = world2d.unicycle_step(pose, cmd, cfg.sim.dt)
        r, h = world2d.raycast(world, pose, cfg.sim)
        return pose, (r, h, pose)

    _, (rs, hs, true_poses) = jax.lax.scan(body, jnp.zeros(3),
                                           jnp.array(cmds))
    rng = np.random.default_rng(0)
    ranges = np.asarray(rs) + rng.normal(0, cfg.sim.range_noise,
                                         np.asarray(rs).shape)
    gyros = cmds[:, 2] + cfg.sim.gyro_bias + rng.normal(
        0, cfg.sim.gyro_noise, n)
    B = cfg.sim.num_beams
    ang0 = np.arange(B) * (2 * np.pi / B)

    def run(slam_on):
        # uncalibrated gyro: bias unknown => dead reckoning drifts in yaw
        st = slam2d.init_state(jax.random.PRNGKey(0), cfg, with_graph=True,
                               calibrate_gyro=False)
        step = jax.jit(lambda s, sc, h, g, cm: slam2d.slam_step_io(
            s, sc, h, g, cm, cfg, incremental_map=False))
        gstep = jax.jit(lambda s: slam2d.graph_update(s, cfg))
        for t in range(n):
            r = np.where(np.asarray(hs[t]), ranges[t], cfg.sim.beam_max_range)
            scan = np.stack([r * np.cos(ang0), r * np.sin(ang0),
                             np.zeros_like(r)], -1).astype(np.float32)
            hit = np.asarray(hs[t]) if slam_on else np.zeros(B, bool)
            st = step(st, jnp.array(scan), jnp.array(hit),
                      jnp.float32(gyros[t]), jnp.array(cmds[t]))
            if slam_on and t % 8 == 7:
                st = gstep(st)
        return st

    st = run(slam_on=True)
    st_dr = run(slam_on=False)

    true_end = np.asarray(true_poses[-1])
    err = np.linalg.norm(np.asarray(st.pose[:2]) - true_end[:2])
    err_dr = np.linalg.norm(np.asarray(st_dr.pose[:2]) - true_end[:2])
    assert err < 0.5, f"loop not closed: {err} m"
    assert err_dr > 2 * err, f"dead reckoning should drift: {err_dr} vs {err}"

    # loop-closure evidence: some late keyframe has an edge to an early one
    ne = int(st.graph.num_edges)
    ij = np.asarray(st.graph.edge_ij[:ne])
    nn = int(st.graph.num_nodes)
    assert nn >= 5
    closure = ((ij[:, 1] >= nn - 2) & (ij[:, 0] <= 1)).any()
    assert closure, f"no closure edge among {ij.tolist()}"
