"""End-to-end 3D Velodyne SLAM (BASELINE config 2): segmentation + ICP +
height interpolation + occupancy on procedural terrain."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import sim3d_config
from slam_tpu.pipeline import slam2d, slam3d
from slam_tpu.sim import world3d
from slam_tpu.types import make_cloud


def test_raycast_matches_dense_march_oracle():
    """The production raycast (16-step bracket + regula falsi) must agree
    with a dense 512-step march + deep refine to sub-mm range on hit rays,
    and agree exactly on the hit mask. Guards the spectral-bound argument
    for the coarse march (world3d.py raycast comment): make_world terrain
    wavelengths are >= 55 m, so a 16-step bracket over 50 m cannot straddle
    a dip-and-recover crossing."""
    cfg = sim3d_config()
    for seed in (1, 7):
        world = world3d.make_world(jax.random.PRNGKey(seed), cfg.sim)
        for pose in (jnp.array([0.0, 0.0, 0.3]), jnp.array([9.0, -14.0, 2.1])):
            fast, hit_f = world3d.raycast(world, pose, cfg.sim,
                                          roll=0.03, pitch=-0.02)
            dense, hit_d = world3d.raycast(world, pose, cfg.sim,
                                           march_steps=512, refine_steps=12,
                                           roll=0.03, pitch=-0.02)
            hit_f, hit_d = np.asarray(hit_f), np.asarray(hit_d)
            assert (hit_f == hit_d).mean() > 0.999, "hit masks diverge"
            both = hit_f & hit_d
            rf = np.linalg.norm(np.asarray(fast)[both], axis=-1)
            rd = np.linalg.norm(np.asarray(dense)[both], axis=-1)
            err = np.abs(rf - rd)
            assert err.max() < 2e-3, f"range error {err.max():.5f} m"


def test_raycast_geometry():
    cfg = sim3d_config()
    world = world3d.make_world(jax.random.PRNGKey(1), cfg.sim)
    pts, hit = world3d.raycast(world, jnp.array([0.0, 0.0, 0.3]), cfg.sim)
    pts, hit = np.asarray(pts), np.asarray(hit)
    assert hit.sum() > 500, "most downward rays should hit terrain"
    # ground points should sit ~sensor_height below the sensor
    low = pts[hit & (pts[:, 2] < -0.5)]
    assert len(low) > 100
    assert abs(np.median(low[:, 2]) + cfg.sim.sensor_height) < 1.0


def test_rollout3d_tracks():
    cfg = sim3d_config()
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
    state = slam3d.init_state_3d(jax.random.PRNGKey(0), cfg, world)
    gmap = slam3d.init_ground_map(cfg)
    final, gmap, (est, true) = slam3d.rollout_3d(state, world, gmap, cfg, 40)
    est, true = np.asarray(est), np.asarray(true)
    err = slam2d.ate(jnp.array(est[10:, :3]), jnp.array(true[10:, :3]))
    assert float(err) < 0.5, f"3D ATE too large: {float(err)}"
    # height tracking: estimated z should follow terrain z
    z_err = np.abs(est[15:, 3] - true[15:, 3]).mean()
    assert z_err < 0.4, f"z error {z_err}"
    # occupancy map should contain obstacles
    assert int((final.local_map.drivable == 0).sum()) > 5
    assert int((gmap.grid.count > 0).sum()) > 100


def test_step3d_vmappable():
    cfg = sim3d_config()
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
    B = 2
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    states = jax.vmap(lambda k: slam3d.init_state_3d(k, cfg, world))(keys)
    gmaps = jax.vmap(lambda _: slam3d.init_ground_map(cfg))(keys)
    step = jax.jit(jax.vmap(lambda s, g: slam3d.slam_step_3d(s, world, g, cfg)))
    out, gm = step(states, gmaps)
    assert out.pose.shape == (B, 4)
