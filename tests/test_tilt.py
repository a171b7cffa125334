"""Roll/pitch tilt compensation (pointcloud_filter.cpp:103-148 parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import sim3d_config
from slam_tpu.geometry import rp_compensate
from slam_tpu.sim import world3d


def test_terrain_attitude_matches_gradient():
    cfg = sim3d_config()
    world = world3d.make_world(jax.random.PRNGKey(1), cfg.sim,
                               terrain_amp=1.5)
    xy = jnp.array([12.0, -7.0])
    roll, pitch = world3d.terrain_attitude(world, xy)
    # tilt should be nonzero on wavy terrain and bounded by the slope
    assert 1e-4 < abs(float(roll)) + abs(float(pitch)) < 0.6


def test_compensation_restores_ground_plane():
    cfg = sim3d_config()
    world = world3d.make_world(jax.random.PRNGKey(2), cfg.sim,
                               terrain_amp=0.0)  # flat ground
    pose = jnp.array([0.0, 0.0, 0.4])
    roll, pitch = 0.12, -0.08
    pts_tilted, hit = world3d.raycast(world, pose, cfg.sim, roll=roll,
                                      pitch=pitch)
    pts = rp_compensate(pts_tilted, jnp.asarray(roll), jnp.asarray(pitch))
    # ground band only (cylinder obstacles also return low points)
    band = lambda a: a[(a[:, 2] < -1.35) & (a[:, 2] > -1.55)]
    ground = band(np.asarray(pts)[np.asarray(hit)])
    # compensated ground points must form a level plane at -sensor_height
    assert len(ground) > 200
    spread = np.std(ground[:, 2])
    assert abs(np.median(ground[:, 2]) + cfg.sim.sensor_height) < 0.02
    assert spread < 0.02, f"ground not level after compensation: {spread}"
    # without compensation the same-band points tilt with the sensor
    raw = band(np.asarray(pts_tilted)[np.asarray(hit)])
    assert np.std(raw[:, 2]) > 2 * spread
