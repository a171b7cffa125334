"""Height interpolation unit tests (icpTools.cpp:301-419 behavior)."""

import jax.numpy as jnp
import numpy as np

from slam_tpu.config import HeightConfig
from slam_tpu.ops.height import height_interpolate
from slam_tpu.types import cloud_from_xyz


def _ground_plane(nx=0.0, ny=0.0, z0=0.0, n=200, seed=0):
    """Sampled plane z = z0 + nx*x + ny*y."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-5, 5, (n, 2)).astype(np.float32)
    z = z0 + nx * xy[:, 0] + ny * xy[:, 1]
    return cloud_from_xyz(jnp.array(np.concatenate([xy, z[:, None]], 1)))


def test_flat_ground():
    cfg = HeightConfig()
    ground = _ground_plane(z0=0.5)
    pose = jnp.array([0.0, 0.0, 0.3, 0.0])
    z = height_interpolate(ground, pose, cfg)
    assert abs(float(z) - (0.5 + cfg.robot_height)) < 0.05


def test_sloped_ground():
    cfg = HeightConfig()
    slope = 0.2
    ground = _ground_plane(nx=slope)
    pose = jnp.array([2.0, 0.0, 0.0, 2.0 * slope + cfg.robot_height])
    z = height_interpolate(ground, pose, cfg)
    # z = n_z*h + avg_ground_z with unit normal of the slope
    n_z = 1.0 / np.sqrt(1 + slope**2)
    expect = n_z * cfg.robot_height + 2.0 * slope
    assert abs(float(z) - expect) < 0.1


def test_no_ground_keeps_z():
    cfg = HeightConfig()
    ground = _ground_plane()
    far_pose = jnp.array([100.0, 100.0, 0.0, 7.0])  # all NN beyond 3 m gate
    z = height_interpolate(ground, far_pose, cfg)
    assert float(z) == 7.0


def test_degenerate_single_point_fallback():
    cfg = HeightConfig()
    one = cloud_from_xyz(jnp.array([[0.0, 0.0, 0.2]]))
    pose = jnp.array([0.0, 0.0, 0.0, 1.0])
    z = height_interpolate(one, pose, cfg)
    # all 4 wheels match the same point -> vertical-normal fallback
    assert abs(float(z) - (0.2 + cfg.robot_height)) < 1e-5
