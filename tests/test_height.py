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


def test_grid_source_matches_cloud_source():
    """height_interpolate_grid(grid) == height_interpolate(exact export of
    the same grid): the window slice sees exactly the occupied centroids the
    export would emit (capacity >= occupancy, recall=1.0), so the 4-wheel
    correspondences and the fitted plane agree."""
    import jax

    from slam_tpu.mapping.point_map import (export_points, init_point_map,
                                            update_point_map)
    from slam_tpu.ops.height import height_interpolate_grid

    cfg = HeightConfig()
    rng = np.random.default_rng(3)
    n = 4000
    xy = rng.uniform(-20, 20, (n, 2)).astype(np.float32)
    z = (0.3 + 0.1 * xy[:, 0] - 0.05 * xy[:, 1]
         + rng.normal(0, 0.02, n)).astype(np.float32)
    xyz = jnp.array(np.concatenate([xy, z[:, None]], 1))
    grid = init_point_map(128, resolution=0.5)
    grid = grid.replace(center=jnp.array([1.0, -2.0]))
    grid = update_point_map(grid, xyz, jnp.ones(n, bool),
                            z_precision=jax.lax.Precision.HIGH)
    occupied = int(jnp.sum(grid.count >= 1.0))
    cloud = export_points(grid, occupied + 8, recall=1.0)
    for pose in ([0.0, 0.0, 0.4, 9.0], [5.0, -3.0, 1.2, 9.0],
                 [-14.0, 11.0, 2.5, 9.0], [60.0, 60.0, 0.0, 9.0]):
        p = jnp.array(pose)
        zc = float(height_interpolate(cloud, p, cfg))
        zg = float(height_interpolate_grid(grid, p, cfg))
        assert abs(zc - zg) < 1e-4, (pose, zc, zg)
