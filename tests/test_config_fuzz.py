"""Config-space smoke sweep: off-default corners must compile and stay
finite, not just the tuned benchmark configs.

The reference is configured by compile-time #defines, so every deployment
is a fresh constant set (SURVEY.md §5 config); the TPU build's equivalent
promise is that any reasonable SlamConfig traces, compiles, and produces a
finite tracking trajectory. Corners picked for shape-bug potential: prime/
odd capacities (lane-padding edges), tiny containers (mask-underflow
edges), every matcher x loop engine pairing, exact-export mode, and odd
polar-grid dimensions in 3D.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.config import sim2d_config, sim3d_config


def _case(name, **groups):
    cfg = sim2d_config()
    for field, kw in groups.items():
        cfg = cfg.replace(**{field: dataclasses.replace(
            getattr(cfg, field), **kw)})
    return pytest.param(cfg, id=name)


CASES_2D = [
    _case("prime_beams_odd_caps",
          sim=dict(num_beams=251),
          cloud=dict(scan_capacity=256, scene_capacity=200, map_capacity=300),
          icp=dict(ga_num_bins=100)),
    _case("tiny_containers",
          sim=dict(num_beams=96),
          cloud=dict(scan_capacity=128, scene_capacity=48, ground_capacity=4,
                     map_capacity=96),
          icp=dict(ga_num_bins=64, max_points=96)),
    _case("points_matcher_scan_loop",
          icp=dict(matcher="points", loop="scan")),
    _case("grid_matcher_grid_builder",
          cloud=dict(scene_builder="grid"),
          icp=dict(matcher="grid", scan_grid_bins=96)),
    _case("particle_matcher",
          icp=dict(matcher="particle"),
          pf=dict(num_particles=96)),
    _case("exact_export",
          cloud=dict(export_recall=1.0)),
]


@pytest.mark.parametrize("cfg", CASES_2D)
def test_2d_rollout_finite_and_tracks(cfg):
    from slam_tpu.pipeline import slam2d
    from slam_tpu.sim import world2d

    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    state = slam2d.init_state(jax.random.PRNGKey(0), cfg)
    final, (est, true) = jax.jit(
        lambda s: slam2d.rollout(s, world, cfg, 8))(state)
    est, true = np.asarray(est), np.asarray(true)
    assert np.isfinite(est).all(), "trajectory went non-finite"
    assert np.isfinite(np.asarray(final.ekf.sigma)).all(), "EKF cov non-finite"
    err = np.sqrt(((est[:, :2] - true[:, :2]) ** 2).sum(-1))
    assert err.max() < 1.0, f"diverged {err.max():.2f} m in 8 steps"


def test_3d_odd_polar_grid_finite():
    from slam_tpu.pipeline import slam3d
    from slam_tpu.sim import world3d

    cfg = sim3d_config()
    cfg = cfg.replace(
        sim=dataclasses.replace(cfg.sim, num_azimuth=48),   # 1536 rays
        ground=dataclasses.replace(cfg.ground, num_sectors=18,
                                   num_range_bins=50),
    )
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
    s = slam3d.init_state_3d(jax.random.PRNGKey(0), cfg, world)
    gm = slam3d.init_ground_map(cfg)
    final, _, (est, true) = slam3d.rollout_3d(s, world, gm, cfg, 8)
    est, true = np.asarray(est), np.asarray(true)
    assert np.isfinite(est).all()
    err = np.sqrt(((est[:, :2] - true[:, :2]) ** 2).sum(-1))
    assert err.max() < 1.0, f"diverged {err.max():.2f} m in 8 steps"


def test_mls_odd_grid_dims():
    """Non-square, odd MLS grids: add points, shift the rolling origin, and
    read drivability without shape faults or NaNs."""
    from slam_tpu.mapping.mls import add_to_mls, init_mls, shift_origin_mls
    from slam_tpu.types import cloud_from_xyz

    cfg = sim2d_config().mls
    cfg = dataclasses.replace(cfg, size_x=33, size_y=47, update_dist=12)
    grid = init_mls(cfg)
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.uniform(-3, 3, (256, 3)).astype(np.float32))
    grid = add_to_mls(grid, cloud_from_xyz(xyz), cfg)
    grid = shift_origin_mls(grid, jnp.asarray([2.0, -1.5]), cfg)
    grid = add_to_mls(grid, cloud_from_xyz(xyz + 1.0), cfg)
    for leaf in jax.tree.leaves(grid):
        assert np.isfinite(np.asarray(leaf)).all()
