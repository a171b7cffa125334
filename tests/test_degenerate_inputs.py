"""Degenerate external sensor frames must never poison the state.

The reference guards its loop with runtime gates — incomplete-scan rejection
(pointcloud_filter.cpp:290, scan_registration.cpp:122), min-point ICP aborts
(icp.cpp:38-43), the w==9999 failure sentinel (icpTools.cpp:179-184), NaN
cmd rejection (nasa_ekf.cpp:344-352) — because a single bad frame must not
crash or corrupt the estimator. These tests drive the deployment entry
points (process_frame / process_frame_3d, the paths a user feeds real
sensors into) with all-miss scans and NaN commands and assert the state
stays finite, the failure is flagged, and recovery is immediate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import sim2d_config, sim3d_config
from slam_tpu.pipeline import slam2d, slam3d
from slam_tpu.sim import world2d, world3d


def _assert_finite_state(state):
    for name in ("pose", "scan_reg_pose"):
        arr = np.asarray(getattr(state, name))
        assert np.isfinite(arr).all(), f"{name} not finite: {arr}"
    assert np.isfinite(np.asarray(state.ekf.mu)).all()
    assert np.isfinite(np.asarray(state.ekf.sigma)).all()


def test_all_miss_scan_2d_flags_failure_and_dead_reckons():
    cfg = sim2d_config()
    st = slam2d.init_state(jax.random.PRNGKey(0), cfg)
    scan = jnp.zeros((cfg.sim.num_beams, 3))
    miss = jnp.zeros(cfg.sim.num_beams, bool)
    cmd = jnp.array([1.0, 0.0, 0.1])
    step = jax.jit(lambda s: slam2d.process_frame(s, scan, miss, 0.0,
                                                  cmd, cfg))
    for _ in range(3):
        st = step(st)
    _assert_finite_state(st)
    assert not bool(st.scan_reg_ok), "empty scan must fail registration"
    # EKF kept dead-reckoning on the command
    assert float(jnp.linalg.norm(st.pose[:2])) > 0.1


def test_all_miss_then_real_scan_recovers():
    cfg = sim2d_config()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam2d.init_state(jax.random.PRNGKey(0), cfg)
    # a few good steps to build the map, one blind step, then good again
    for _ in range(6):
        st = slam2d.slam_step(st, world, cfg)
    scan = jnp.zeros((cfg.sim.num_beams, 3))
    miss = jnp.zeros(cfg.sim.num_beams, bool)
    st = slam2d.process_frame(st, scan, miss, 0.0, jnp.zeros(3), cfg)
    assert not bool(st.scan_reg_ok)
    st = slam2d.slam_step(st, world, cfg)
    _assert_finite_state(st)
    assert bool(st.scan_reg_ok), "registration must recover on a real scan"


def test_nan_command_is_rejected_2d():
    """nasa_ekf.cpp:344-352: a NaN cmd_vel must not poison the filter."""
    cfg = sim2d_config()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam2d.init_state(jax.random.PRNGKey(0), cfg)
    for _ in range(3):
        st = slam2d.slam_step(st, world, cfg)
    ranges, hit = world2d.raycast(world, st.true_pose[:3], cfg.sim)
    ang = jnp.arange(cfg.sim.num_beams) * (2 * jnp.pi / cfg.sim.num_beams)
    scan = jnp.stack([ranges * jnp.cos(ang), ranges * jnp.sin(ang),
                      jnp.zeros_like(ranges)], axis=-1)
    bad_cmd = jnp.array([jnp.nan, 0.0, 0.1])
    st = slam2d.process_frame(st, scan, hit, 0.0, bad_cmd, cfg)
    _assert_finite_state(st)


def test_nan_scan_points_and_gyro_2d():
    """NaN points inside an otherwise-valid scan (sensor dropouts encoded as
    NaN instead of hit=False) and a NaN gyro sample must both degrade to
    'measurement dropped', never to a poisoned state."""
    cfg = sim2d_config()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam2d.init_state(jax.random.PRNGKey(0), cfg)
    for _ in range(4):
        st = slam2d.slam_step(st, world, cfg)
    ranges, hit = world2d.raycast(world, st.true_pose[:3], cfg.sim)
    ang = jnp.arange(cfg.sim.num_beams) * (2 * jnp.pi / cfg.sim.num_beams)
    scan = jnp.stack([ranges * jnp.cos(ang), ranges * jnp.sin(ang),
                      jnp.zeros_like(ranges)], axis=-1)
    scan = scan.at[::7].set(jnp.nan)  # ~14% dropouts, still flagged hit
    st = slam2d.process_frame(st, scan, hit, jnp.nan, jnp.zeros(3), cfg)
    _assert_finite_state(st)
    assert np.isfinite(np.asarray(st.local_map.counts)).all()
    assert np.isfinite(np.asarray(st.map_grid.sum_x)).all()


def test_nan_attitude_3d_is_dropped():
    cfg = sim3d_config()
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam3d.init_state_3d(jax.random.PRNGKey(0), cfg, world)
    gm = slam3d.init_ground_map(cfg)
    for _ in range(3):
        st, gm = slam3d.slam_step_3d(st, world, gm, cfg)
    key = jax.random.PRNGKey(9)
    scan, hit = world3d.raycast(world, st.true_pose[:3], cfg.sim,
                                noise_key=key)
    scan = scan.at[::11].set(jnp.nan)
    st, gm = slam3d.slam_step_3d_io(st, gm, scan, hit, jnp.nan, jnp.nan,
                                    0.0, jnp.zeros(3), cfg)
    _assert_finite_state(st)
    assert np.isfinite(np.asarray(gm.grid.sum_z)).all()


def test_all_miss_scan_3d_flags_failure():
    cfg = sim3d_config()
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam3d.init_state_3d(jax.random.PRNGKey(0), cfg, world)
    gm = slam3d.init_ground_map(cfg)
    for _ in range(3):
        st, gm = slam3d.slam_step_3d(st, world, gm, cfg)
    n = cfg.sim.num_rings * cfg.sim.num_azimuth
    scan = jnp.zeros((n, 3))
    miss = jnp.zeros(n, bool)
    st, gm = slam3d.slam_step_3d_io(st, gm, scan, miss, 0.0, 0.0, 0.0,
                                    jnp.zeros(3), cfg)
    _assert_finite_state(st)
    assert not bool(st.scan_reg_ok)
    assert np.isfinite(float(st.pose[3])), "height must stay finite"
