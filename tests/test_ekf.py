"""Golden-value EKF tests against a NumPy oracle transcribing the reference
math (ekf/src/nasa_ekf.cpp:185-290)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slam_tpu.config import EkfConfig
from slam_tpu.models import ekf as ekf_mod


def np_angle_wrap(a):
    return np.arctan2(np.sin(a), np.cos(a))


def oracle_motion(mu, sigma, cmd, dt, cfg: EkfConfig):
    """NumPy transcription of motion_update (nasa_ekf.cpp:185-234)."""
    vx, vy = cmd[0], cmd[1]
    yaw = np_angle_wrap(mu[6] + mu[7] * dt)
    omega = mu[7]
    vX = vx * np.cos(yaw) - vy * np.sin(yaw)
    vY = vx * np.sin(yaw) + vy * np.cos(yaw)
    mubar = np.array([
        mu[0] + vX * dt, mu[1] + vY * dt, vX, vY, vx, vy, yaw, omega])
    G = np.zeros((8, 8))
    G[0, 0] = 1; G[0, 2] = dt
    G[1, 1] = 1; G[1, 3] = dt
    G[2, 4] = np.cos(yaw); G[2, 5] = -np.sin(yaw)
    G[2, 6] = -vx * np.sin(yaw) - vy * np.cos(yaw)
    G[3, 4] = np.sin(yaw); G[3, 5] = np.cos(yaw)
    G[3, 6] = vx * np.cos(yaw) - vy * np.sin(yaw)
    G[6, 6] = 1; G[6, 7] = dt
    R = np.eye(8) * cfg.motion_noise
    return mubar, G @ sigma @ G.T + R


def oracle_yaw_update(mubar, sigmabar, meas, cfg: EkfConfig):
    C = np.zeros(8); C[7] = 1.0
    temp = 1.0 / (C @ sigmabar @ C + cfg.meas_noise_yaw)
    K = sigmabar @ C * temp
    mu = mubar + K * (meas - C @ mubar)
    mu[6] = np_angle_wrap(mu[6])
    sigma = (np.eye(8) - np.outer(K, C)) @ sigmabar
    return mu, sigma


def oracle_slam_update(mubar, sigmabar, meas, cfg: EkfConfig):
    C = np.zeros((3, 8)); C[0, 0] = 1; C[1, 1] = 1; C[2, 6] = 1
    pred = C @ mubar
    innov = np.array([meas[0] - pred[0], meas[1] - pred[1],
                      np_angle_wrap(meas[2] - pred[2])])
    S = C @ sigmabar @ C.T + np.eye(3) * cfg.meas_noise_slam
    K = sigmabar @ C.T @ np.linalg.inv(S)
    mu = mubar + K @ innov
    sigma = (np.eye(8) - K @ C) @ sigmabar
    return mu, sigma


@pytest.fixture
def cfg():
    return EkfConfig()


def rand_state(cfg, seed=0):
    rng = np.random.default_rng(seed)
    mu = rng.normal(size=8).astype(np.float32)
    A = rng.normal(size=(8, 8)).astype(np.float32) * 0.1
    sigma = A @ A.T + np.eye(8, dtype=np.float32) * 0.01
    return ekf_mod.EkfState(mu=jnp.array(mu), sigma=jnp.array(sigma),
                            gyro_bias=jnp.float32(0.0)), mu, sigma


def test_motion_update_matches_oracle(cfg):
    st, mu, sigma = rand_state(cfg)
    cmd = np.array([1.5, 0.2, 0.3], np.float32)
    out = ekf_mod.motion_update(st, jnp.array(cmd), 0.01, cfg)
    mubar, sigmabar = oracle_motion(mu, sigma, cmd, 0.01, cfg)
    np.testing.assert_allclose(out.mu, mubar, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out.sigma, sigmabar, rtol=1e-4, atol=1e-5)


def test_yaw_update_matches_oracle(cfg):
    st, mu, sigma = rand_state(cfg, 1)
    gyro = 0.21
    out = ekf_mod.yaw_rate_update(st, jnp.float32(gyro), cfg)
    mu2, sigma2 = oracle_yaw_update(mu, sigma, gyro, cfg)
    np.testing.assert_allclose(out.mu, mu2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out.sigma, sigma2, rtol=1e-4, atol=1e-5)


def test_yaw_update_subtracts_bias(cfg):
    st, mu, sigma = rand_state(cfg, 2)
    st_biased = st.replace(gyro_bias=jnp.float32(0.05))
    out_a = ekf_mod.yaw_rate_update(st, jnp.float32(0.16), cfg)
    out_b = ekf_mod.yaw_rate_update(st_biased, jnp.float32(0.21), cfg)
    np.testing.assert_allclose(out_a.mu, out_b.mu, rtol=1e-5, atol=1e-6)


def test_slam_update_matches_oracle(cfg):
    st, mu, sigma = rand_state(cfg, 3)
    meas = np.array([1.0, -2.0, 3.0], np.float32)  # yaw crosses pi wrap
    out = ekf_mod.slam_update(st, jnp.array(meas), cfg)
    mu2, sigma2 = oracle_slam_update(mu, sigma, meas, cfg)
    np.testing.assert_allclose(out.mu, mu2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out.sigma, sigma2, rtol=1e-4, atol=1e-5)


def test_slam_update_no_meas_passthrough(cfg):
    st, _, _ = rand_state(cfg, 4)
    out = ekf_mod.slam_update(st, jnp.zeros(3), cfg, has_meas=False)
    np.testing.assert_allclose(out.mu, st.mu)
    np.testing.assert_allclose(out.sigma, st.sigma)


def test_clamp_cmd_rejects_nan_and_clamps(cfg):
    # ANY NaN component zeroes the WHOLE command (the reference's
    # cmdCallback rejects the message outright, nasa_ekf.cpp:344-352),
    # not just the bad component
    cmd = jnp.array([jnp.nan, 5.0, -2.0])
    out = ekf_mod.clamp_cmd(cmd, cfg)
    np.testing.assert_allclose(out, [0.0, 0.0, 0.0])
    # NaN-free commands clamp per component
    out2 = ekf_mod.clamp_cmd(jnp.array([1.0, 5.0, -2.0]), cfg)
    np.testing.assert_allclose(out2, [1.0, 3.0, -0.75])


def test_dead_reckoning_tracks_straight_line(cfg):
    """First end-to-end EKF behavior: constant forward command integrates x."""
    st = ekf_mod.init_ekf(cfg)
    cmd = jnp.array([1.0, 0.0, 0.0])
    for _ in range(100):
        st = ekf_mod.motion_update(st, cmd, 0.01, cfg)
    assert abs(float(st.mu[0]) - 1.0) < 1e-3
    assert abs(float(st.mu[1])) < 1e-4
