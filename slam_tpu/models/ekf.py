"""8-state EKF — TPU-native rebuild of ekf/src/nasa_ekf.cpp.

State (nasa_ekf.cpp:188-195):
  0: inertial x        1: inertial y
  2: inertial x vel    3: inertial y vel
  4: body x vel        5: body y vel
  6: inertial yaw      7: body yaw rate

The reference runs predict at 100 Hz with gyro / SLAM updates applied as they
arrive (nasa_ekf.cpp:421-457). Here each update is a pure function; the fused
pipeline composes them in a deterministic order, and `has_meas` flags replace
the newMeas booleans so a vmapped fleet can mix robots with/without fresh
measurements in one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam_tpu.config import EkfConfig
from slam_tpu.geometry import angle_wrap, subtract_yaw
from slam_tpu.types import EkfState


def _mm(a, b):
    """Full-precision matmul for small covariance algebra."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def init_ekf(cfg: EkfConfig, gyro_bias=0.0, dtype=jnp.float32) -> EkfState:
    """Initial state (nasa_ekf.cpp:380-384): mu=0, sigma=0.001*I."""
    return EkfState(
        mu=jnp.zeros(8, dtype),
        sigma=jnp.eye(8, dtype=dtype) * cfg.init_sigma,
        gyro_bias=jnp.asarray(gyro_bias, dtype),
    )


def estimate_gyro_bias(gyro_samples: jnp.ndarray) -> jnp.ndarray:
    """Average stationary gyro samples (nasa_ekf.cpp:292-335)."""
    return jnp.mean(gyro_samples, axis=-1)


def clamp_cmd(cmd: jnp.ndarray, cfg: EkfConfig) -> jnp.ndarray:
    """Clamp + NaN-reject control input (nasa_ekf.cpp:341-367).

    Reference semantics exactly: ANY NaN component zeroes the WHOLE command
    (the cmdCallback rejects the message outright), not just the bad
    component — a half-trusted command would diverge from its trajectory."""
    cmd = jnp.where(jnp.any(jnp.isnan(cmd), axis=-1, keepdims=True),
                    0.0, cmd)
    lim = jnp.array([cfg.cmd_vel_max, cfg.cmd_vel_max, cfg.cmd_omega_max],
                    dtype=cmd.dtype)
    return jnp.clip(cmd, -lim, lim)


def motion_update(state: EkfState, cmd: jnp.ndarray, dt, cfg: EkfConfig) -> EkfState:
    """Predict step (nasa_ekf.cpp:185-234).

    cmd = [vx_body, vy_body, omega_cmd]; note the reference propagates yaw with
    the *state* yaw-rate mu[7], not the commanded omega (nasa_ekf.cpp:202-203),
    and body velocity straight from the command.
    """
    mu, sigma = state.mu, state.sigma
    dt = jnp.asarray(dt, mu.dtype)
    # clamp + NaN-reject at the filter input, not just at message ingest:
    # the reference drops NaN cmd_vel messages before they ever reach the
    # predict step (nasa_ekf.cpp:344-352); a caller feeding external frames
    # (process_frame / slam_step_io) must get the same protection, or one
    # bad frame NaN-poisons mu/sigma permanently
    cmd = clamp_cmd(cmd, cfg)
    vx, vy = cmd[0], cmd[1]
    yaw = angle_wrap(mu[6] + mu[7] * dt)
    omega = mu[7]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    vX = vx * c - vy * s
    vY = vx * s + vy * c

    mubar = jnp.stack([
        mu[0] + vX * dt,
        mu[1] + vY * dt,
        vX,
        vY,
        vx,
        vy,
        yaw,
        omega,
    ])

    # analytic Jacobian G (nasa_ekf.cpp:221-226)
    G = jnp.zeros((8, 8), mu.dtype)
    G = G.at[0, 0].set(1.0).at[0, 2].set(dt)
    G = G.at[1, 1].set(1.0).at[1, 3].set(dt)
    G = G.at[2, 4].set(c).at[2, 5].set(-s).at[2, 6].set(-vx * s - vy * c)
    G = G.at[3, 4].set(s).at[3, 5].set(c).at[3, 6].set(vx * c - vy * s)
    G = G.at[6, 6].set(1.0).at[6, 7].set(dt)

    # Covariance matmuls are 8x8 — force full f32 (TPU default matmul
    # precision is bf16, which is fatal for covariance propagation).
    R = jnp.eye(8, dtype=mu.dtype) * cfg.motion_noise
    sigmabar = _mm(_mm(G, sigma), G.T) + R
    return state.replace(mu=mubar, sigma=sigmabar)


def yaw_rate_update(state: EkfState, gyro_z: jnp.ndarray, cfg: EkfConfig,
                    has_meas=True) -> EkfState:
    """Gyro yaw-rate update with scalar gain (nasa_ekf.cpp:243-260).

    gyro_z is the raw measurement; the bias is subtracted here
    (nasa_ekf.cpp:442 passes gz - bias_gz).
    """
    mubar, sigmabar = state.mu, state.sigma
    meas = gyro_z - state.gyro_bias
    C = jnp.zeros(8, mubar.dtype).at[7].set(1.0)
    sC = _mm(sigmabar, C)                  # (8,)
    denom = C @ sC + jnp.asarray(cfg.meas_noise_yaw, mubar.dtype)
    K = sC / denom                         # (8,)
    mu = mubar + K * (meas - mubar[7])
    mu = mu.at[6].set(angle_wrap(mu[6]))
    sigma = _mm(jnp.eye(8, dtype=mubar.dtype) - jnp.outer(K, C), sigmabar)
    # a non-finite gyro sample is a dropped measurement, not filter poison
    # (same stance as the reference's NaN cmd_vel gate, nasa_ekf.cpp:344)
    has = jnp.asarray(has_meas) & jnp.isfinite(meas)
    return state.replace(
        mu=jnp.where(has, mu, mubar),
        sigma=jnp.where(has, sigma, sigmabar),
    )


def slam_update(state: EkfState, meas: jnp.ndarray, cfg: EkfConfig,
                has_meas=True) -> EkfState:
    """SLAM x/y/yaw update with angle-wrapped innovation (nasa_ekf.cpp:262-290)."""
    mubar, sigmabar = state.mu, state.sigma
    C = jnp.zeros((3, 8), mubar.dtype)
    C = C.at[0, 0].set(1.0).at[1, 1].set(1.0).at[2, 6].set(1.0)
    pred = C @ mubar
    innov = jnp.stack([
        meas[0] - pred[0],
        meas[1] - pred[1],
        subtract_yaw(angle_wrap(meas[2]), pred[2]),
    ])
    Q = jnp.eye(3, dtype=mubar.dtype) * cfg.meas_noise_slam
    S = _mm(_mm(C, sigmabar), C.T) + Q
    # closed-form 3x3 inverse: jnp.linalg.inv lowers to an LU custom-call
    # (~1 ms/tick at batch 1024); S is SPD with Q = 10 I, so the adjugate
    # form is exact and fuses into the surrounding VPU ops
    from slam_tpu.ops.linalg import inv3
    K = _mm(_mm(sigmabar, C.T), inv3(S))
    mu = mubar + _mm(K, innov)
    sigma = _mm(jnp.eye(8, dtype=mubar.dtype) - _mm(K, C), sigmabar)
    # a non-finite pose measurement is a dropped update (matches the ICP
    # failure-sentinel stance: skip, never poison)
    has = jnp.asarray(has_meas) & jnp.all(jnp.isfinite(meas))
    return state.replace(
        mu=jnp.where(has, mu, mubar),
        sigma=jnp.where(has, sigma, sigmabar),
    )


def global_offset(state: EkfState, delta: jnp.ndarray) -> EkfState:
    """Shift pose by a graph-SLAM delta [dx, dy, dyaw] (nasa_ekf.cpp:155-176)."""
    mu = state.mu
    mu = mu.at[0].add(delta[0]).at[1].add(delta[1])
    mu = mu.at[6].set(angle_wrap(mu[6] + delta[2]))
    return state.replace(mu=mu)
