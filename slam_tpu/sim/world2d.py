"""Procedural 2D worlds + batched 360-beam lidar — the synthetic fixture the
reference never had (SURVEY.md §4: validation was live-robot + rviz only).

A world is a set of circular obstacles inside a square arena. Raycasting is a
closed-form ray/circle + ray/wall intersection, vectorized over (beams x
obstacles) — no marching loops, fully MXU/VPU friendly, vmappable over robots
and worlds.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tpu.config import SimConfig


class World2D(NamedTuple):
    centers: jnp.ndarray  # (M, 2)
    radii: jnp.ndarray    # (M,)
    extent: jnp.ndarray   # () half-extent of square arena


def place_obstacles(k_pos, k_rad, cfg: SimConfig):
    """Random obstacle centers/radii, pushed out of the robot's ~8 m spawn
    disk — the one placement scheme both world fixtures share (world3d adds
    heights on top)."""
    M = cfg.num_obstacles
    pos = jax.random.uniform(k_pos, (M, 2), minval=-cfg.world_extent * 0.9,
                             maxval=cfg.world_extent * 0.9)
    r = jnp.linalg.norm(pos, axis=-1)
    pos = jnp.where((r < 8.0)[:, None], pos * (8.0 / (r[:, None] + 1e-6)),
                    pos)
    radii = jax.random.uniform(k_rad, (M,), minval=cfg.obstacle_radius_min,
                               maxval=cfg.obstacle_radius_max)
    return pos, radii


def make_world(key: jnp.ndarray, cfg: SimConfig) -> World2D:
    """Random circular obstacles, kept out of a spawn disk around the origin."""
    # k3 is unused but kept: dropping the 3-way split would change the
    # k1/k2 streams and thereby every committed fixture/benchmark world
    k1, k2, k3 = jax.random.split(key, 3)
    pos, radii = place_obstacles(k1, k2, cfg)
    return World2D(centers=pos, radii=radii,
                   extent=jnp.asarray(cfg.world_extent))


def raycast(world: World2D, pose: jnp.ndarray, cfg: SimConfig,
            noise_key: jnp.ndarray | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cast `num_beams` rays from pose [x, y, yaw]; returns (ranges, hit_mask).

    Beam b has world angle yaw + 2*pi*b/B. Range = min over circle hits and
    the arena walls, capped at beam_max_range.
    """
    B = cfg.num_beams
    ang = pose[2] + jnp.arange(B) * (2 * jnp.pi / B)
    d = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)      # (B, 2)
    o = pose[:2]

    # circles: |o + t d - c|^2 = r^2
    oc = o - world.centers                                     # (M, 2)
    b_half = jnp.einsum("bi,mi->bm", d, oc)                    # (B, M)
    c_term = jnp.sum(oc * oc, axis=-1)[None, :] - (world.radii**2)[None, :]
    disc = b_half * b_half - c_term
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_circle = -b_half - sqrt_disc
    t_circle = jnp.where((disc > 0) & (t_circle > 1e-3), t_circle, jnp.inf)
    t_circle = jnp.min(t_circle, axis=-1)                     # (B,)

    # arena walls at +-extent on each axis
    e = world.extent

    def wall_t(axis, sign):
        denom = d[:, axis]
        t = (sign * e - o[axis]) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        other = o[1 - axis] + t * d[:, 1 - axis]
        okw = (t > 1e-3) & (jnp.abs(other) <= e + 1e-6)
        return jnp.where(okw, t, jnp.inf)

    t_wall = jnp.minimum(
        jnp.minimum(wall_t(0, 1.0), wall_t(0, -1.0)),
        jnp.minimum(wall_t(1, 1.0), wall_t(1, -1.0)),
    )
    t = jnp.minimum(t_circle, t_wall)
    hit = t < cfg.beam_max_range
    t = jnp.where(hit, t, cfg.beam_max_range)
    if noise_key is not None:
        t = t + cfg.range_noise * jax.random.normal(noise_key, t.shape)
    return t, hit


def scan_to_points(ranges: jnp.ndarray, hit: jnp.ndarray, cfg=None,
                   yaw: jnp.ndarray | None = None):
    """Ranges -> (N, 3) points. In the sensor frame if yaw is None, else
    rotated to world orientation (the scan_registration roll/pitch-compensated,
    yaw-kept convention collapses to a pure yaw rotation in 2D).

    cfg is accepted for backward compatibility but unused (the beam count
    comes from the ranges shape)."""
    B = ranges.shape[-1]
    rel = jnp.arange(B) * (2 * jnp.pi / B)
    ang = rel if yaw is None else yaw + rel
    x = ranges * jnp.cos(ang)
    y = ranges * jnp.sin(ang)
    return jnp.stack([x, y, jnp.zeros_like(x)], axis=-1), hit


def scan_to_planes(ranges: jnp.ndarray, hit: jnp.ndarray):
    """Planar scan_to_points (sensor frame): (x, y) planes, no (N, 3) stack
    (whose minor dim XLA lane-pads to 128 — see geometry.se2_apply_xy)."""
    B = ranges.shape[-1]
    rel = jnp.arange(B) * (2 * jnp.pi / B)
    return ranges * jnp.cos(rel), ranges * jnp.sin(rel), hit


def drive_cmd(step: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Deterministic smooth drive pattern: a wavy loop that exercises both
    translation and rotation (the reference's WPI-course trajectory analogue,
    global_matching/global_matching.csv)."""
    t = step.astype(jnp.float32) * dt
    vx = 1.2 + 0.3 * jnp.sin(0.23 * t)
    vy = jnp.zeros_like(vx)
    om = 0.25 * jnp.sin(0.11 * t) + 0.08
    return jnp.stack([vx, vy, om])


def unicycle_step(pose: jnp.ndarray, cmd: jnp.ndarray, dt: float) -> jnp.ndarray:
    """True kinematics matching the EKF motion model (nasa_ekf.cpp:198-215):
    body velocity rotated by yaw, yaw integrates the rate."""
    yaw = pose[2] + cmd[2] * dt
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    vX = cmd[0] * c - cmd[1] * s
    vY = cmd[0] * s + cmd[1] * c
    return jnp.stack([
        pose[0] + vX * dt,
        pose[1] + vY * dt,
        jnp.arctan2(jnp.sin(yaw), jnp.cos(yaw)),
    ])
