"""Particle-filter scan matching — the fleet-scale matching variant
(BASELINE config 5: "particle-filter scan matching + shared map").

The reference has no particle filter; this is the batched alternative to ICP
for fleet simulation: P pose particles per robot are scored by scan-to-map
occupancy agreement (a gather into the point-map grid — no NN search at
all), softmax-weighted, systematically resampled, and collapsed to a pose
measurement for the EKF. Cost is O(P * N_scan) gathers per robot — flat in
map size, ideal when thousands of robots share HBM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tpu.geometry import angle_wrap, se2_apply
from slam_tpu.mapping.point_map import PointMapGrid
from slam_tpu.types import PointCloud


class PFConfig(NamedTuple):
    num_particles: int = 128
    pos_sigma: float = 0.3       # proposal spread around the prediction [m]
    yaw_sigma: float = 0.05      # [rad]
    temperature: float = 0.1     # softmax temperature on hit fractions
    min_score: float = 0.2       # acceptance gate (hit fraction)


class PFResult(NamedTuple):
    pose: jnp.ndarray            # (3,) weighted-mean pose
    score: jnp.ndarray           # () best particle hit fraction
    ok: jnp.ndarray              # () acceptance
    particles: jnp.ndarray       # (P, 3) resampled particles


def score_pose(grid: PointMapGrid, scan_xy: jnp.ndarray, valid: jnp.ndarray,
               pose: jnp.ndarray, resolution: float) -> jnp.ndarray:
    """Fraction of scan points landing in occupied map cells at `pose`."""
    G = grid.count.shape[0]
    world = se2_apply(pose, scan_xy)
    rel = world - grid.center
    cx = jnp.floor(rel[..., 0] / resolution).astype(jnp.int32) + G // 2
    cy = jnp.floor(rel[..., 1] / resolution).astype(jnp.int32) + G // 2
    inb = valid & (cx >= 0) & (cy >= 0) & (cx < G) & (cy < G)
    occ = grid.count[jnp.clip(cx, 0, G - 1), jnp.clip(cy, 0, G - 1)] > 0
    hits = jnp.sum(jnp.where(inb & occ, 1.0, 0.0))
    return hits / jnp.maximum(jnp.sum(valid), 1)


def pf_match(key: jnp.ndarray, grid: PointMapGrid, scan: PointCloud,
             pred_pose: jnp.ndarray, resolution: float,
             cfg: PFConfig = PFConfig()) -> PFResult:
    """One particle-filter measurement step for a single robot (vmap over the
    fleet). pred_pose: (3,) EKF prediction, the proposal center."""
    P = cfg.num_particles
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, (P, 3)) * jnp.array(
        [cfg.pos_sigma, cfg.pos_sigma, cfg.yaw_sigma])
    particles = pred_pose + noise
    particles = particles.at[0].set(pred_pose)  # keep the prediction itself

    scan_xy = scan.xyz[..., :2]
    scores = jax.vmap(
        lambda p: score_pose(grid, scan_xy, scan.valid, p, resolution)
    )(particles)                                              # (P,)

    w = jax.nn.softmax(scores / cfg.temperature)
    # weighted circular mean for yaw
    mx = jnp.sum(w * particles[:, 0])
    my = jnp.sum(w * particles[:, 1])
    myaw = jnp.arctan2(jnp.sum(w * jnp.sin(particles[:, 2])),
                       jnp.sum(w * jnp.cos(particles[:, 2])))
    pose = jnp.stack([mx, my, angle_wrap(myaw)])

    # systematic resampling (for iterated filtering across steps)
    u = (jax.random.uniform(k2) + jnp.arange(P)) / P
    cdf = jnp.cumsum(w)
    idx = jnp.searchsorted(cdf, u)
    resampled = particles[jnp.clip(idx, 0, P - 1)]

    # acceptance gates on the score of the RETURNED pose, not the best
    # particle: on a multimodal posterior (corridor ambiguity) the softmax
    # mean can land between two well-scoring modes where the scan matches
    # nothing — gating on max(scores) would accept exactly that pose
    out_score = score_pose(grid, scan_xy, scan.valid, pose, resolution)
    return PFResult(pose=pose, score=out_score,
                    ok=out_score >= cfg.min_score, particles=resampled)
