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
    # score every k-th scan point (classic MCL beam skipping): the scoring
    # gather is the entire PF cost on TPU (serialized ~6 ns/element; P x N
    # per robot per tick), and the hit FRACTION is an unbiased estimate at
    # any stride — stride 4 keeps the estimator's std under ~0.05 while
    # cutting the matcher cost 4x (measured 313 -> 98 ms/tick at b1024).
    # Scan points are beam-ordered, so a stride keeps angular coverage
    # uniform.
    score_stride: int = 4


class PFResult(NamedTuple):
    pose: jnp.ndarray            # (3,) weighted-mean pose
    score: jnp.ndarray           # () best particle hit fraction
    ok: jnp.ndarray              # () acceptance
    particles: jnp.ndarray       # (P, 3) resampled particles


def occupancy_flat(grid: PointMapGrid) -> jnp.ndarray:
    """(G*G,) bool occupancy table for score_pose — compute ONCE per match
    and share across particles: the per-(particle, point) work is then a
    single flat 1-D gather, which the TPU runs ~30% faster than the 2-D
    gather + compare it replaces (92.9 vs 131.3 ms/tick at b1024, P=128,
    96 scored points)."""
    return grid.count.reshape(-1) > 0


def score_pose(grid: PointMapGrid, scan_xy: jnp.ndarray, valid: jnp.ndarray,
               pose: jnp.ndarray, resolution: float,
               occ_flat: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fraction of scan points landing in occupied map cells at `pose`."""
    G = grid.count.shape[0]
    if occ_flat is None:
        occ_flat = occupancy_flat(grid)
    world = se2_apply(pose, scan_xy)
    rel = world - grid.center
    cx = jnp.floor(rel[..., 0] / resolution).astype(jnp.int32) + G // 2
    cy = jnp.floor(rel[..., 1] / resolution).astype(jnp.int32) + G // 2
    inb = valid & (cx >= 0) & (cy >= 0) & (cx < G) & (cy < G)
    flat = jnp.clip(cx, 0, G - 1) * G + jnp.clip(cy, 0, G - 1)
    hits = jnp.sum(jnp.where(inb & occ_flat[flat], 1.0, 0.0))
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

    st = max(1, int(cfg.score_stride))
    scan_xy = scan.xyz[::st, :2]
    valid = scan.valid[::st]
    occ = occupancy_flat(grid)                    # shared by all particles
    scores = jax.vmap(
        lambda p: score_pose(grid, scan_xy, valid, p, resolution, occ)
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
    out_score = score_pose(grid, scan_xy, valid, pose, resolution, occ)
    return PFResult(pose=pose, score=out_score,
                    ok=out_score >= cfg.min_score, particles=resampled)
