"""Wheel-contact height interpolation — TPU-native rebuild of
CCICP::doHeightInterpolate (ccicp2d/src/icpTools.cpp:301-419).

Reference: place 4 wheel points at (+-0.5, +-0.5, -1.45) in the robot frame,
transform by the pose, NN into the ground cloud (<3 m gate, :347), average the
matched ground points, fit a plane normal over the 4 correspondences, and set
z = ground_avg + normal * robot_height (:357-393). KD-tree NN becomes a tiny
masked distance matrix; PCL's computePointNormal (smallest eigenvector of the
3x3 scatter) becomes a closed-form cross-product normal over the centered
correspondences (exact for <=4 points in general position; both reduce to the
best-fit plane).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from slam_tpu.config import HeightConfig
from slam_tpu.geometry import rot2
from slam_tpu.types import PointCloud


def _plane_normal(pts: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Unit normal of the best-fit plane through weighted points (4, 3):
    smallest eigenvector of the weighted scatter matrix, computed via eigh
    (PCL NormalEstimation::computePointNormal equivalent).

    Degeneracy guard (beyond the reference's isnan check, icpTools.cpp:376):
    when the matched points are coincident/collinear — common once the ground
    map is voxelized and all wheels match one voxel centroid — the smallest
    eigenvector is arbitrary and can zero out n_z, collapsing the pose onto
    the ground. Fall back to the vertical normal in that case."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu = jnp.sum(w[:, None] * pts, axis=0) / wsum
    d = (pts - mu) * w[:, None]
    S = d.T @ d
    # Closed-form symmetric 3x3 eigen-solve (Cardano roots + row-cross
    # eigenvector). jnp.linalg.eigh on a 3x3 lowers to a serialized LAPACK-
    # style custom call on TPU (~0.25 ms per call at batch 128); the closed
    # form is a handful of VPU ops and fuses into the surrounding step.
    q = (S[0, 0] + S[1, 1] + S[2, 2]) / 3.0
    B = S - q * jnp.eye(3, dtype=S.dtype)
    p2 = jnp.sum(B * B) / 6.0
    # floor keeps p**3 a normal f32 (1e-30): a 1e-30 floor would underflow
    # the cube to 0 and NaN-poison r for degenerate (all-coincident) inputs
    p = jnp.sqrt(jnp.maximum(p2, 1e-20))
    det_b = (B[0, 0] * (B[1, 1] * B[2, 2] - B[1, 2] * B[2, 1])
             - B[0, 1] * (B[1, 0] * B[2, 2] - B[1, 2] * B[2, 0])
             + B[0, 2] * (B[1, 0] * B[2, 1] - B[1, 1] * B[2, 0]))
    r = jnp.clip(det_b / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min
    # eigenvector of lam_min: the largest cross product of rows of S - λI
    # (rows span the orthogonal complement of the eigenspace)
    A = S - lam_min * jnp.eye(3, dtype=S.dtype)
    crosses = jnp.stack([jnp.cross(A[0], A[1]), jnp.cross(A[0], A[2]),
                         jnp.cross(A[1], A[2])])
    norms2 = jnp.sum(crosses * crosses, axis=1)
    c = crosses[jnp.argmax(norms2)]
    n = c / jnp.maximum(jnp.sqrt(jnp.max(norms2)), 1e-12)
    degenerate = (lam_mid < 1e-6) | (jnp.max(norms2) < 1e-24)
    return jnp.where(degenerate, jnp.array([0.0, 0.0, 1.0], n.dtype), n)


def height_interpolate_planes(gx, gy, gz, gvalid, pose_xyyawz: jnp.ndarray,
                              cfg: HeightConfig) -> jnp.ndarray:
    """height_interpolate on ground x/y/z planes (hot-path form; matches the
    cloud version exactly — first-match tie handling included)."""
    x, y, yaw, z0 = pose_xyyawz
    wheels_local = jnp.array([
        [-cfg.x_wheel_dist, -cfg.y_wheel_dist],
        [-cfg.x_wheel_dist, cfg.y_wheel_dist],
        [cfg.x_wheel_dist, -cfg.y_wheel_dist],
        [cfg.x_wheel_dist, cfg.y_wheel_dist],
    ])
    R = rot2(yaw)
    wxy = wheels_local @ R.T + jnp.stack([x, y])
    wz = z0 - cfg.robot_height

    BIG = 1e30
    d2 = (wxy[:, 0:1] - gx[None, :])**2 + (wxy[:, 1:2] - gy[None, :])**2 + \
        (wz - gz[None, :])**2 + jnp.where(gvalid[None, :], 0.0, BIG)  # (4, N)
    dmin = jnp.min(d2, axis=1)
    tie = d2 <= dmin[:, None]
    first = (tie & (jnp.cumsum(tie, axis=1) == 1)).astype(gx.dtype)
    corr = jnp.stack([jnp.sum(first * gx[None, :], axis=1),
                      jnp.sum(first * gy[None, :], axis=1),
                      jnp.sum(first * gz[None, :], axis=1)], axis=-1)  # (4, 3)
    ok = dmin < cfg.max_nn_dist_sq
    w = ok.astype(corr.dtype)
    n_ok = jnp.sum(ok)

    avg = jnp.sum(w[:, None] * corr, axis=0) / jnp.maximum(jnp.sum(w), 1e-9)
    n = _plane_normal(corr, w)
    n = jnp.where(n[2] < 0, -n, n)
    new_z = n[2] * cfg.robot_height + avg[2]
    good = (n_ok >= cfg.min_corr_points) & jnp.all(jnp.isfinite(n))
    return jnp.where(good, new_z, z0)


def height_interpolate_grid(grid, pose_xyyawz: jnp.ndarray,
                            cfg: HeightConfig) -> jnp.ndarray:
    """height_interpolate straight off the rolling ground centroid grid
    (mapping.point_map.PointMapGrid) — no exported cloud needed.

    The cloud path NNs 4 wheel points into a top-k exported point set; every
    match it can accept lies within sqrt(max_nn_dist_sq) of a wheel
    (icpTools.cpp:347), i.e. inside a small window of cells around the robot.
    Slicing that window out of the persistent grid and treating its occupied
    centroids as the ground cloud gives the same correspondences WITHOUT the
    per-macro top-k export (at reference scale: a 20,480-of-147k
    approx_max_k + gathers, ~29 ms/call at batch 16) — and is strictly more
    complete, since capacity-overflow export drops can't lose nearby cells."""
    G = grid.count.shape[0]
    res = float(grid.resolution)
    reach = math.hypot(cfg.x_wheel_dist, cfg.y_wheel_dist)
    half = int(math.ceil((math.sqrt(cfg.max_nn_dist_sq) + reach) / res)) + 1
    W = min(2 * half + 1, G)
    rel = pose_xyyawz[:2] - grid.center
    ci = jnp.floor(rel[0] / res).astype(jnp.int32) + G // 2
    cj = jnp.floor(rel[1] / res).astype(jnp.int32) + G // 2
    i0 = jnp.clip(ci - (W - 1) // 2, 0, G - W)
    j0 = jnp.clip(cj - (W - 1) // 2, 0, G - W)

    def window(a):
        return jax.lax.dynamic_slice(a, (i0, j0), (W, W))

    cnt = window(grid.count)
    occ = (cnt >= 1.0).reshape(-1)
    safe = jnp.maximum(cnt, 1.0)
    ii = (i0 + jnp.arange(W)).astype(grid.center.dtype)
    jj = (j0 + jnp.arange(W)).astype(grid.center.dtype)
    ctr_x = (ii - G // 2 + 0.5) * res + grid.center[0]
    ctr_y = (jj - G // 2 + 0.5) * res + grid.center[1]
    gx = (ctr_x[:, None] + window(grid.sum_x) / safe).reshape(-1)
    gy = (ctr_y[None, :] + window(grid.sum_y) / safe).reshape(-1)
    gz = (window(grid.sum_z) / safe).reshape(-1)
    return height_interpolate_planes(gx, gy, gz, occ, pose_xyyawz, cfg)


def height_interpolate(ground: PointCloud, pose_xyyawz: jnp.ndarray,
                       cfg: HeightConfig) -> jnp.ndarray:
    """Return the corrected z for a pose given a world-frame ground cloud.

    pose_xyyawz: (4,) x, y, yaw, z. Keeps the old z when fewer than
    min_corr_points wheel points find ground within sqrt(max_nn_dist_sq)
    (icpTools.cpp:357,394-396 'Height could not be determined').

    Thin view over height_interpolate_planes (same NN first-match ties,
    gates, plane fit) — one implementation, two container shapes."""
    return height_interpolate_planes(ground.xyz[:, 0], ground.xyz[:, 1],
                                     ground.xyz[:, 2], ground.valid,
                                     pose_xyyawz, cfg)
