"""Rolling occupancy / drivability grid — TPU-native rebuild of the MLS
occupancy path (mls/src/mls.cpp:59-150 addToOccupancy, mls.h:53-100 Grid,
mls.cpp:408-479 setPose/shiftOrigin).

The reference's toroidal rolling Grid (wrap-indexing in Grid::operator(),
mls.h:76-85) becomes a world-aligned dense array shifted with jnp.roll; the
cells that roll in are cleared, matching mls.cpp:457-476. Per-point pushes
become masked scatter-adds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam_tpu.config import MlsConfig
from slam_tpu.types import OccupancyGrid, PointCloud


def init_occupancy(cfg: MlsConfig, dtype=jnp.float32) -> OccupancyGrid:
    return OccupancyGrid(
        counts=jnp.zeros((cfg.size_x, cfg.size_y), dtype),
        drivable=-jnp.ones((cfg.size_x, cfg.size_y), jnp.int8),
        origin=jnp.zeros(2, jnp.int32),
        center=jnp.zeros(2, dtype),
    )


def shift_origin(grid: OccupancyGrid, new_center_xy: jnp.ndarray,
                 cfg: MlsConfig) -> OccupancyGrid:
    """Re-center the rolling map on the pose (MLS::setPose, mls.cpp:408-479).

    Shifts by whole cells (dx = round(diff/res)) and clears cells that enter
    the window. The grid array stays robot-centered: array index (size/2,
    size/2) is the cell containing `center`.
    """
    from slam_tpu.ops.roll import fresh_mask, roll_2d, shift_step

    d, center = shift_step(grid.center, new_center_xy, cfg.resolution)
    counts = roll_2d(grid.counts, d[0], d[1])
    drivable = roll_2d(grid.drivable, d[0], d[1])
    # clear the band that wrapped in (mls.cpp:457-468)
    fresh = fresh_mask(d, *counts.shape)
    counts = jnp.where(fresh, 0.0, counts)
    drivable = jnp.where(fresh, jnp.int8(-1), drivable)
    return grid.replace(counts=counts, drivable=drivable, center=center)


def _cell_index(xy_local: jnp.ndarray, cfg: MlsConfig):
    """Point (robot-centered world-oriented) -> cell index (mls.cpp:76-78)."""
    x = jnp.floor(xy_local[..., 0] / cfg.resolution).astype(jnp.int32) + cfg.size_x // 2
    y = jnp.floor(xy_local[..., 1] / cfg.resolution).astype(jnp.int32) + cfg.size_y // 2
    inb = (x >= 0) & (y >= 0) & (x < cfg.size_x) & (y < cfg.size_y)
    return x, y, inb


def _apply_counts_drivability(grid: OccupancyGrid, delta, touch,
                              cfg: MlsConfig) -> OccupancyGrid:
    """Shared occupancy tail (mls.cpp:118-142): apply the net count delta,
    then flip drivability only for cells touched this scan — untouched cells
    keep their flag. The reference evaluates per point; the net post-scan
    count decides identically except exact-threshold ties.

    Counts accumulate UNBOUNDED in both directions — deliberately matching
    the reference exactly (mls.cpp:99 += / :135 -= with no clamp). The
    shared trait: a cell observed free for a long time needs proportionally
    many obstacle points to flip (evidence latency grows with history);
    bound it by clamping counts at the call site if a deployment needs
    fast dynamic-obstacle response."""
    counts = grid.counts + delta
    touched = touch > 0
    occupied = touched & (counts > cfg.min_cluster_points)
    free = touched & (counts < cfg.min_cluster_points)
    drivable = jnp.where(occupied, jnp.int8(0),
                         jnp.where(free, jnp.int8(1), grid.drivable))
    return grid.replace(counts=counts, drivable=drivable)


def add_to_occupancy(grid: OccupancyGrid, obstacle: PointCloud,
                     ground: PointCloud, cfg: MlsConfig) -> OccupancyGrid:
    """Occupancy update (mls.cpp:59-150): +increment per non-drivable obstacle
    point, -decrement per ground point, clamped drivability flags.

    Clouds are robot-centered / world-oriented (local_mapper path, mls.cpp:38-49).
    """
    from slam_tpu.ops.scatter2d import scatter_add_2d

    H, W = grid.counts.shape

    # one fused scatter for both clouds (each one-hot matmul pass costs the
    # same regardless of channel count)
    xy = jnp.concatenate([obstacle.xyz[..., :2], ground.xyz[..., :2]], 0)
    x, y, inb = _cell_index(xy, cfg)
    rng = jnp.linalg.norm(xy, axis=-1)
    keep = jnp.concatenate([obstacle.valid, ground.valid], 0) & inb & \
        (rng <= cfg.max_range)
    sign = jnp.concatenate([
        jnp.full(obstacle.valid.shape, cfg.occupancy_increment),
        jnp.full(ground.valid.shape, -cfg.occupancy_decrement)], 0)
    vals = jnp.stack([sign, jnp.ones_like(sign)], -1)
    acc = scatter_add_2d(x, y, vals, keep, (H, W))
    return _apply_counts_drivability(grid, acc[..., 0], acc[..., 1], cfg)


def add_to_occupancy_xy(grid: OccupancyGrid, lx: jnp.ndarray, ly: jnp.ndarray,
                        valid: jnp.ndarray, cfg: MlsConfig) -> OccupancyGrid:
    """Planar obstacle-only occupancy update — the 2D fused path (its ground
    cloud is empty, so the ground decrement never fires; see add_to_occupancy
    for the full obstacle+ground form). lx/ly are robot-centered
    world-oriented planes (N,)."""
    from slam_tpu.ops.scatter2d import scatter_add_2d_multi

    H, W = grid.counts.shape
    x = jnp.floor(lx / cfg.resolution).astype(jnp.int32) + cfg.size_x // 2
    y = jnp.floor(ly / cfg.resolution).astype(jnp.int32) + cfg.size_y // 2
    keep = valid & (lx * lx + ly * ly <= cfg.max_range * cfg.max_range)
    (touch,) = scatter_add_2d_multi(x, y, (None,), keep, (H, W))
    return _apply_counts_drivability(
        grid, touch * cfg.occupancy_increment, touch, cfg)


def add_to_occupancy_xy2(grid: OccupancyGrid, ox, oy, ovalid, gx, gy, gvalid,
                         cfg: MlsConfig) -> OccupancyGrid:
    """Planar obstacle+ground occupancy update (mls.cpp:59-150): +increment
    per obstacle point, -decrement per ground point. Planes are robot-
    centered world-oriented; rank-1 concatenation is cheap (unlike the
    stacked form's (N, 2) value matrix)."""
    from slam_tpu.ops.scatter2d import scatter_add_2d_multi

    H, W = grid.counts.shape
    lx = jnp.concatenate([ox, gx])
    ly = jnp.concatenate([oy, gy])
    sign = jnp.concatenate([
        jnp.full(ox.shape, cfg.occupancy_increment, grid.counts.dtype),
        jnp.full(gx.shape, -cfg.occupancy_decrement, grid.counts.dtype)])
    x = jnp.floor(lx / cfg.resolution).astype(jnp.int32) + cfg.size_x // 2
    y = jnp.floor(ly / cfg.resolution).astype(jnp.int32) + cfg.size_y // 2
    keep = jnp.concatenate([ovalid, gvalid]) & \
        (lx * lx + ly * ly <= cfg.max_range * cfg.max_range)
    delta, touch = scatter_add_2d_multi(x, y, (sign, None), keep, (H, W))
    return _apply_counts_drivability(grid, delta, touch, cfg)


def occupancy_cloud(grid: OccupancyGrid, cfg: MlsConfig,
                    capacity: int) -> PointCloud:
    """Export occupied-cell centers as an obstacle cloud in world frame — the
    map-target export analogue of MLS::getSegmentedClouds (mls.cpp:520-555).

    Takes the `capacity` highest-count cells (occupied ones rank first)."""
    H, W = grid.counts.shape
    occ = (grid.drivable == 0)
    score = jnp.where(occ, grid.counts, -1.0).reshape(-1)
    top, idx = jax.lax.top_k(score, capacity)
    sel = top > 0
    ix = idx // W
    iy = idx % W
    x = (ix - H // 2 + 0.5) * cfg.resolution + grid.center[0]
    y = (iy - W // 2 + 0.5) * cfg.resolution + grid.center[1]
    xyz = jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)
    return PointCloud(xyz=jnp.where(sel[:, None], xyz, 0.0), valid=sel,
                      flags=jnp.zeros(capacity, jnp.int32))
