"""Persistent rolling point-map grid — the sort-free scan-to-map target store.

Replaces the concat + argsort voxel merge of the original map maintenance
(and PCL's VoxelGrid in the reference's map path) with a world-aligned
rolling grid of per-cell centroid accumulators:

  - update: one scatter-add of the registered scene (count, sum_x, sum_y, sum_z)
  - rolling origin: jnp.roll + band clear (mls.h:87-96 semantics)
  - export: occupied cells -> centroid points via cumsum-rank compaction
    (O(G^2), no sort), with ground-adjacency flags computed directly on the
    occupancy stencil (icpTools.cpp:63-102 classifyPoints, for free)

Cell centroids match the reference's map targets semantically: its
scan-to-map model points are themselves voxel/cluster means (MLS cluster
means, mls.cpp:520-555; 0.5 m voxel leaves, icpTools.cpp:623).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from slam_tpu.types import PointCloud


@struct.dataclass
class PointMapGrid:
    count: jnp.ndarray   # (G, G)
    sum_x: jnp.ndarray   # (G, G) world x sums
    sum_y: jnp.ndarray
    sum_z: jnp.ndarray
    center: jnp.ndarray  # (2,) world xy of grid center


def init_point_map(grid_size: int, dtype=jnp.float32) -> PointMapGrid:
    z = jnp.zeros((grid_size, grid_size), dtype)
    return PointMapGrid(count=z, sum_x=z, sum_y=z, sum_z=z,
                        center=jnp.zeros(2, dtype))


def shift_point_map(grid: PointMapGrid, new_center_xy: jnp.ndarray,
                    resolution: float) -> PointMapGrid:
    res = jnp.asarray(resolution, grid.center.dtype)
    d = jnp.round((new_center_xy - grid.center) / res).astype(jnp.int32)
    center = grid.center + d.astype(grid.center.dtype) * res
    G = grid.count.shape[0]
    ii = jnp.arange(G)[:, None]
    jj = jnp.arange(G)[None, :]
    fresh = ((ii + d[0] < 0) | (ii + d[0] >= G) |
             (jj + d[1] < 0) | (jj + d[1] >= G))

    def move(a):
        return jnp.where(fresh, 0.0, jnp.roll(a, shift=(-d[0], -d[1]),
                                              axis=(0, 1)))

    return PointMapGrid(count=move(grid.count), sum_x=move(grid.sum_x),
                        sum_y=move(grid.sum_y), sum_z=move(grid.sum_z),
                        center=center)


def update_point_map(grid: PointMapGrid, xyz_world: jnp.ndarray,
                     valid: jnp.ndarray, resolution: float) -> PointMapGrid:
    G = grid.count.shape[0]
    rel = xyz_world[:, :2] - grid.center
    cx = jnp.floor(rel[:, 0] / resolution).astype(jnp.int32) + G // 2
    cy = jnp.floor(rel[:, 1] / resolution).astype(jnp.int32) + G // 2
    inb = valid & (cx >= 0) & (cy >= 0) & (cx < G) & (cy < G)
    flat = jnp.where(inb, cx * G + cy, G * G)
    w = inb.astype(xyz_world.dtype)

    def scat(acc, v):
        return acc + jnp.zeros((G * G + 1,), acc.dtype).at[flat].add(
            w * v)[: G * G].reshape(G, G)

    return grid.replace(
        count=scat(grid.count, 1.0),
        sum_x=scat(grid.sum_x, xyz_world[:, 0]),
        sum_y=scat(grid.sum_y, xyz_world[:, 1]),
        sum_z=scat(grid.sum_z, xyz_world[:, 2]),
    )


def export_points(grid: PointMapGrid, capacity: int, min_count: float = 1.0,
                  ga_threshold: int = 2) -> PointCloud:
    """Occupied-cell centroids as a masked cloud with GA flags.

    GA per cell = >= ga_threshold empty 8-neighbors (interior cells only),
    the classifyPoints rule (icpTools.cpp:63-102) evaluated on this grid.
    Compaction is top-k by observation count (a 37k-element scatter-based
    compaction costs ~1 ms/robot on TPU; top_k + gathers are ~1000x faster)
    — overflow keeps the most-observed cells.
    """
    G = grid.count.shape[0]
    occ = grid.count >= min_count
    empty = (~occ).astype(jnp.int32)
    p = jnp.pad(empty, 1, constant_values=1)
    box = (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
           + p[1:-1, :-2] + p[1:-1, 2:]
           + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:])
    ii = jnp.arange(G)
    interior = ((ii > 0) & (ii < G - 1))[:, None] & \
        ((ii > 0) & (ii < G - 1))[None, :]
    ga = occ & interior & (box >= ga_threshold)

    score = jnp.where(occ, grid.count, 0.0).reshape(-1)
    v, idx = jax.lax.top_k(score, capacity)
    sel = v >= min_count
    cnt = jnp.maximum(grid.count.reshape(-1)[idx], 1.0)
    xyz = jnp.stack([grid.sum_x.reshape(-1)[idx] / cnt,
                     grid.sum_y.reshape(-1)[idx] / cnt,
                     grid.sum_z.reshape(-1)[idx] / cnt], axis=-1)
    flags = jnp.where(ga.reshape(-1)[idx], PointCloud.FLAG_GA, 0)
    return PointCloud(xyz=jnp.where(sel[:, None], xyz, 0.0), valid=sel,
                      flags=jnp.where(sel, flags, 0).astype(jnp.int32))
