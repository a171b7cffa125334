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
    """Per-cell centroid accumulators. sum_x/sum_y hold CELL-RELATIVE offset
    sums (point minus its cell center): bounded to +-resolution/2, they
    survive bf16 scatter matmuls exactly enough (~0.1% of 0.25 m) and are
    invariant under rolling shifts. sum_z is absolute."""

    count: jnp.ndarray   # (G, G)
    sum_x: jnp.ndarray   # (G, G) cell-relative x-offset sums
    sum_y: jnp.ndarray
    sum_z: jnp.ndarray
    center: jnp.ndarray  # (2,) world xy of grid center
    resolution: float = struct.field(pytree_node=False, default=0.5)


def init_point_map(grid_size: int, resolution: float = 0.5,
                   dtype=jnp.float32) -> PointMapGrid:
    z = jnp.zeros((grid_size, grid_size), dtype)
    return PointMapGrid(count=z, sum_x=z, sum_y=z, sum_z=z,
                        center=jnp.zeros(2, dtype), resolution=resolution)


def shift_point_map(grid: PointMapGrid, new_center_xy: jnp.ndarray,
                    resolution: float | None = None) -> PointMapGrid:
    from slam_tpu.ops.roll import fresh_mask, roll_2d, shift_step

    d, center = shift_step(grid.center, new_center_xy,
                           resolution or grid.resolution)
    G = grid.count.shape[0]
    fresh = fresh_mask(d, G, G)

    def move(a):
        return jnp.where(fresh, 0.0, roll_2d(a, d[0], d[1]))

    # sum_x/sum_y are CELL-relative offsets (not center-relative), so the
    # shift needs no coordinate translation — only sum_z/center care
    return PointMapGrid(count=move(grid.count), sum_x=move(grid.sum_x),
                        sum_y=move(grid.sum_y), sum_z=move(grid.sum_z),
                        center=center, resolution=grid.resolution)


def offset_point_map_z(grid: PointMapGrid, dz) -> PointMapGrid:
    """Apply a graph-SLAM z pose-offset to every stored point
    (MLS::offsetMap, mls.cpp:481-505, applied by the local mapper at
    local_mapper.cpp:48-51 when graph_slam publishes the post-optimization
    delta of its newest node, graph_slam.cpp:357-384).

    sum_z accumulates ABSOLUTE per-point z sums, so shifting every stored
    point by dz is exactly sum_z + dz * count — no per-point pass needed.
    Empty cells (count 0) are unchanged by construction."""
    return grid.replace(sum_z=grid.sum_z + dz * grid.count)


def _cell_centers_1d(G: int, resolution: float, offset: jnp.ndarray):
    return (jnp.arange(G) - G // 2 + 0.5) * resolution + offset


def update_point_map(grid: PointMapGrid, xyz_world: jnp.ndarray,
                     valid: jnp.ndarray, resolution: float | None = None,
                     z_precision=None) -> PointMapGrid:
    import jax as _jax
    from slam_tpu.ops.scatter2d import scatter_add_2d

    G = grid.count.shape[0]
    resolution = resolution or grid.resolution
    rel = xyz_world[:, :2] - grid.center
    cx = jnp.floor(rel[:, 0] / resolution).astype(jnp.int32) + G // 2
    cy = jnp.floor(rel[:, 1] / resolution).astype(jnp.int32) + G // 2
    # cell-relative offsets: bf16-safe scatter values (see PointMapGrid)
    ox = rel[:, 0] - (cx.astype(rel.dtype) - G // 2 + 0.5) * resolution
    oy = rel[:, 1] - (cy.astype(rel.dtype) - G // 2 + 0.5) * resolution
    vals = jnp.stack([jnp.ones_like(ox), ox, oy, xyz_world[:, 2]], -1)
    prec = z_precision or _jax.lax.Precision.DEFAULT
    acc = scatter_add_2d(cx, cy, vals, valid, (G, G), precision=prec)
    return grid.replace(
        count=grid.count + acc[..., 0],
        sum_x=grid.sum_x + acc[..., 1],
        sum_y=grid.sum_y + acc[..., 2],
        sum_z=grid.sum_z + acc[..., 3],
    )


def update_point_map_xy(grid: PointMapGrid, qx: jnp.ndarray, qy: jnp.ndarray,
                        qz, valid: jnp.ndarray,
                        resolution: float | None = None,
                        z_precision=None) -> PointMapGrid:
    """Planar update: world x/y planes (N,), optional z plane (None for the
    2D path, whose z is identically 0 — sum_z then passes through untouched,
    saving a full grid read-modify-write per tick). Equivalent to
    update_point_map on stacked xyz; planes avoid the lane-padded (N, small)
    stack layouts (see se2_apply_xy).

    z_precision applies to the sum_z channel ONLY — intentionally, unlike
    update_point_map which raised all channels: ox/oy are cell-relative
    offsets bounded to +-resolution/2 (the PointMapGrid bf16-safety
    contract), so DEFAULT keeps their scatter on the fast matmul path, while
    sum_z accumulates ABSOLUTE world z and needs the HIGH pass."""
    from slam_tpu.ops.scatter2d import scatter_add_2d_multi

    G = grid.count.shape[0]
    resolution = resolution or grid.resolution
    rx = qx - grid.center[0]
    ry = qy - grid.center[1]
    cx = jnp.floor(rx / resolution).astype(jnp.int32) + G // 2
    cy = jnp.floor(ry / resolution).astype(jnp.int32) + G // 2
    ox = rx - (cx.astype(rx.dtype) - G // 2 + 0.5) * resolution
    oy = ry - (cy.astype(ry.dtype) - G // 2 + 0.5) * resolution
    chans = (None, ox, oy) + (() if qz is None else (qz,))
    precs = None if qz is None else (None, None, None, z_precision)
    acc = scatter_add_2d_multi(cx, cy, chans, valid, (G, G),
                               precisions=precs)
    return grid.replace(
        count=grid.count + acc[0],
        sum_x=grid.sum_x + acc[1],
        sum_y=grid.sum_y + acc[2],
        sum_z=grid.sum_z if qz is None else grid.sum_z + acc[3],
    )


def export_point_planes(grid: PointMapGrid, capacity: int,
                        min_count: float = 1.0, ga_threshold: int = 2,
                        recall: float = 0.8):
    """Occupied-cell centroids as (x, y, z, ga, valid) planes — the hot-path
    form (planes avoid the lane-padded (N, 3) stack; see
    geometry.se2_apply_xy). export_points packs these into a PointCloud.

    GA per cell = >= ga_threshold empty 8-neighbors (interior cells only),
    the classifyPoints rule (icpTools.cpp:63-102) evaluated on this grid.
    Compaction is top-k by observation count (a 37k-element scatter-based
    compaction costs ~1 ms/robot on TPU; top_k + gathers are ~1000x faster)
    — overflow keeps the most-observed cells.
    """
    from slam_tpu.ops.stencil import neighbor_sum_2d

    G = grid.count.shape[0]
    occ = grid.count >= min_count
    empty = (~occ).astype(jnp.float32)
    # 0/1 indicator raster: DEFAULT bf16 is exact (f32 accumulation)
    box = neighbor_sum_2d(empty, precision=jax.lax.Precision.DEFAULT)
    ii = jnp.arange(G)
    interior = ((ii > 0) & (ii < G - 1))[:, None] & \
        ((ii > 0) & (ii < G - 1))[None, :]
    ga = occ & interior & (box >= ga_threshold)

    resolution = grid.resolution
    score = jnp.where(occ, grid.count, 0.0).reshape(-1)
    # approx_max_k: TPU-native partial reduction (exact top_k lowers to a
    # full 37k-element sort, ~56 ms at batch 1024; recall 0.95 still sorts
    # an 18k-wide reduced set, ~26 ms). recall 0.8 reduces 8x deeper before
    # the sort (3.9 ms); a dropped cell stays in the persistent grid and
    # reappears at the next export. MEASURED accuracy cost (round 3): the
    # per-export drops randomize the ICP target slightly and random-walk
    # the trajectory ~2 cm ATE vs the sequential f64 oracle over 40 steps
    # (exact export: 0.36 cm) — ground-truth ATE is unchanged. recall >= 1
    # switches to the exact top_k for parity-grade runs
    # (CloudConfig.export_recall).
    if recall >= 1.0:
        v, idx = jax.lax.top_k(score, capacity)
    else:
        v, idx = jax.lax.approx_max_k(score, capacity, recall_target=recall)
    sel = v >= min_count
    ci = idx // G
    cj = idx % G
    # channel gathers as one-hot matmuls (native gathers: ~10 ms/channel/step
    # at batch 1024); values are counts + cell-relative offsets => bf16-safe
    from slam_tpu.ops.scatter2d import gather_cells_2d
    chans = jnp.stack([grid.count, grid.sum_x, grid.sum_y, grid.sum_z,
                       ga.astype(jnp.float32)], axis=-1)
    out = gather_cells_2d(chans, ci, cj)
    cnt = jnp.maximum(out[:, 0], 1.0)
    ctr_x = (ci - G // 2 + 0.5) * resolution + grid.center[0]
    ctr_y = (cj - G // 2 + 0.5) * resolution + grid.center[1]
    x = jnp.where(sel, ctr_x + out[:, 1] / cnt, 0.0)
    y = jnp.where(sel, ctr_y + out[:, 2] / cnt, 0.0)
    z = jnp.where(sel, out[:, 3] / cnt, 0.0)
    ga_pt = sel & (out[:, 4] > 0.5)
    return x, y, z, ga_pt, sel


def export_points(grid: PointMapGrid, capacity: int, min_count: float = 1.0,
                  ga_threshold: int = 2, recall: float = 0.8) -> PointCloud:
    """export_point_planes packed into the PointCloud container."""
    x, y, z, ga_pt, sel = export_point_planes(grid, capacity, min_count,
                                              ga_threshold, recall)
    xyz = jnp.stack([x, y, z], axis=-1)
    flags = jnp.where(ga_pt, PointCloud.FLAG_GA, 0).astype(jnp.int32)
    return PointCloud(xyz=xyz, valid=sel, flags=flags)
