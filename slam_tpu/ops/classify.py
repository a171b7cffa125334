"""Ground-adjacency classification — TPU-native rebuild of
CCICP::classifyPoints (ccicp2d/src/icpTools.cpp:36-103) and the rectangular
re-bin of pointcloud_filter.cpp:244-281.

The reference bins obstacle points into a 0.5 m grid and marks a point
ground-adjacent (GA) when its bin has >= GRD_ADJ_THRESH empty 8-neighbors
(icpTools.h:24-26). Per-bin neighbor counting becomes one scatter + one 3x3
stencil; the per-point flag is a gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam_tpu.types import PointCloud


def classify_ga_planes(px, py, valid, center_xy, num_bins: int,
                       resolution: float, threshold: int = 2,
                       with_extent: bool = False):
    """Planar classify_ground_adjacent: x/y planes -> GA plane (N,) bool.

    Count raster + 3x3 stencil + one matmul-gather (the stacked version's
    per-point `ga_bin.reshape(-1)[flat]` gather serializes on TPU).

    with_extent=True also returns the in-grid-extent mask so callers can
    preserve capture-time flags for points the grid never classified (the
    reference `continue`s them, icpTools.cpp:72-77)."""
    from slam_tpu.ops.scatter2d import gather_cells_2d, scatter_add_2d_multi
    from slam_tpu.ops.stencil import neighbor_sum_2d

    B = num_bins
    bx = jnp.floor((px - center_xy[0]) / resolution).astype(jnp.int32) + B // 2
    by = jnp.floor((py - center_xy[1]) / resolution).astype(jnp.int32) + B // 2
    inb = (bx >= 0) & (by >= 0) & (bx < B) & (by < B) & valid
    (counts,) = scatter_add_2d_multi(bx, by, (None,), inb, (B, B))
    empty = (counts == 0).astype(jnp.float32)
    # 0/1 indicator raster: DEFAULT bf16 is exact (f32 accumulation)
    box = neighbor_sum_2d(empty, precision=jax.lax.Precision.DEFAULT)
    ii = jnp.arange(B)
    interior = ((ii > 0) & (ii < B - 1))[:, None] & \
        ((ii > 0) & (ii < B - 1))[None, :]
    ga_bin = (box >= threshold) & interior & (counts > 0)
    ga_pt = gather_cells_2d(ga_bin.astype(jnp.float32)[..., None],
                            jnp.clip(bx, 0, B - 1),
                            jnp.clip(by, 0, B - 1))[:, 0] > 0.5
    ga = ga_pt & inb
    return (ga, inb) if with_extent else ga


def classify_ground_adjacent(
    cloud: PointCloud,
    center_xy: jnp.ndarray,
    num_bins: int,
    resolution: float,
    threshold: int = 2,
) -> PointCloud:
    """Set/clear FLAG_GA per point.

    The reference grid is centered on the world origin with extent
    NUMBINSGA*RESOLUTION (=600 m, icpTools.h:24-25); we center on `center_xy`
    (robot/pose) so a small grid covers the cropped +-75 m working set.
    Points beyond the grid extent KEEP their previous flag — the reference
    `continue`s them without touching the capture-time classification
    (icpTools.cpp:72-77); only affects points >= half-extent away.
    """
    ga_pt, inb = classify_ga_planes(cloud.xyz[..., 0], cloud.xyz[..., 1],
                                    cloud.valid, center_xy, num_bins,
                                    resolution, threshold, with_extent=True)
    new_flags = jnp.where(ga_pt, cloud.flags | PointCloud.FLAG_GA,
                          cloud.flags & ~PointCloud.FLAG_GA)
    flags = jnp.where(inb, new_flags, cloud.flags)
    return cloud.replace(flags=flags)
