"""Ground-adjacency classification — TPU-native rebuild of
CCICP::classifyPoints (ccicp2d/src/icpTools.cpp:36-103) and the rectangular
re-bin of pointcloud_filter.cpp:244-281.

The reference bins obstacle points into a 0.5 m grid and marks a point
ground-adjacent (GA) when its bin has >= GRD_ADJ_THRESH empty 8-neighbors
(icpTools.h:24-26). Per-bin neighbor counting becomes one scatter + one 3x3
stencil; the per-point flag is a gather.
"""

from __future__ import annotations

import jax.numpy as jnp

from slam_tpu.types import PointCloud


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
    Edge bins keep their previous flag (the reference `continue`s and drops
    edge-bin points, icpTools.cpp:72-77; masking out would lose points, so we
    classify them NGA — only affects points >=half-extent away).
    """
    from slam_tpu.ops.scatter2d import scatter_add_2d

    B = num_bins
    rel = cloud.xyz[..., :2] - center_xy
    bx = jnp.floor(rel[..., 0] / resolution).astype(jnp.int32) + B // 2
    by = jnp.floor(rel[..., 1] / resolution).astype(jnp.int32) + B // 2
    inb = (bx >= 0) & (by >= 0) & (bx < B) & (by < B) & cloud.valid

    flat = jnp.where(inb, bx * B + by, B * B)
    counts = scatter_add_2d(bx, by, jnp.ones(bx.shape + (1,)), inb,
                            (B, B))[..., 0].astype(jnp.int32)

    from slam_tpu.ops.stencil import neighbor_sum_2d
    empty = (counts == 0).astype(jnp.float32)
    box = neighbor_sum_2d(empty)  # 8-neighbor empty count
    # interior test (icpTools.cpp:72): edge bins are not classified GA
    ii = jnp.arange(B)
    interior = ((ii > 0) & (ii < B - 1))[:, None] & ((ii > 0) & (ii < B - 1))[None, :]
    ga_bin = (box >= threshold) & interior & (counts > 0)

    ga_pt = jnp.where(inb, ga_bin.reshape(-1)[jnp.minimum(flat, B * B - 1)], False)
    flags = jnp.where(ga_pt, cloud.flags | PointCloud.FLAG_GA,
                      cloud.flags & ~PointCloud.FLAG_GA)
    return cloud.replace(flags=flags)
