"""Reference-scale scene build: scatter-to-grid voxelization + raster export.

The small-scan scene builders voxelize via a same-cell (N, N) incidence
matmul (slam2d.build_scene_planes, ops/voxel.voxel_downsample_pairwise_planes)
— exact and fast at sim scale, O(N^2) = 4x10^8 at the reference's working
point of >=20k-point scans (scan_registration.cpp:122,
pointcloud_filter.cpp:290). This module is the O(N) replacement: one native
scatter pass into a scan-local centroid grid, the ground-adjacency stencil on
the occupancy raster (classifyPoints rule, icpTools.cpp:63-102), and a top-K
export to the fixed scene capacity — the same grid/export machinery the
persistent point map already uses (mapping/point_map.py), applied to a single
scan in the robot frame.

Semantics vs the pairwise builder: identical voxel centroids and GA flags
(same resolution, same stencil); output points sit in export order (most
observed first) rather than scan-slot order, and overflow keeps the
most-populated voxels rather than the earliest scan slots — both are
reorderings of the same point set, and every consumer is order-agnostic
(masked reductions, scatters, ICP).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_scene_grid_planes(px, py, pz, valid, drv, capacity: int,
                            resolution: float, grid_bins: int,
                            ga_threshold: int, min_count: float = 1.0,
                            recall: float = 0.8):
    """Voxelize a robot-frame scan into scene planes via a scan-local grid.

    px/py: (N,) robot-frame coordinates; pz: (N,) or None (2D path);
    drv: (N,) drivable-over flag plane (f32 0/1) or None.
    Returns (sx, sy, sz, ga, drv_out, keep) planes of length `capacity`
    (sz/drv_out are None when the corresponding input was None).

    Grid: grid_bins^2 cells of `resolution` centered on the robot; scan
    points beyond the grid half-extent are dropped (the reference's polar
    grid similarly caps at RMAX, groundSegmentation.cpp:36).

    recall: approx_max_k recall for the capacity-overflow top-K (same
    contract as CloudConfig.export_recall / export_point_planes — >= 1
    switches to the exact top_k).
    """
    from slam_tpu.ops.scatter2d import scatter_add_2d_multi
    from slam_tpu.ops.stencil import neighbor_sum_2d

    G = grid_bins
    ci = jnp.floor(px / resolution).astype(jnp.int32) + G // 2
    cj = jnp.floor(py / resolution).astype(jnp.int32) + G // 2
    inb = valid & (ci >= 0) & (cj >= 0) & (ci < G) & (cj < G)
    cci = jnp.clip(ci, 0, G - 1)
    ccj = jnp.clip(cj, 0, G - 1)
    # cell-relative offsets: bounded +-resolution/2 (bf16-safe, and exact in
    # the native f32 scatter)
    ox = px - (cci.astype(px.dtype) - G // 2 + 0.5) * resolution
    oy = py - (ccj.astype(py.dtype) - G // 2 + 0.5) * resolution
    chans = [None, ox, oy]
    precs = [None, None, None]
    if pz is not None:
        chans.append(pz)
        precs.append(jax.lax.Precision.HIGH)   # absolute z, not bf16-safe
    if drv is not None:
        chans.append(drv)
        precs.append(None)
    accs = scatter_add_2d_multi(cci, ccj, tuple(chans), inb, (G, G),
                                precisions=tuple(precs))
    count = accs[0]
    sum_x, sum_y = accs[1], accs[2]
    k = 3
    sum_z = None
    if pz is not None:
        sum_z = accs[k]
        k += 1
    sum_drv = accs[k] if drv is not None else None

    # GA classification on the occupancy raster (classifyPoints,
    # icpTools.cpp:63-102: interior occupied cell with >= ga_threshold empty
    # 8-neighbors)
    occ = count >= min_count
    box = neighbor_sum_2d((~occ).astype(jnp.float32),
                          precision=jax.lax.Precision.DEFAULT)
    ii = jnp.arange(G)
    interior = ((ii > 0) & (ii < G - 1))[:, None] & \
        ((ii > 0) & (ii < G - 1))[None, :]
    ga = occ & interior & (box >= ga_threshold)

    # top-K occupied cells by observation count (approx_max_k: see
    # export_point_planes for the recall trade)
    score = jnp.where(occ, count, 0.0).reshape(-1)
    if recall >= 1.0:
        v, idx = jax.lax.top_k(score, capacity)
    else:
        v, idx = jax.lax.approx_max_k(score, capacity, recall_target=recall)
    sel = v >= min_count
    si = idx // G
    sj = idx % G
    from slam_tpu.ops.scatter2d import gather_cells_2d
    chan_list = [count, sum_x, sum_y, ga.astype(jnp.float32)]
    if sum_z is not None:
        chan_list.append(sum_z)
    if sum_drv is not None:
        chan_list.append(sum_drv)
    # HIGH: the gathered grid values include absolute-z sums and counts that
    # exceed bf16's exact-integer range — the one-hot side stays exact 0/1
    out = gather_cells_2d(jnp.stack(chan_list, axis=-1), si, sj,
                          precision=jax.lax.Precision.HIGH)
    cnt = jnp.maximum(out[:, 0], 1.0)
    ctr_x = (si - G // 2 + 0.5) * resolution
    ctr_y = (sj - G // 2 + 0.5) * resolution
    sx = jnp.where(sel, ctr_x + out[:, 1] / cnt, 0.0)
    sy = jnp.where(sel, ctr_y + out[:, 2] / cnt, 0.0)
    ga_pt = sel & (out[:, 3] > 0.5)
    k = 4
    sz = None
    if sum_z is not None:
        sz = jnp.where(sel, out[:, k] / cnt, 0.0)
        k += 1
    drv_out = None
    if sum_drv is not None:
        # OR semantics over the voxel's points (voxel_downsample_pairwise)
        drv_out = sel & (out[:, k] > 0.5)
    return sx, sy, sz, ga_pt, drv_out, sel
