"""Voxel-grid downsampling with fixed output capacity — replaces
pcl::VoxelGrid (icpTools.cpp:620-633, graphSlamTools.cpp:279-286,
mls.cpp:508-518, global_match.cpp:92-94).

PCL's VoxelGrid emits one centroid per occupied voxel with a dynamic output
size. On TPU we need static shapes, so: quantize -> sort by voxel id ->
segment-centroid -> compact into a fixed-capacity masked cloud. Voxels beyond
capacity are dropped (mirrors the reference's ICP_MAX_PTS truncation,
icpTools.cpp:255-259).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from slam_tpu.types import PointCloud


def voxel_downsample(
    cloud: PointCloud,
    leaf: Tuple[float, float, float],
    out_capacity: int,
    grid_cells: int = 1024,
) -> PointCloud:
    """Centroid-per-voxel downsample of a masked cloud (single robot; vmap over
    batch). The voxel index space is bounded to `grid_cells` per axis (so the
    linear id fits int32 without x64); coordinates beyond +-grid_cells*leaf/2
    clamp into border voxels — irrelevant at SLAM ranges (RMAX=100 m,
    groundSegmentation.cpp:36, vs the default +-256 m span at 0.5 m leaf).

    Flags are combined per-voxel by majority (PCL averages all fields when
    downsample_all_data_ is set — for the 0/1 flags used here majority matches
    the rounded average).
    """
    xyz = cloud.xyz
    leaf_arr = jnp.asarray(leaf, xyz.dtype)
    K = grid_cells
    N = xyz.shape[0]
    q = jnp.clip(jnp.floor(xyz / leaf_arr).astype(jnp.int32) + K // 2, 0, K - 1)
    # linear voxel id; invalid points get the max id so they sort to the end
    vid = (q[:, 0] * K + q[:, 1]) * K + q[:, 2]
    vid = jnp.where(cloud.valid, vid, jnp.iinfo(jnp.int32).max)

    order = jnp.argsort(vid)
    vid_s = vid[order]
    xyz_s = xyz[order]
    valid_s = cloud.valid[order]
    flags_s = cloud.flags[order]

    first = jnp.concatenate([jnp.array([True]), vid_s[1:] != vid_s[:-1]])
    first = first & valid_s
    slot = jnp.cumsum(first) - 1                      # dense voxel rank
    # rank sequence for searchsorted: valid points keep their (monotone)
    # rank, invalid tail gets N (> any rank, > any queried slot) so the
    # array stays sorted even when distinct voxels overflow out_capacity
    slot = jnp.where(valid_s, slot, N)

    # segment reduction WITHOUT scatter (TPU scatters cost ~35 ns/element;
    # this 7-channel scatter dominated regenerate_map at batch 256): prefix
    # sums along the sorted order, then per-output-slot segment bounds via
    # two binary searches and pure gathers.
    # prefix-sum RESIDUALS from each point's voxel center, not absolute
    # coordinates: the segment sum is a difference of two prefixes, and a
    # prefix of absolute coords grows to ~1e5-1e6 (f32 eps there is mm-scale);
    # residuals are bounded by the leaf, so the difference stays exact to
    # ~1e-4 regardless of cloud size / position
    q_s = q[order]
    vox_center = (q_s - K // 2).astype(xyz.dtype) * leaf_arr + leaf_arr * 0.5
    w = valid_s.astype(xyz.dtype)
    fbits = jnp.stack([(flags_s >> b) & 1 for b in range(3)], axis=-1)
    csum_xyz = jnp.cumsum((xyz_s - vox_center) * w[:, None], axis=0)
    csum_cnt = jnp.cumsum(w)
    csum_fb = jnp.cumsum(fbits * valid_s[:, None].astype(jnp.int32), axis=0)

    ks = jnp.arange(out_capacity)
    lo = jnp.searchsorted(slot, ks, side="left")      # first point of voxel k
    hi = jnp.searchsorted(slot, ks, side="right")     # one past the last
    present = hi > lo
    hi1 = jnp.clip(hi - 1, 0, N - 1)

    def seg(csum):
        tail = csum[hi1]
        head = jnp.where((lo > 0)[..., None] if csum.ndim > 1 else lo > 0,
                         csum[jnp.clip(lo - 1, 0, N - 1)], 0)
        return tail - head

    sums = seg(csum_xyz)
    cnt = jnp.where(present, seg(csum_cnt), 0.0)
    fsums = jnp.where(present[:, None], seg(csum_fb), 0)

    out_valid = cnt > 0
    centroid = vox_center[hi1] + sums / jnp.maximum(cnt, 1.0)[:, None]
    # >= : exact half-ties KEEP the bit, matching PCL's rounded average
    # (round(0.5) = 1) the docstring promises
    maj = (fsums * 2 >= cnt[:, None].astype(jnp.int32))
    maj = maj & (cnt[:, None] > 0)
    out_flags = (maj[:, 0] * 1 + maj[:, 1] * 2 + maj[:, 2] * 4).astype(jnp.int32)

    return PointCloud(
        xyz=jnp.where(out_valid[:, None], centroid, 0.0),
        valid=out_valid,
        flags=jnp.where(out_valid, out_flags, 0),
    )


def voxel_downsample_pairwise(cloud: PointCloud,
                              leaf: Tuple[float, float, float]) -> PointCloud:
    """Voxel centroids via a same-cell pairwise incidence matmul — exact
    semantics of voxel_downsample but sort-free (argsort of a 2k-point cloud
    costs ~10x the matmul on TPU). Output stays in the input's slots: the
    first point of each voxel keeps its slot and carries the cell centroid;
    the rest are masked invalid. Flags: bitwise OR over the voxel's points
    (within one scan the reference's 0/1 flags agree across a voxel).

    Thin view over voxel_downsample_pairwise_planes — one incidence
    implementation, two container shapes."""
    fbits = tuple(((cloud.flags >> b) & 1).astype(cloud.xyz.dtype)
                  for b in range(3))
    (cx, cy, cz), keep, bits = voxel_downsample_pairwise_planes(
        cloud.xyz[:, 0], cloud.xyz[:, 1], cloud.xyz[:, 2], cloud.valid,
        fbits, leaf)
    flags = (bits[0] * 1 + bits[1] * 2 + bits[2] * 4).astype(jnp.int32)
    xyz = jnp.stack([cx, cy, cz], axis=-1)
    return PointCloud(xyz=jnp.where(keep[:, None], xyz, 0.0),
                      valid=keep, flags=jnp.where(keep, flags, 0))


def crop_box(cloud: PointCloud, center_xy: jnp.ndarray, half_extent: float
             ) -> PointCloud:
    """Axis-aligned crop around a pose — the +-75 m PassThrough pair of
    CCICP::doICPMatch (icpTools.cpp:226-239). Points outside are masked,
    not removed (static shapes)."""
    d = jnp.abs(cloud.xyz[..., :2] - center_xy)
    keep = cloud.valid & jnp.all(d <= half_extent, axis=-1)
    return cloud.replace(valid=keep)


def compact_planes(planes: tuple, valid: jnp.ndarray, out_capacity: int):
    """Pack valid entries to the front of a smaller buffer via a one-hot
    matmul: (N,) value planes -> ((cap,) planes, out_valid). Order-preserving;
    overflow drops the tail (the reference's ICP_MAX_PTS truncation,
    icpTools.cpp:255-259). TPU scatters cost ~35 ns/element; the MXU does
    this permutation in one pass, exactly (each output selects one input and
    the contraction runs at HIGHEST precision).

    Same order-preserving one-hot permutation, but each channel is its own
    (cap, N) @ (N,) contraction — the stacked form's (N, 5) value matrix
    lane-pads its minor dim to 128 on TPU (see geometry.se2_apply_xy).
    Boolean planes should be passed as f32 0/1 and compared at the caller."""
    import jax

    N = valid.shape[0]
    idx = jnp.cumsum(valid) - 1
    slot = jnp.where(valid, idx, out_capacity)
    onehot = (slot[None, :] == jnp.arange(out_capacity)[:, None]).astype(
        jnp.float32)                                       # (cap, N)
    hi = jax.lax.Precision.HIGHEST
    outs = tuple(jnp.einsum("cn,n->c", onehot, p.astype(jnp.float32),
                            precision=hi) for p in planes)
    out_valid = jnp.einsum("cn,n->c", onehot,
                           valid.astype(jnp.float32), precision=hi) > 0.5
    return outs, out_valid


def voxel_downsample_pairwise_planes(px, py, pz, valid, bit_planes: tuple,
                                     leaf: Tuple[float, float, float]):
    """Planar voxel_downsample_pairwise: centroid planes via the same-cell
    incidence matmul. bit_planes: (N,) 0/1 f32 planes OR-combined per voxel.
    Returns ((cx, cy, cz), keep, (bit planes as bool))."""
    import jax

    N = px.shape[0]
    lx, ly, lz = (float(leaf[0]), float(leaf[1]), float(leaf[2]))
    qx = jnp.floor(px / lx).astype(jnp.int32)
    qy = jnp.floor(py / ly).astype(jnp.int32)
    qz = jnp.floor(pz / lz).astype(jnp.int32)
    same = (qx[:, None] == qx[None, :]) & (qy[:, None] == qy[None, :]) & \
        (qz[:, None] == qz[None, :]) & valid[:, None] & valid[None, :]
    Mf = same.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(Mf, axis=1), 1.0)
    n_idx = jnp.arange(N, dtype=jnp.int32)
    first_m = jnp.min(jnp.where(same, n_idx[None, :], N), axis=1)
    keep = valid & (first_m == n_idx)

    prec = jax.lax.Precision.DEFAULT  # cell-relative offsets: bf16-safe

    def centroid(p, q, leaf_a):
        cc = (q.astype(p.dtype) + 0.5) * leaf_a
        rel = jnp.where(valid, p - cc, 0.0)
        return cc + jnp.einsum("nm,m->n", Mf, rel, precision=prec) / count

    cx = centroid(px, qx, lx)
    cy = centroid(py, qy, ly)
    cz = centroid(pz, qz, lz)
    bits = tuple(
        jnp.einsum("nm,m->n", Mf, b, precision=prec) > 0.5
        for b in bit_planes)
    return (cx, cy, cz), keep, bits


def compact(cloud: PointCloud, out_capacity: int) -> PointCloud:
    """Pack valid points to the front of a (possibly smaller) buffer.

    Needed when many masked ops have sparsified a cloud and a tighter capacity
    saves downstream compute. Order-preserving; overflow drops the tail
    (icpTools.cpp:255-259 truncation semantics)."""
    idx = jnp.cumsum(cloud.valid) - 1
    slot = jnp.where(cloud.valid, idx, out_capacity)
    slot = jnp.minimum(slot, out_capacity)
    xyz = jnp.zeros((out_capacity + 1, 3), cloud.xyz.dtype).at[slot].set(cloud.xyz)
    flags = jnp.zeros((out_capacity + 1,), jnp.int32).at[slot].set(cloud.flags)
    valid = jnp.zeros((out_capacity + 1,), bool).at[slot].set(cloud.valid)
    return PointCloud(xyz=xyz[:out_capacity], valid=valid[:out_capacity],
                      flags=flags[:out_capacity])
