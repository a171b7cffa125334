"""voxel_downsample against a sequential NumPy oracle.

The op is the TPU counterpart of PCL VoxelGrid as used by the reference
(icpTools.cpp:620-633, graphSlamTools.cpp:279-286): centroid per occupied
voxel, flags by rounded-average majority. The implementation is sort +
prefix-sum + binary-search gathers (scatter-free); these tests pin the
semantics the pipeline relies on: centroid exactness, first-seen voxel
ordering, capacity-overflow truncation, invalid handling, flag ties.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.ops.voxel import voxel_downsample
from slam_tpu.types import PointCloud


def oracle(xyz, valid, flags, leaf, capacity, K=1024):
    """Sequential transcription of the voxel-centroid semantics."""
    vox = {}
    order = []
    for p in range(xyz.shape[0]):
        if not valid[p]:
            continue
        q = tuple(int(np.clip(np.floor(xyz[p, a] / leaf[a]) + K // 2,
                              0, K - 1)) for a in range(3))
        if q not in vox:
            vox[q] = []
            order.append(q)
    # output order is sorted linear voxel id (the sort the op performs)
    order = sorted(order, key=lambda q: (q[0] * K + q[1]) * K + q[2])
    for p in range(xyz.shape[0]):
        if not valid[p]:
            continue
        q = tuple(int(np.clip(np.floor(xyz[p, a] / leaf[a]) + K // 2,
                              0, K - 1)) for a in range(3))
        vox[q].append(p)
    out_xyz = np.zeros((capacity, 3))
    out_valid = np.zeros(capacity, bool)
    out_flags = np.zeros(capacity, np.int32)
    for k, q in enumerate(order[:capacity]):
        pts = vox[q]
        out_xyz[k] = xyz[pts].mean(axis=0)
        out_valid[k] = True
        f = 0
        for b in range(3):
            bits = [(int(flags[p]) >> b) & 1 for p in pts]
            if 2 * sum(bits) >= len(bits):   # rounded average: .5 keeps bit
                f |= 1 << b
        out_flags[k] = f
    return out_xyz, out_valid, out_flags


@pytest.mark.parametrize("seed,n,cap", [(0, 200, 64), (1, 500, 32),
                                        (2, 100, 256)])
def test_matches_sequential_oracle(seed, n, cap):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    valid = rng.random(n) > 0.2
    flags = rng.integers(0, 8, n).astype(np.int32)
    leaf = (0.5, 0.5, 2.0)
    got = voxel_downsample(PointCloud(xyz=jnp.array(xyz),
                                      valid=jnp.array(valid),
                                      flags=jnp.array(flags)), leaf, cap)
    exp_xyz, exp_valid, exp_flags = oracle(xyz, valid, flags, leaf, cap)
    np.testing.assert_array_equal(np.asarray(got.valid), exp_valid)
    np.testing.assert_allclose(np.asarray(got.xyz)[exp_valid],
                               exp_xyz[exp_valid], atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got.flags)[exp_valid],
                                  exp_flags[exp_valid])


def test_capacity_overflow_truncates_without_corruption():
    """More distinct voxels than capacity: the lowest-id voxels fill the
    output exactly; overflow is dropped, never folded into other cells."""
    n, cap = 300, 16
    # all distinct voxels along x
    xyz = np.stack([np.arange(n) * 1.0, np.zeros(n), np.zeros(n)],
                   axis=1).astype(np.float32)
    cloud = PointCloud(xyz=jnp.array(xyz), valid=jnp.ones(n, bool),
                       flags=jnp.zeros(n, jnp.int32))
    got = voxel_downsample(cloud, (0.5, 0.5, 2.0), cap)
    assert bool(got.valid.all())
    np.testing.assert_allclose(np.asarray(got.xyz)[:, 0],
                               np.arange(cap), atol=1e-5)


def test_all_invalid_yields_empty():
    n = 50
    cloud = PointCloud(xyz=jnp.zeros((n, 3)), valid=jnp.zeros(n, bool),
                       flags=jnp.zeros(n, jnp.int32))
    got = voxel_downsample(cloud, (0.5, 0.5, 2.0), 8)
    assert not bool(got.valid.any())
    assert not bool(jnp.isnan(got.xyz).any())


def test_far_from_origin_centroid_precision():
    """The prefix-sum path must not lose precision when the cloud sits far
    from the origin (the residual-from-voxel-center trick): 2000 points in a
    handful of voxels ~200 m out, centroids good to <0.5 mm."""
    rng = np.random.default_rng(3)
    base = np.array([200.0, -180.0, 6.0], np.float32)
    xyz = (base + rng.uniform(-2, 2, (2000, 3))).astype(np.float32)
    cloud = PointCloud(xyz=jnp.array(xyz), valid=jnp.ones(2000, bool),
                       flags=jnp.zeros(2000, jnp.int32))
    got = voxel_downsample(cloud, (0.5, 0.5, 2.0), 256)
    exp_xyz, exp_valid, _ = oracle(xyz, np.ones(2000, bool),
                                   np.zeros(2000, np.int32),
                                   (0.5, 0.5, 2.0), 256)
    np.testing.assert_allclose(np.asarray(got.xyz)[exp_valid],
                               exp_xyz[exp_valid], atol=5e-4)
