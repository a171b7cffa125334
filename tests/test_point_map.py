"""Point-map grid tests (sort-free scan-to-map target store)."""

import jax.numpy as jnp
import numpy as np

from slam_tpu.mapping.point_map import (export_points, init_point_map,
                                        shift_point_map, update_point_map)
from slam_tpu.types import PointCloud


def test_update_export_centroids():
    g = init_point_map(64)
    pts = jnp.array([[1.2, 0.2, 0.0], [1.3, 0.3, 0.2], [-5.0, 2.0, 0.1]])
    g = update_point_map(g, pts, jnp.ones(3, bool), 0.5)
    cloud = export_points(g, capacity=16)
    assert int(cloud.count()) == 2
    got = np.asarray(cloud.xyz[np.asarray(cloud.valid)])
    got = got[np.argsort(got[:, 0])]
    np.testing.assert_allclose(got[0], [-5.0, 2.0, 0.1], atol=1e-5)
    np.testing.assert_allclose(got[1], [1.25, 0.25, 0.1], atol=1e-5)


def test_ga_flags_from_stencil():
    g = init_point_map(64)
    # a solid 5x5 block: interior cells have no empty neighbors -> NGA;
    # border cells of the block have >=2 empty neighbors -> GA
    pts = [[x * 0.5, y * 0.5, 0.0] for x in range(5) for y in range(5)]
    pts = jnp.array(pts, jnp.float32)
    g = update_point_map(g, pts, jnp.ones(len(pts), bool), 0.5)
    cloud = export_points(g, capacity=64)
    v = np.asarray(cloud.valid)
    xyz = np.asarray(cloud.xyz)[v]
    ga = (np.asarray(cloud.flags)[v] & PointCloud.FLAG_GA) != 0
    assert v.sum() == 25
    center = (np.abs(xyz[:, 0] - 1.25) < 0.3) & (np.abs(xyz[:, 1] - 1.25) < 0.3)
    assert not ga[center].any(), "block interior must be NGA"
    corner = (xyz[:, 0] < 0.3) & (xyz[:, 1] < 0.3)
    assert ga[corner].all(), "block corner must be GA"


def test_rolling_shift():
    g = init_point_map(32)
    pts = jnp.array([[2.0, 0.0, 0.5]])
    g = update_point_map(g, pts, jnp.ones(1, bool), 0.5)
    g2 = shift_point_map(g, jnp.array([4.0, 0.0]), 0.5)
    cloud = export_points(g2, capacity=8)
    got = np.asarray(cloud.xyz[np.asarray(cloud.valid)])
    np.testing.assert_allclose(got[0], [2.0, 0.0, 0.5], atol=1e-5)
    # content that rolls out of the window is dropped
    g3 = shift_point_map(g, jnp.array([20.0, 0.0]), 0.5)
    assert int(export_points(g3, capacity=8).count()) == 0


def test_capacity_overflow_drops_tail():
    g = init_point_map(64)
    pts = jnp.array([[x * 0.5, 0.0, 0.0] for x in range(20)], jnp.float32)
    g = update_point_map(g, pts, jnp.ones(20, bool), 0.5)
    cloud = export_points(g, capacity=8)
    assert int(cloud.count()) == 8


def test_dense_map_export_keeps_top_count_cells():
    """Dense-map regression for the approx_max_k recall setting (ADVICE r2):
    with occupied cells >> capacity, the export must still keep (nearly all
    of) the highest-observation-count cells, not drop them to the
    approximate reduction. 24x24 = 576 occupied cells vs capacity 128; the
    128 'hot' cells get 9 observations each, the rest 1."""
    import jax

    g = init_point_map(64)
    xs, ys = np.meshgrid(np.arange(24), np.arange(24))
    base = np.stack([xs.ravel() * 0.5 + 0.1, ys.ravel() * 0.5 + 0.1,
                     np.zeros(576)], axis=-1).astype(np.float32)
    rng = np.random.RandomState(0)
    hot = rng.choice(576, size=128, replace=False)
    reps = [base]
    for _ in range(8):
        reps.append(base[hot])
    pts = jnp.asarray(np.concatenate(reps, axis=0))
    g = update_point_map(g, pts, jnp.ones(len(pts), bool), 0.5)
    cloud = jax.jit(lambda gg: export_points(gg, capacity=128))(g)
    v = np.asarray(cloud.valid)
    assert v.sum() == 128
    got = np.asarray(cloud.xyz)[v][:, :2]
    want = base[hot][:, :2]
    # cell-center match: count how many exported points are hot cells
    hits = 0
    for w in want:
        if np.any(np.all(np.abs(got - w) < 0.2, axis=1)):
            hits += 1
    assert hits >= 0.9 * 128, f"only {hits}/128 hot cells survived export"


def test_offset_point_map_z_matches_per_point_shift():
    """offset_point_map_z(grid, dz) must equal rebuilding the map from the
    same points shifted by dz (MLS::offsetMap semantics on the centroid
    accumulators): sum_z + dz*count is the exact per-point shift."""
    from slam_tpu.mapping.point_map import offset_point_map_z

    rng = np.random.default_rng(3)
    pts = rng.uniform(-6, 6, (50, 3)).astype(np.float32)
    dz = 0.85
    g = update_point_map(init_point_map(64), jnp.asarray(pts),
                         jnp.ones(50, bool), 0.5)
    g_off = offset_point_map_z(g, jnp.float32(dz))
    shifted = pts + np.array([0, 0, dz], np.float32)
    g_ref = update_point_map(init_point_map(64), jnp.asarray(shifted),
                             jnp.ones(50, bool), 0.5)
    np.testing.assert_allclose(np.asarray(g_off.sum_z),
                               np.asarray(g_ref.sum_z), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(g_off.count),
                                  np.asarray(g_ref.count))
    # empty cells stay exactly zero
    np.testing.assert_array_equal(
        np.asarray(g_off.sum_z)[np.asarray(g.count) == 0], 0.0)
