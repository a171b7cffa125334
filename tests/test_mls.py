"""MLS cluster-grid behavioral tests (mls.cpp updateCell semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import MlsConfig
from slam_tpu.mapping.mls import (add_to_mls, get_segmented_clouds, init_mls,
                                  shift_origin_mls)
from slam_tpu.types import cloud_from_xyz


def cfg_small():
    return MlsConfig(size_x=32, size_y=32, resolution=0.5, max_clusters=4,
                     min_cluster_points=3.0, max_range=20.0, update_dist=16)


def _cloud_at(cells, z, n_per=6, jitter=0.02, seed=0):
    """n_per points per (x, y) world location at height z (+noise)."""
    rng = np.random.default_rng(seed)
    pts = []
    for (x, y), zz in zip(cells, z):
        for _ in range(n_per):
            pts.append([x + rng.uniform(-0.1, 0.1),
                        y + rng.uniform(-0.1, 0.1),
                        zz + rng.normal(0, jitter)])
    return cloud_from_xyz(jnp.array(np.array(pts, np.float32)))


def test_flat_ground_is_drivable():
    cfg = cfg_small()
    grid = init_mls(cfg)
    cells = [(x * 0.5, y * 0.5) for x in range(-4, 5) for y in range(-4, 5)]
    cloud = _cloud_at(cells, [0.0] * len(cells))
    grid = add_to_mls(grid, cloud, cfg)
    drv = np.asarray(grid.drivable)
    center = drv[12:20, 12:20]
    assert (center == 1).mean() > 0.8, f"flat ground not drivable:\n{center}"


def test_step_blocks_drivability():
    cfg = cfg_small()
    grid = init_mls(cfg)
    cells, zs = [], []
    for x in range(-4, 5):
        for y in range(-4, 5):
            cells.append((x * 0.5, y * 0.5))
            zs.append(0.0 if x < 1 else 1.0)  # 1 m step at x=1
    grid = add_to_mls(grid, _cloud_at(cells, zs), cfg)
    drv = np.asarray(grid.drivable)
    # cells on the high side adjacent to the step must be blocked
    step_col = 16 + 1  # x = 0.5 -> cell 17
    assert (drv[step_col, 12:20] == 0).mean() > 0.7, drv[step_col, 12:20]
    # far side of the low region stays drivable
    assert (drv[13, 13:19] == 1).mean() > 0.7


def test_overhang_two_clusters_drivable():
    cfg = cfg_small()
    grid = init_mls(cfg)
    cells = [(x * 0.5, y * 0.5) for x in range(-2, 3) for y in range(-2, 3)]
    # ground at 0 and a canopy at 2.5 m: clearance >> drive_dist_threshold
    grid = add_to_mls(grid, _cloud_at(cells, [0.0] * len(cells)), cfg)
    grid = add_to_mls(grid, _cloud_at(cells, [2.5] * len(cells), seed=1), cfg)
    drv = np.asarray(grid.drivable)
    num = np.asarray(grid.num_pts)
    center = (16, 16)
    assert (num[center] > 0).sum() >= 2, "should hold two clusters"
    assert drv[center] == 1, "high overhang should stay drivable"


def test_low_obstacle_blocks():
    cfg = cfg_small()
    grid = init_mls(cfg)
    cells = [(x * 0.5, y * 0.5) for x in range(-2, 3) for y in range(-2, 3)]
    grid = add_to_mls(grid, _cloud_at(cells, [0.0] * len(cells)), cfg)
    # table at 0.8 m: clearly outside the ground association gate
    # (3*sigma + 0.5 ~= 0.6) and clearance < drive_dist_threshold (1 m)
    grid = add_to_mls(grid, _cloud_at(cells, [0.8] * len(cells), seed=1), cfg)
    drv = np.asarray(grid.drivable)
    assert drv[16, 16] == 0, "low obstacle must block drivability"


def test_close_clusters_merge():
    cfg = cfg_small()
    grid = init_mls(cfg)
    cells = [(0.1, 0.1)]
    grid = add_to_mls(grid, _cloud_at(cells, [0.0], n_per=8), cfg)
    grid = add_to_mls(grid, _cloud_at(cells, [0.15], n_per=8, seed=1), cfg)
    num = np.asarray(grid.num_pts[16, 16])
    assert (num > 0).sum() == 1, f"15 cm apart layers should merge: {num}"


def test_rolling_shift_preserves_world_content():
    cfg = cfg_small()
    grid = init_mls(cfg)
    cells = [(1.0, 0.0)]
    grid = add_to_mls(grid, _cloud_at(cells, [0.3], n_per=8), cfg)
    assert float(grid.num_pts[18, 16, 0]) > 0  # x=1.0 -> cell 16+2
    grid2 = shift_origin_mls(grid, jnp.array([2.0, 0.0]), cfg)
    # same world point is now 1 m behind the center: cell 16 - 2
    assert float(grid2.num_pts[14, 16, 0]) > 0
    assert abs(float(grid2.mean[14, 16, 0, 2]) - 0.3) < 0.05


def test_segmented_cloud_export():
    cfg = cfg_small()
    grid = init_mls(cfg)
    cells = [(x * 0.5, y * 0.5) for x in range(-3, 4) for y in range(-3, 4)]
    grid = add_to_mls(grid, _cloud_at(cells, [0.0] * len(cells)), cfg)
    wall = [(2.0, y * 0.5) for y in range(-3, 4)]
    grid = add_to_mls(grid, _cloud_at(wall, [0.8] * len(wall), seed=2), cfg)
    obs, gnd = get_segmented_clouds(grid, cfg, capacity=128)
    assert int(gnd.count()) > 10
    assert int(obs.count()) >= 5
    oz = np.asarray(obs.xyz[np.asarray(obs.valid)][:, 2])
    gz = np.asarray(gnd.xyz[np.asarray(gnd.valid)][:, 2])
    assert gz.mean() < 0.2
    assert oz.max() > 0.5


def test_mls_marker_visualization(tmp_path):
    """Marker-level viz (MLS::visualize, mls.cpp:558-679): one sphere per
    live cluster with the reference's color/alpha/scale semantics."""
    from slam_tpu.utils.viz import mls_markers, render_mls_markers

    cfg = cfg_small()
    grid = init_mls(cfg)
    cells = [(x * 0.5, y * 0.5) for x in range(-3, 4) for y in range(-3, 4)]
    grid = add_to_mls(grid, _cloud_at(cells, [0.0] * len(cells)), cfg)
    wall = [(2.0, y * 0.5) for y in range(-3, 4)]
    grid = add_to_mls(grid, _cloud_at(wall, [0.9] * len(wall), seed=2), cfg)

    m = mls_markers(grid, cfg)
    n = len(m["pos"])
    assert n == int((np.asarray(grid.num_pts) > 0).sum())
    assert m["scale"].shape == (n, 3) and m["rgba"].shape == (n, 4)
    # ground clusters of drivable cells are green; initialized alpha is 0.6
    greens = (m["rgba"][:, 1] > 0.5) & (m["rgba"][:, 3] > 0.5)
    assert greens.any()
    # the wall creates non-drivable (red) or elevated (blue) markers
    assert ((m["rgba"][:, 0] > 0.5) | (m["rgba"][:, 2] > 0.5)).any()
    out = tmp_path / "mls.png"
    render_mls_markers(str(out), m)
    assert out.exists() or (tmp_path / "mls.png.npz").exists()


def test_shift_translates_cluster_means_to_new_frame():
    """Cluster mean x/y are center-relative; a rolling shift must translate
    them by -d*res or pre-shift clusters stay in the old frame and later
    scans blend two frames (cumulative-drift export bug)."""
    cfg = cfg_small()
    grid = init_mls(cfg)
    pts = np.zeros((8, 3), np.float32)
    pts[:, 0] = 1.0      # world x = 1, center (0, 0)
    pts[:, 2] = 0.5
    cloud = cloud_from_xyz(jnp.asarray(pts))
    grid = add_to_mls(grid, cloud, cfg)
    # find the cluster and check stored mean x
    num = np.asarray(grid.num_pts)
    ci = np.argwhere(num > 0)
    assert len(ci) == 1
    i, j, k = ci[0]
    assert abs(float(grid.mean[i, j, k, 0]) - 1.0) < 1e-5
    # shift the window center to (2, 0): the same cluster is now at
    # x = -1 in the NEW center-relative frame
    g2 = shift_origin_mls(grid, jnp.array([2.0, 0.0]), cfg)
    num2 = np.asarray(g2.num_pts)
    ci2 = np.argwhere(num2 > 0)
    assert len(ci2) == 1
    i2, j2, k2 = ci2[0]
    assert abs(float(g2.mean[i2, j2, k2, 0]) - (-1.0)) < 1e-5, \
        float(g2.mean[i2, j2, k2, 0])
    assert abs(float(g2.mean[i2, j2, k2, 2]) - 0.5) < 1e-5  # z frame-free


def test_offset_mls_z_shifts_only_existing_cluster_means():
    """MLS::offsetMap (mls.cpp:481-505): +dz on every existing cluster's
    mean z; uninitialized bank slots, variance, counts, and drivability
    untouched."""
    from slam_tpu.mapping.mls import offset_mls_z

    cfg = cfg_small()
    grid = init_mls(cfg)
    cloud = _cloud_at([(0.0, 0.0), (2.0, 1.0)], [0.0, 1.5])
    grid = add_to_mls(grid, cloud, cfg)
    dz = 0.37
    g2 = offset_mls_z(grid, jnp.float32(dz))

    exists = np.asarray(grid.num_pts) > 0
    assert exists.any()
    dmean = np.asarray(g2.mean) - np.asarray(grid.mean)
    np.testing.assert_allclose(dmean[exists][:, 2], dz, atol=1e-6)
    np.testing.assert_allclose(dmean[exists][:, :2], 0.0, atol=0.0)
    np.testing.assert_allclose(dmean[~exists], 0.0, atol=0.0)
    np.testing.assert_array_equal(np.asarray(g2.var_z), np.asarray(grid.var_z))
    np.testing.assert_array_equal(np.asarray(g2.num_pts),
                                  np.asarray(grid.num_pts))
    np.testing.assert_array_equal(np.asarray(g2.drivable),
                                  np.asarray(grid.drivable))


def test_sort_k_matches_stable_argsort():
    """The rank one-hot permutation (_sort_k) must reproduce the stable
    argsort + take_along_axis it replaced bit-for-bit, including inf keys
    (empty slots) and exact ties (duplicate cluster z)."""
    from slam_tpu.mapping.mls import _sort_k

    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    keys = jax.random.randint(k1, (50, 6, 4), 0, 3).astype(jnp.float32)
    keys = jnp.where(jax.random.uniform(k2, keys.shape) < 0.3, jnp.inf, keys)
    vals = jnp.arange(keys.size, dtype=jnp.float32).reshape(keys.shape)

    vals2 = -vals * 0.5

    order = jnp.argsort(keys, axis=-1)  # stable
    want_v = jnp.take_along_axis(vals, order, axis=-1)
    want_v2 = jnp.take_along_axis(vals2, order, axis=-1)
    # note: only the KEY may be inf — sorted arrays must be finite (the 0/1
    # einsum's 0*inf would be NaN), which production honors (mean/var/num)
    got_v, got_v2 = _sort_k(keys, (vals, vals2))
    np.testing.assert_array_equal(np.asarray(want_v), np.asarray(got_v))
    np.testing.assert_array_equal(np.asarray(want_v2), np.asarray(got_v2))


def test_first_true_and_pick():
    from slam_tpu.mapping.mls import _first_true, _pick, _shift_k

    m = jnp.array([[False, True, True, False],
                   [False, False, False, False],
                   [True, False, False, True]])
    f = _first_true(m)
    np.testing.assert_array_equal(
        np.asarray(f), [[0, 1, 0, 0], [0, 0, 0, 0], [1, 0, 0, 0]])
    v = jnp.arange(12, dtype=jnp.float32).reshape(3, 4) + 1
    np.testing.assert_array_equal(np.asarray(_pick(v, f)), [2.0, 0.0, 9.0])
    s = _shift_k(f)
    np.testing.assert_array_equal(
        np.asarray(s), [[0, 0, 1, 0], [0, 0, 0, 0], [0, 1, 0, 0]])
