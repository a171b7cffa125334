"""Reference-scale engine parity: every O(N)-scalable path must agree with
the sim-scale engine it replaces (VERDICT r2 item 1 — run at the reference's
own working point: >=20k-point scans, 20k pts/class ICP, 72x200 polar grid).

  - scene_grid builder vs the same-cell incidence builder (same voxel
    centroid set + GA flags, different output ordering)
  - native-scatter ground binning vs the (N, S*L) incidence engine
  - scatter_add_2d native vs one-hot
  - the C-tiled streaming ICP kernel vs icp_fit (interpret mode)
"""

import dataclasses
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import IcpConfig, SlamConfig, ref_scale_config


def _random_scan_2d(rng, n, spread=40.0):
    px = rng.uniform(-spread, spread, n).astype(np.float32)
    py = rng.uniform(-spread, spread, n).astype(np.float32)
    hit = rng.rand(n) < 0.9
    return jnp.asarray(px), jnp.asarray(py), jnp.asarray(hit)


def _centroid_set(xs, ys, keep, ga):
    xs, ys, keep, ga = (np.asarray(a) for a in (xs, ys, keep, ga))
    pts = sorted((round(float(x), 4), round(float(y), 4), bool(g))
                 for x, y, g in zip(xs[keep], ys[keep], ga[keep]))
    return pts


def test_scene_grid_matches_incidence_builder():
    from slam_tpu.pipeline.slam2d import build_scene_planes

    rng = np.random.RandomState(3)
    px, py, hit = _random_scan_2d(rng, 512, spread=30.0)
    cfg = SlamConfig()
    cfg_inc = cfg.replace(
        cloud=dataclasses.replace(cfg.cloud, scene_capacity=512,
                                  scene_builder="incidence"))
    cfg_grid = cfg.replace(
        cloud=dataclasses.replace(cfg.cloud, scene_capacity=512,
                                  scene_builder="grid"))
    sx1, sy1, ga1, k1 = jax.jit(
        lambda a, b, c: build_scene_planes(a, b, c, cfg_inc))(px, py, hit)
    sx2, sy2, ga2, k2 = jax.jit(
        lambda a, b, c: build_scene_planes(a, b, c, cfg_grid))(px, py, hit)
    # identical voxel centroids + GA flags, order-agnostic
    assert _centroid_set(sx1, sy1, k1, ga1) == _centroid_set(sx2, sy2, k2, ga2)


def test_scene_grid_20k_scan_shapes_and_content():
    """The builder the 20k configs use: exact centroids at 20,480 points."""
    from slam_tpu.ops.scene_grid import build_scene_grid_planes

    rng = np.random.RandomState(5)
    n = 20480
    px = rng.uniform(-80, 80, n).astype(np.float32)
    py = rng.uniform(-80, 80, n).astype(np.float32)
    pz = rng.uniform(-1, 3, n).astype(np.float32)
    valid = jnp.asarray(rng.rand(n) < 0.97)
    sx, sy, sz, ga, drv, keep = jax.jit(
        lambda a, b, c, v: build_scene_grid_planes(
            a, b, c, v, None, 4096, 0.5, 512, 2))(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz), valid)
    keep_np = np.asarray(keep)
    assert keep_np.sum() > 1000          # dense scan fills thousands of cells
    # exported centroid == numpy mean of that cell's points
    xs, ys, zs = np.asarray(sx), np.asarray(sy), np.asarray(sz)
    vm = np.asarray(valid)
    ci = np.floor(px / 0.5).astype(int)
    cj = np.floor(py / 0.5).astype(int)
    idx = np.flatnonzero(keep_np)[:20]
    for i in idx:
        ki = np.floor(xs[i] / 0.5).astype(int)
        kj = np.floor(ys[i] / 0.5).astype(int)
        incell = vm & (ci == ki) & (cj == kj)
        assert incell.any()
        np.testing.assert_allclose(xs[i], px[incell].mean(), atol=1e-4)
        np.testing.assert_allclose(ys[i], py[incell].mean(), atol=1e-4)
        np.testing.assert_allclose(zs[i], pz[incell].mean(), atol=1e-4)


def test_ground_native_matches_incidence():
    from slam_tpu.ops import ground as gmod
    from slam_tpu.sim import world3d
    from slam_tpu.types import cloud_from_xyz

    cfg = ref_scale_config()
    sim = dataclasses.replace(cfg.sim, num_azimuth=64)   # 2048 rays
    world = world3d.make_world(jax.random.PRNGKey(1), sim)
    scan, hit = world3d.raycast(world, jnp.zeros(3), sim)
    cloud = cloud_from_xyz(scan, valid=hit)

    r_inc = jax.jit(lambda c: gmod.segment_ground(c, cfg.ground))(cloud)
    with mock.patch.object(gmod, "INCIDENCE_LIMIT", 0):
        r_nat = jax.jit(lambda c: gmod.segment_ground(c, cfg.ground))(cloud)

    np.testing.assert_array_equal(np.asarray(r_inc.cloud.valid),
                                  np.asarray(r_nat.cloud.valid))
    np.testing.assert_array_equal(np.asarray(r_inc.cloud.flags),
                                  np.asarray(r_nat.cloud.flags))
    np.testing.assert_allclose(np.asarray(r_inc.f_s), np.asarray(r_nat.f_s),
                               atol=1e-5)


def test_ground_packedmin_matches_sort():
    """The packed-key scatter-min prototype engine vs the sort engine.

    Exact equality is not expected: packedmin quantizes proto_r to
    r_max/2048 (~5 cm) and proto_h to 1 mm, which can flip sub-quantum
    height-sort ties and borderline threshold comparisons. Demand near-total
    label agreement and close regressed ground heights instead.
    """
    from slam_tpu.ops import ground as gmod
    from slam_tpu.sim import world3d
    from slam_tpu.types import cloud_from_xyz

    cfg = ref_scale_config()
    sim = dataclasses.replace(cfg.sim, num_azimuth=64)   # 2048 rays
    world = world3d.make_world(jax.random.PRNGKey(1), sim)
    scan, hit = world3d.raycast(world, jnp.zeros(3), sim)
    cloud = cloud_from_xyz(scan, valid=hit)

    with mock.patch.object(gmod, "INCIDENCE_LIMIT", 0):
        r_sort = jax.jit(lambda c: gmod.segment_ground(c, cfg.ground))(cloud)
        with mock.patch.object(gmod, "LARGE_N_PROTO", "packedmin"):
            r_pm = jax.jit(lambda c: gmod.segment_ground(c, cfg.ground))(
                cloud)

    v_s = np.asarray(r_sort.cloud.valid)
    v_p = np.asarray(r_pm.cloud.valid)
    lbl_s = np.where(v_s, np.asarray(r_sort.cloud.flags), -1)
    lbl_p = np.where(v_p, np.asarray(r_pm.cloud.flags), -1)
    agree = (lbl_s == lbl_p).mean()
    assert agree > 0.995, f"only {agree:.4f} label agreement"
    # regressed heights over sufficient sectors stay within a few cm
    suff = np.asarray(r_sort.sector_sufficient) & \
        np.asarray(r_pm.sector_sufficient)
    df = np.abs(np.asarray(r_sort.f_s) - np.asarray(r_pm.f_s))[suff]
    assert float(df.max(initial=0.0)) < 0.05, f"f_s diverged {df.max()}"


def test_ground_packedmin_empty_and_ties():
    """packedmin edge cases: all-invalid cloud, and exact mm-level z ties
    (ties resolve by quantized range — deterministic, bin still classified)."""
    from slam_tpu.ops import ground as gmod
    from slam_tpu.types import cloud_from_xyz

    cfg = ref_scale_config().ground
    with mock.patch.object(gmod, "INCIDENCE_LIMIT", 0), \
            mock.patch.object(gmod, "LARGE_N_PROTO", "packedmin"):
        empty = cloud_from_xyz(jnp.zeros((128, 3)),
                               valid=jnp.zeros(128, bool))
        res = jax.jit(lambda c: gmod.segment_ground(c, cfg))(empty)
        assert not bool(res.cloud.valid.any())

        # 32 identical-z points in one bin (plus range jitter): one
        # prototype, classified ground around itself
        x = jnp.linspace(10.0, 10.2, 32)
        xyz = jnp.stack([x, jnp.zeros(32), jnp.full((32,), -1.45)], -1)
        res = jax.jit(lambda c: gmod.segment_ground(c, cfg))(
            cloud_from_xyz(xyz))
        flags = np.asarray(res.cloud.flags)[np.asarray(res.cloud.valid)]
        assert flags.size  # classified, no NaN/sentinel fallout


def test_scatter_native_matches_onehot():
    from slam_tpu.ops.scatter2d import scatter_add_2d_multi

    rng = np.random.RandomState(0)
    n = 1000
    cx = jnp.asarray(rng.randint(-2, 34, n))
    cy = jnp.asarray(rng.randint(-2, 34, n))
    v = jnp.asarray(rng.randn(n).astype(np.float32))
    valid = jnp.asarray(rng.rand(n) < 0.9)
    a = scatter_add_2d_multi(cx, cy, (None, v), valid, (32, 32),
                             precision=jax.lax.Precision.HIGHEST,
                             impl="onehot")
    b = scatter_add_2d_multi(cx, cy, (None, v), valid, (32, 32),
                             impl="native")
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=0)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-4)


def test_tiled_icp_matches_icp_fit_interpret():
    """The C-tiled streaming kernel == icp_fit on a problem spanning several
    S/C blocks with ragged (non-multiple) sizes. Interpret mode (CPU); the
    on-chip equivalence lives in test_icp_fused_tpu.py."""
    from jax.experimental import pallas as pl

    from slam_tpu.ops import icp_pallas as ip
    from slam_tpu.ops.icp import icp_fit

    orig = pl.pallas_call

    def interp(*a, **k):
        k.pop("compiler_params", None)
        k["interpret"] = True
        return orig(*a, **k)

    cfg = IcpConfig(max_iterations=12, inlier_dist=2.0, min_delta=1e-6)
    rng = np.random.RandomState(0)
    C, S = 1500, 700
    mx = rng.uniform(-20, 20, C).astype(np.float32)
    my = rng.uniform(-20, 20, C).astype(np.float32)
    mga = rng.rand(C) < 0.4
    mvalid = rng.rand(C) < 0.95
    idx = rng.choice(C, S)
    th = 0.05
    c0, s0 = np.cos(th), np.sin(th)
    sx0 = mx[idx] + rng.normal(0, 0.03, S).astype(np.float32)
    sy0 = my[idx] + rng.normal(0, 0.03, S).astype(np.float32)
    sx = (c0 * (sx0 - 0.3) + s0 * (sy0 + 0.2)).astype(np.float32)
    sy = (-s0 * (sx0 - 0.3) + c0 * (sy0 + 0.2)).astype(np.float32)
    sga = mga[idx]
    svalid = rng.rand(S) < 0.97
    init = jnp.array([0.0, 0.0, 0.0], jnp.float32)

    ref = icp_fit(jnp.stack([sx, sy], -1), jnp.asarray(svalid),
                  jnp.asarray(sga), jnp.stack([mx, my], -1),
                  jnp.asarray(mvalid), jnp.asarray(mga), init, cfg)
    with mock.patch.object(pl, "pallas_call", interp):
        sc = ip.encode_scene_class(jnp.asarray(svalid), jnp.asarray(sga))
        mc = ip.encode_model_class(jnp.asarray(mvalid), jnp.asarray(mga))
        r2 = ip._icp_batched_planes_tiled(
            jnp.asarray(sx)[None], jnp.asarray(sy)[None], sc[None],
            jnp.asarray(mx)[None], jnp.asarray(my)[None], mc[None],
            init[None], cfg, 256, 512)
    err = np.abs(np.asarray(r2.pose[0]) - np.asarray(ref.pose))
    assert err.max() < 2e-3, err
    assert int(r2.num_corr[0]) == int(ref.num_corr)
    assert bool(r2.ok[0]) == bool(ref.ok)


def test_scatter_chunked_matches_onehot():
    from slam_tpu.ops.scatter2d import scatter_add_2d_multi

    rng = np.random.RandomState(4)
    n = 5000
    cx = jnp.asarray(rng.randint(-2, 66, n))
    cy = jnp.asarray(rng.randint(-2, 66, n))
    v = jnp.asarray(rng.randn(n).astype(np.float32))
    valid = jnp.asarray(rng.rand(n) < 0.9)
    a = scatter_add_2d_multi(cx, cy, (None, v), valid, (64, 64),
                             precision=jax.lax.Precision.HIGHEST,
                             impl="onehot")
    b = scatter_add_2d_multi(cx, cy, (None, v), valid, (64, 64),
                             precision=jax.lax.Precision.HIGHEST,
                             impl="chunked")
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=0)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-4)


def test_scatter_chunked_matches_native_large_n():
    """The two large-N engines ("auto" resolves to scatter2d.LARGE_N_IMPL
    past ONEHOT_SCATTER_LIMIT) must agree: chunked one-hot at HIGHEST
    precision vs the native serialized scatter, including per-channel
    precision overrides."""
    from slam_tpu.ops import scatter2d

    rng = np.random.RandomState(7)
    n, G = 20480, 384
    cx = jnp.asarray(rng.randint(-4, G + 4, n))
    cy = jnp.asarray(rng.randint(-4, G + 4, n))
    v1 = jnp.asarray(rng.randn(n).astype(np.float32))
    v2 = jnp.asarray((rng.randn(n) * 100.0).astype(np.float32))
    valid = jnp.asarray(rng.rand(n) < 0.95)
    hi = jax.lax.Precision.HIGHEST
    a = scatter2d.scatter_add_2d_native(cx, cy, (None, v1, v2), valid, (G, G))
    b = scatter2d.scatter_add_2d_chunked(cx, cy, (None, v1, v2), valid,
                                         (G, G), precision=hi,
                                         precisions=(None, hi, hi))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=0)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]),
                               rtol=1e-6, atol=1e-2)
    # auto routes to LARGE_N_IMPL past the limit
    assert n * G > scatter2d.ONEHOT_SCATTER_LIMIT
    c = scatter2d.scatter_add_2d_multi(cx, cy, (None, v1, v2), valid, (G, G),
                                       impl="auto")
    ref = (scatter2d.scatter_add_2d_native if scatter2d.LARGE_N_IMPL ==
           "native" else scatter2d.scatter_add_2d_chunked)(
               cx, cy, (None, v1, v2), valid, (G, G))
    np.testing.assert_allclose(np.asarray(c[0]), np.asarray(ref[0]), atol=0)
