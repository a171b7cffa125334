"""Mid-scale end-to-end rollouts with the reference-scale engines live —
split from test_scale.py so the per-file suite runner parallelizes the two
compile-heavy rollouts (suite-latency item, VERDICT r4 weak 6)."""

import dataclasses
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import ref_scale_config


def test_midscale_rollout_tracks():
    """End-to-end ATE with ALL scale engines live (grid scene builder,
    native ground binning, grid matcher) on a 5120-point Velodyne config —
    the CPU-sized stand-in for the 20k working point (the full-size rollout
    runs on TPU via bench.py's ref-scale entry)."""
    from slam_tpu.pipeline import slam3d
    from slam_tpu.sim import world3d

    cfg = ref_scale_config()
    cfg = cfg.replace(
        sim=dataclasses.replace(cfg.sim, num_azimuth=160),  # 32*160 = 5120
        icp=dataclasses.replace(cfg.icp, matcher="grid"),
        # scale the raw-scan completeness gate with the ray count (the
        # full-size 5856 gate would mask EVERY 5120-ray scan and this test
        # would "pass" on pure dead reckoning)
        cloud=dataclasses.replace(cfg.cloud, min_scan_points=1464),
    )
    assert cfg.cloud.scene_builder == "grid"
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
    s = slam3d.init_state_3d(jax.random.PRNGKey(0), cfg, world)
    gm = slam3d.init_ground_map(cfg)
    final, gm2, (est, true) = slam3d.rollout_3d(s, world, gm, cfg, 12)
    # pin that registration actually ran (complete scans passed the gate):
    # a masked-scan rollout dead-reckons with scan_reg_ok False throughout
    assert bool(final.scan_reg_ok)
    est, true = np.asarray(est), np.asarray(true)
    err = est[4:, :2] - true[4:, :2]
    ate = float(np.sqrt((err ** 2).sum(-1).mean()))
    zerr = float(np.abs(est[4:, 3] - true[4:, 3]).mean())
    assert np.isfinite(ate) and ate < 0.2, ate
    assert zerr < 0.1, zerr


def test_midscale_rollout_alt_engines_track_default():
    """Safety net for flipping the env-gated engine defaults after the
    on-chip A/B (SLAM_TPU_GROUND_PROTO=packedmin, SLAM_TPU_GP_SOLVER=blocked,
    SLAM_TPU_LARGE_SCATTER=chunked): the full 3D pipeline run with ALL three
    alternative engines live must keep registration healthy and land on the
    same trajectory as the default engines to within the packedmin
    quantization tolerance (~5 cm prototype-range quantum)."""
    from slam_tpu.ops import ground as gmod
    from slam_tpu.ops import scatter2d
    from slam_tpu.pipeline import slam3d
    from slam_tpu.sim import world3d

    cfg = ref_scale_config()
    cfg = cfg.replace(
        sim=dataclasses.replace(cfg.sim, num_azimuth=160),  # 32*160 = 5120
        icp=dataclasses.replace(cfg.icp, matcher="grid"),
        cloud=dataclasses.replace(cfg.cloud, min_scan_points=1464),
    )
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)

    def run():
        s = slam3d.init_state_3d(jax.random.PRNGKey(0), cfg, world)
        gm = slam3d.init_ground_map(cfg)
        final, _, (est, true) = slam3d.rollout_3d(s, world, gm, cfg, 12)
        return bool(final.scan_reg_ok), np.asarray(est), np.asarray(true)

    ok_d, est_d, true_d = run()
    # midscale N=5120 keeps scatter sites under ONEHOT_SCATTER_LIMIT, so
    # zero the limit in the alt run to route EVERY auto site through the
    # large-N engines (chunked scatter / native row gather) like a 20k scan
    with mock.patch.object(gmod, "LARGE_N_PROTO", "packedmin"), \
            mock.patch.object(gmod, "GP_SOLVER", "blocked"), \
            mock.patch.object(scatter2d, "LARGE_N_IMPL", "chunked"), \
            mock.patch.object(scatter2d, "ONEHOT_SCATTER_LIMIT", 0):
        ok_a, est_a, true_a = run()

    assert ok_d and ok_a
    np.testing.assert_array_equal(true_d, true_a)  # same world, same control
    dev = np.sqrt(((est_a[:, :2] - est_d[:, :2]) ** 2).sum(-1)).max()
    assert dev < 0.1, f"alt engines diverged {dev:.3f} m from default"
    err = est_a[4:, :2] - true_a[4:, :2]
    ate = float(np.sqrt((err ** 2).sum(-1).mean()))
    assert np.isfinite(ate) and ate < 0.2, ate


