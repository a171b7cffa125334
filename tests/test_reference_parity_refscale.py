"""Reference-parity at the reference's OWN working point (VERDICT r3 item 2):
20,480-ray scans, the full 72x200 polar ground grid to 100 m, 20k-point ICP
budget with the reference's 5 m inlier distance — the scales the C++ stack
gates on (scan_registration.cpp:122, groundSegmentation.h:17-18,
icpTools.h:21) — against the same sequential float64 oracle the sim-scale
3D parity test uses.

This pins that the framework is ACCURATE at the working point, not merely
fast there: ground-truth ATE at ref scale (~6-7 cm, BENCH ref_scale_ate_cm)
is the reference EKF's own one-tick command-lag frozen into the map anchor
(docs/PERF.md round-4 note), NOT a degradation of our chain — this test
shows the chain itself still matches the reference's math to sub-centimeter
at 20k points.

Engine note: the oracle transcribes the reference's exact-NN points matcher
and cloud-based height chain, so our side runs those semantics at ref-scale
sizes; the O(N)-scalable engines ref_scale_config() swaps in (grid matcher,
grid scene builder, grid height) are equivalence-tested against these
directly in tests/test_scale.py — together the two links cover the deployed
configuration.

Runtime: the f64 oracle is O(N^2) python; ~6 frames keep this file in the
minutes range on the CPU suite.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import ref_scale_config
from slam_tpu.sim import world3d
from tests import test_reference_parity3d as tp3


def _cfg():
    c = ref_scale_config()
    return dataclasses.replace(
        c,
        # oracle semantics: exact-NN points matcher + cloud height chain
        # (see module docstring); identical noise handling to the sim-scale
        # parity tests
        icp=dataclasses.replace(c.icp, matcher="points"),
        height=dataclasses.replace(c.height, source="cloud"),
        cloud=dataclasses.replace(c.cloud, scene_builder="incidence",
                                  export_recall=1.0),
        sim=dataclasses.replace(c.sim, gyro_noise=0.0, range_noise=0.005),
    )


def test_refscale_pipeline_matches_reference_oracle():
    cfg = _cfg()
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
    frames = tp3._render_frames(cfg, world, 6)
    assert frames[1].sum(1).min() >= cfg.cloud.min_scan_points, \
        "fixture scans must pass the reference's completeness gate"
    z0 = world3d.terrain_height(world, jnp.zeros(2)) + cfg.sim.sensor_height

    from tests.golden_cache import cached_oracle
    ref = cached_oracle("parity_refscale", tp3.oracle_slam3d,
                        (cfg, float(z0)), (world, frames),
                        lambda: tp3.oracle_slam3d(cfg, world, frames,
                                                  float(z0)))
    got = tp3.ours_slam3d(cfg, world, frames)

    warm = 2
    err = np.linalg.norm(got[warm:, :2] - ref[warm:, :2], axis=1)
    ate = float(np.sqrt(np.mean(err ** 2)))
    assert ate <= 0.01, f"ref-scale planar ATE vs oracle {ate*100:.2f} cm"
    dyaw = np.abs(np.arctan2(np.sin(got[warm:, 2] - ref[warm:, 2]),
                             np.cos(got[warm:, 2] - ref[warm:, 2])))
    assert dyaw.max() <= 0.005, f"ref-scale yaw dev {dyaw.max():.4f}"
    dz = np.abs(got[warm:, 3] - ref[warm:, 3])
    assert dz.max() <= 0.02, f"ref-scale z dev {dz.max()*100:.2f} cm"
