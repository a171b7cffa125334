"""Fused-Pallas-kernel vs XLA icp_fit equivalence (TPU only).

The whole-fit-loop Pallas kernel (ops/icp_pallas.py) implements the same
semantics as ops.icp.icp_fit (icp.cpp:80-122): squared-distance inlier gate,
class-constrained participation, no-correspondence freeze, min_delta
convergence. Both iterate to the same fixed point, so on identical inputs the
recovered poses must agree to fp noise. This pins the kernel against the pure
XLA transcription whenever the suite runs on the real chip
(SLAM_TPU_TEST_ON_TPU=1); off-TPU the kernel cannot lower, so we skip.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.config import IcpConfig
from slam_tpu.ops.icp import icp_fit

if jax.default_backend() != "tpu":
    pytest.skip("fused ICP kernel only lowers on TPU", allow_module_level=True)


CFG = dataclasses.replace(IcpConfig(), max_points=128, ga_num_bins=64)


def _random_case(key, S=128, C=256, drop=0.2):
    """A registration problem with a known answer: the scene is a noisy,
    transformed subset of the model, classes split GA/NGA."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    model = jax.random.uniform(k1, (C, 2), minval=-20.0, maxval=20.0)
    m_ga = jax.random.bernoulli(k2, 0.4, (C,))
    m_valid = jnp.ones((C,), bool).at[C - C // 8:].set(False)
    idx = jax.random.permutation(k3, C)[:S]
    true_pose = jnp.array([0.6, -0.4, 0.08])
    c, s = jnp.cos(true_pose[2]), jnp.sin(true_pose[2])
    R = jnp.array([[c, -s], [s, c]])
    scene = (model[idx] - true_pose[:2]) @ R  # inverse transform
    scene = scene + 0.01 * jax.random.normal(k4, scene.shape)
    s_ga = m_ga[idx]
    s_valid = jax.random.bernoulli(k5, 1.0 - drop, (S,))
    return scene, s_valid, s_ga, model, m_valid, m_ga, true_pose


def _run_both(key):
    from slam_tpu.ops.icp_pallas import (encode_model_class,
                                         encode_scene_class,
                                         make_icp_fused_planes)
    scene, s_valid, s_ga, model, m_valid, m_ga, true_pose = _random_case(key)
    init = jnp.zeros(3)
    ref = icp_fit(scene, s_valid, s_ga, model, m_valid, m_ga, init, CFG)
    fused = make_icp_fused_planes(CFG)(
        scene[:, 0], scene[:, 1], encode_scene_class(s_valid, s_ga),
        model[:, 0], model[:, 1], encode_model_class(m_valid, m_ga), init)
    return ref, fused, true_pose


def test_fused_matches_xla_fixed_point():
    for seed in range(4):
        ref, fused, true_pose = _run_both(jax.random.PRNGKey(seed))
        assert bool(ref.ok) and bool(fused.ok)
        np.testing.assert_allclose(np.asarray(fused.pose),
                                   np.asarray(ref.pose), atol=2e-3)
        # both recover the planted transform (loose: with 1 cm noise and 20%
        # dropout the shared local optimum can sit several cm off the plant —
        # measured seed 3 lands 6.7 cm away in BOTH implementations)
        np.testing.assert_allclose(np.asarray(fused.pose),
                                   np.asarray(true_pose), atol=0.12)
        assert abs(int(fused.num_corr) - int(ref.num_corr)) <= 2


def test_fused_matches_xla_degenerate_scene():
    """Scene below min_scene_points: both must freeze at the init pose with
    ok=False (the orientation.w==9999 sentinel, icpTools.cpp:179-184)."""
    from slam_tpu.ops.icp_pallas import (encode_model_class,
                                         encode_scene_class,
                                         make_icp_fused_planes)
    scene, s_valid, s_ga, model, m_valid, m_ga, _ = _random_case(
        jax.random.PRNGKey(7))
    s_valid = s_valid & (jnp.arange(s_valid.shape[0]) < 3)  # < min 5
    init = jnp.array([1.0, -2.0, 0.3])
    ref = icp_fit(scene, s_valid, s_ga, model, m_valid, m_ga, init, CFG)
    fused = make_icp_fused_planes(CFG)(
        scene[:, 0], scene[:, 1], encode_scene_class(s_valid, s_ga),
        model[:, 0], model[:, 1], encode_model_class(m_valid, m_ga), init)
    assert not bool(ref.ok) and not bool(fused.ok)
    np.testing.assert_allclose(np.asarray(fused.pose), np.asarray(init),
                               atol=1e-6)


def test_fused_vmap_batch():
    """The custom_vmap rule maps robots onto the kernel grid axis."""
    from slam_tpu.ops.icp_pallas import (encode_model_class,
                                         encode_scene_class,
                                         make_icp_fused_planes)
    keys = jax.random.split(jax.random.PRNGKey(3), 6)
    cases = [_random_case(k) for k in keys]
    stack = lambda i: jnp.stack([c[i] for c in cases])
    scene, s_valid, s_ga = stack(0), stack(1), stack(2)
    model, m_valid, m_ga = stack(3), stack(4), stack(5)
    init = jnp.zeros((6, 3))
    f = make_icp_fused_planes(CFG)
    batched = jax.vmap(f)(
        scene[..., 0], scene[..., 1],
        jax.vmap(encode_scene_class)(s_valid, s_ga),
        model[..., 0], model[..., 1],
        jax.vmap(encode_model_class)(m_valid, m_ga), init)
    for i in range(6):
        single = f(scene[i, :, 0], scene[i, :, 1],
                   encode_scene_class(s_valid[i], s_ga[i]),
                   model[i, :, 0], model[i, :, 1],
                   encode_model_class(m_valid[i], m_ga[i]), init[i])
        np.testing.assert_allclose(np.asarray(batched.pose[i]),
                                   np.asarray(single.pose), atol=1e-5)


def test_tiled_kernel_matches_xla_on_chip():
    """The C-tiled streaming kernel (reference-scale sibling) vs icp_fit on
    the real chip, at a size spanning several S/C blocks with ragged
    boundaries. Interpret-mode equivalence lives in test_scale.py; this is
    the Mosaic-lowering check."""
    from slam_tpu.ops.icp_pallas import (_icp_batched_planes_tiled,
                                         encode_model_class,
                                         encode_scene_class)

    scene, s_valid, s_ga, model, m_valid, m_ga, _ = _random_case(
        jax.random.PRNGKey(9), S=700, C=1500)
    init = jnp.zeros(3)
    cfg = dataclasses.replace(CFG, max_iterations=12)
    ref = icp_fit(scene, s_valid, s_ga, model, m_valid, m_ga, init, cfg)
    r2 = _icp_batched_planes_tiled(
        scene[None, :, 0], scene[None, :, 1],
        encode_scene_class(s_valid, s_ga)[None],
        model[None, :, 0], model[None, :, 1],
        encode_model_class(m_valid, m_ga)[None], init[None], cfg, 256, 512)
    err = np.abs(np.asarray(r2.pose[0]) - np.asarray(ref.pose))
    assert err.max() < 2e-3, err
    assert int(r2.num_corr[0]) == int(ref.num_corr)
