"""ICP op tests: Procrustes vs SVD oracle, correspondence semantics, full fit
recovering known transforms (ccicp2d behavior parity)."""

import numpy as np
import jax.numpy as jnp

from slam_tpu.config import IcpConfig
from slam_tpu.ops.icp import (edge_information_2d, fit_step, icp_fit,
                              procrustes_2d)
from slam_tpu.ops.nn import nearest_neighbor


def svd_kabsch_oracle(t, m, w):
    """NumPy SVD solve exactly as icpPointToPoint.cpp:148-167."""
    wsum = w.sum()
    mu_t = (w[:, None] * t).sum(0) / wsum
    mu_m = (w[:, None] * m).sum(0) / wsum
    qt = (t - mu_t) * w[:, None]
    qm = m - mu_m
    H = qt.T @ qm
    U, _, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    tt = mu_m - R @ mu_t
    return R, tt


def test_procrustes_matches_svd_oracle():
    rng = np.random.default_rng(0)
    t = rng.normal(size=(50, 2)).astype(np.float32)
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    m = t @ R.T + np.array([1.0, -2.0])
    w = rng.uniform(0.1, 1.0, size=50).astype(np.float32)
    yaw, trans, _ = procrustes_2d(jnp.array(t), jnp.array(m), jnp.array(w))
    R_o, t_o = svd_kabsch_oracle(t, m, w)
    yaw_o = np.arctan2(R_o[1, 0], R_o[0, 0])
    assert abs(float(yaw) - yaw_o) < 1e-5
    np.testing.assert_allclose(np.asarray(trans), t_o, atol=1e-4)
    assert abs(float(yaw) - th) < 1e-5


def test_nearest_neighbor_class_constrained():
    q = jnp.array([[0.0, 0.0]])
    m = jnp.array([[0.1, 0.0], [1.0, 0.0]])
    mv = jnp.array([True, True])
    # without classes: nearest is index 0
    idx, d2 = nearest_neighbor(q, m, mv)
    assert int(idx[0]) == 0
    # class constraint forces the farther same-class point
    idx, d2 = nearest_neighbor(q, m, mv, q_class=jnp.array([1]),
                               m_class=jnp.array([0, 1]))
    assert int(idx[0]) == 1
    assert abs(float(d2[0]) - 1.0) < 1e-6
    # invalid model points are never matched
    idx, _ = nearest_neighbor(q, m, jnp.array([False, True]))
    assert int(idx[0]) == 1


def _ring(n, r=5.0, jitter=0.0, seed=0):
    rng = np.random.default_rng(seed)
    a = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pts = np.stack([r * np.cos(a) + 0.5 * np.cos(3 * a),
                    r * np.sin(a) + 0.3 * np.sin(5 * a)], -1)
    return (pts + jitter * rng.normal(size=pts.shape)).astype(np.float32)


def test_icp_recovers_known_transform():
    # random asymmetric geometry: with a sub-spacing transform, NN recovers the
    # true correspondences and ICP must land on the exact pose (a smooth ring
    # would admit tangential-slide local minima — real ICP behavior).
    cfg = IcpConfig(max_points=256, inlier_dist=4.0, min_scene_points=5)
    rng = np.random.default_rng(5)
    model = rng.uniform(-8, 8, size=(128, 2)).astype(np.float32)
    th, tx, ty = 0.08, 0.25, -0.2
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    # scene such that R*scene + t = model
    scene = (model - np.array([tx, ty])) @ R  # inverse transform
    valid = jnp.ones(128, bool)
    ga = jnp.zeros(128, bool)
    res = icp_fit(jnp.array(scene), valid, ga, jnp.array(model), valid, ga,
                  jnp.array([0.0, 0.0, 0.0]), cfg)
    assert bool(res.ok)
    assert abs(float(res.pose[2]) - th) < 1e-3
    assert abs(float(res.pose[0]) - tx) < 1e-2
    assert abs(float(res.pose[1]) - ty) < 1e-2


def test_icp_fails_with_too_few_points():
    cfg = IcpConfig()
    xyz = jnp.zeros((16, 2))
    valid = jnp.zeros(16, bool).at[:3].set(True)
    ga = jnp.zeros(16, bool)
    init = jnp.array([1.0, 2.0, 0.5])
    res = icp_fit(xyz, valid, ga, xyz, jnp.ones(16, bool), ga, init, cfg)
    assert not bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(init))


def test_class_participation_gate():
    """Template points whose class has <=3 model points must not participate
    (icpPointToPoint.cpp:59,93)."""
    cfg = IcpConfig(inlier_dist=100.0)
    model = _ring(64)
    m_ga = jnp.zeros(64, bool).at[:2].set(True)  # only 2 GA model points
    scene = model.copy()
    s_ga = jnp.ones(64, bool)  # all scene points GA -> none participate
    pose, delta, ncorr, _ = fit_step(
        jnp.array(scene), jnp.ones(64, bool), s_ga,
        jnp.array(model), jnp.ones(64, bool), m_ga,
        jnp.array([0.0, 0.0, 0.0]), cfg.inlier_dist)
    assert int(ncorr) == 0
    assert float(delta) == -1.0  # no-correspondence sentinel


def test_edge_information_positive_definite():
    rng = np.random.default_rng(3)
    t = rng.normal(size=(100, 2)).astype(np.float32) * 3
    m = t + 0.01 * rng.normal(size=(100, 2)).astype(np.float32)
    w = np.ones(100, np.float32)
    info = np.asarray(edge_information_2d(jnp.array(t), jnp.array(m),
                                          jnp.array(w)))
    eig = np.linalg.eigvalsh(info)
    assert (eig > 0).all()
    # tighter correspondences => more information
    m2 = t + 0.1 * rng.normal(size=(100, 2)).astype(np.float32)
    info2 = np.asarray(edge_information_2d(jnp.array(t), jnp.array(m2),
                                           jnp.array(w)))
    assert info[0, 0] > info2[0, 0]


def test_icp_fit_while_loop_bit_identical():
    """cfg.loop="while" (batch early exit) must match the fixed scan
    bit-for-bit on the points matcher too."""
    import dataclasses
    import jax
    from slam_tpu.config import sim2d_config
    key = jax.random.PRNGKey(3)
    model = jax.random.uniform(key, (300, 2), minval=-4, maxval=4)
    theta, t = 0.12, jnp.array([0.3, -0.2])
    R = jnp.array([[jnp.cos(theta), -jnp.sin(theta)],
                   [jnp.sin(theta), jnp.cos(theta)]])
    scene = (model - t) @ R  # inverse transform
    ga = jnp.zeros(300, bool)
    valid = jnp.ones(300, bool)
    outs = {}
    for loop in ("scan", "while"):
        cfg = dataclasses.replace(sim2d_config().icp, loop=loop)
        r = icp_fit(scene, valid, ga, model, valid, ga,
                    jnp.zeros(3), cfg)
        outs[loop] = (r.pose, r.num_corr, r.delta, r.mean_residual)
    for a, b in zip(outs["scan"], outs["while"]):
        assert jnp.array_equal(a, b)


def test_ok_false_when_no_class_participates():
    """Size gates pass but every scene class has <= 3 model points -> zero
    correspondences ever. ok must be False (failed registration) so the EKF
    skips the update — same contract as the fused kernels and the grid
    matcher (which AND num_corr > 0)."""
    import dataclasses
    from slam_tpu.config import IcpConfig
    cfg = IcpConfig(max_points=64, min_scene_points=5, max_iterations=5)
    rng = np.random.RandomState(0)
    # scene: 6 GA points; model: 20 NGA + only 2 GA (participation off)
    sxy = jnp.asarray(rng.uniform(-3, 3, (6, 2)).astype(np.float32))
    s_ga = jnp.ones(6, bool)
    mxy = jnp.asarray(rng.uniform(-3, 3, (22, 2)).astype(np.float32))
    m_ga = jnp.arange(22) < 2
    for loop in ("scan", "while"):
        r = icp_fit(sxy, jnp.ones(6, bool), s_ga, mxy, jnp.ones(22, bool),
                    m_ga, jnp.zeros(3), dataclasses.replace(cfg, loop=loop))
        assert int(r.num_corr) == 0
        assert not bool(r.ok), loop
