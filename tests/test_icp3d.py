"""3D point-to-point ICP (ops/icp3d.py) — the keyframe-edge registration
engine of the 6-DoF graph chain (calcEdgeIcp, graphSlamTools.cpp:241-298)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import IcpConfig
from slam_tpu.geometry import rot3_from_rpy
from slam_tpu.ops.icp3d import icp3d_fit


def _mixed_problem(seed=0, n_obst=128, n_ground=256):
    """Obstacle scatter + smooth ground surface, transformed by a known
    SE(3)."""
    rng = np.random.RandomState(seed)
    obst = rng.uniform(-10, 10, (n_obst, 3)).astype(np.float32)
    gxy = rng.uniform(-10, 10, (n_ground, 2)).astype(np.float32)
    gz = 0.3 * np.sin(0.2 * gxy[:, 0]) + 0.2 * np.cos(0.15 * gxy[:, 1])
    ground = np.concatenate([gxy, gz[:, None]], -1).astype(np.float32)
    model = np.concatenate([obst, ground])
    cls = np.concatenate([rng.randint(0, 2, n_obst),
                          np.full(n_ground, 2)]).astype(np.int32)
    R = np.asarray(rot3_from_rpy(0.03, -0.05, 0.2), np.float32)
    t = np.array([0.5, -0.3, 0.15], np.float32)
    scene = (model - t) @ R  # p_scene = R^T (p_model - t)
    valid = np.ones(len(model), bool)
    return (jnp.asarray(scene), jnp.asarray(valid), jnp.asarray(cls),
            jnp.asarray(model), jnp.asarray(R), jnp.asarray(t))


def test_exact_recovery_mixed_classes():
    scene, valid, cls, model, R_true, t_true = _mixed_problem()
    cfg = IcpConfig(max_iterations=40, inlier_dist=2.0, min_scene_points=5)
    res = icp3d_fit(scene, valid, cls, model, valid, cls,
                    jnp.zeros(3), jnp.eye(3), cfg)
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_true),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_true),
                               atol=1e-4)


def test_ground_only_constrains_z_not_xy():
    """Pure-ground problems must fix z (and attitude) without inventing an
    x/y correction — the point-to-plane split (fit_step_3d stage 2).

    A flat ground plane displaced by (dx, dy, dz): point-to-point matching
    of a self-similar surface would pull x/y; the split solve must recover
    dz and leave x/y at the init."""
    rng = np.random.RandomState(1)
    gxy = rng.uniform(-10, 10, (512, 2)).astype(np.float32)
    model = np.concatenate([gxy, np.zeros((512, 1), np.float32)], -1)
    # scene = model shifted by (0.8, -0.6, 0.35) in world -> scene frame
    t_true = np.array([0.8, -0.6, 0.35], np.float32)
    scene = model - t_true
    cls = np.full(512, 2, np.int32)
    valid = jnp.ones(512, bool)
    cfg = IcpConfig(max_iterations=20, inlier_dist=4.0, min_scene_points=5)
    res = icp3d_fit(jnp.asarray(scene), valid, jnp.asarray(cls),
                    jnp.asarray(model), valid, jnp.asarray(cls),
                    jnp.zeros(3), jnp.eye(3), cfg)
    assert bool(res.ok)
    t = np.asarray(res.t)
    # z recovered; x/y untouched (stay at the 0 init — the surface can't
    # observe them, and the solver must not hallucinate them)
    assert abs(t[2] - 0.35) < 1e-3, t
    assert abs(t[0]) < 1e-3 and abs(t[1]) < 1e-3, t
    # no spurious attitude on a flat plane
    assert float(jnp.abs(res.R - jnp.eye(3)).max()) < 1e-3


def test_class_constraint_blocks_cross_matching():
    """Ground points must never match obstacle points: a scene with ONLY
    ground points against a model with ONLY obstacle points has zero legal
    correspondences -> registration fails (ok=False)."""
    rng = np.random.RandomState(2)
    scene = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
    model = rng.uniform(-5, 5, (128, 3)).astype(np.float32)
    s_cls = jnp.full(64, 2, jnp.int32)      # all ground
    m_cls = jnp.zeros(128, jnp.int32)       # all obstacle
    valid_s = jnp.ones(64, bool)
    valid_m = jnp.ones(128, bool)
    cfg = IcpConfig(max_iterations=10, inlier_dist=100.0, min_scene_points=5)
    res = icp3d_fit(jnp.asarray(scene), valid_s, s_cls,
                    jnp.asarray(model), valid_m, m_cls,
                    jnp.zeros(3), jnp.eye(3), cfg)
    assert not bool(res.ok)
    assert int(res.num_corr) == 0


def test_min_points_gate():
    """<5 scene points -> the failure sentinel (icpTools.cpp:179-184), init
    passes through unchanged."""
    scene = jnp.zeros((8, 3))
    valid = jnp.zeros(8, bool).at[:3].set(True)
    model = jnp.asarray(np.random.RandomState(3).uniform(-5, 5, (64, 3)),
                        dtype=jnp.float32)
    cls = jnp.zeros(8, jnp.int32)
    mcls = jnp.zeros(64, jnp.int32)
    cfg = IcpConfig(max_iterations=10, inlier_dist=2.0, min_scene_points=5)
    init_t = jnp.array([1.0, 2.0, 3.0])
    init_R = jnp.asarray(rot3_from_rpy(0.1, 0.2, 0.3))
    res = icp3d_fit(scene, valid, cls, model, jnp.ones(64, bool), mcls,
                    init_t, init_R, cfg)
    assert not bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(init_t))
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(init_R))


def test_vmap_batched_edges():
    """The graph vmaps edge measurements (pose_graph.add_keyframe) — the fit
    must produce identical results batched and unbatched."""
    probs = [_mixed_problem(seed=s, n_obst=64, n_ground=64) for s in (4, 5)]
    cfg = IcpConfig(max_iterations=25, inlier_dist=2.0, min_scene_points=5)
    singles = [icp3d_fit(p[0], p[1], p[2], p[3], p[1], p[2],
                         jnp.zeros(3), jnp.eye(3), cfg) for p in probs]
    stack = lambda i: jnp.stack([p[i] for p in probs])
    batched = jax.vmap(
        lambda s, v, c, m: icp3d_fit(s, v, c, m, v, c, jnp.zeros(3),
                                     jnp.eye(3), cfg))(
        stack(0), stack(1), stack(2), stack(3))
    for k, single in enumerate(singles):
        np.testing.assert_allclose(np.asarray(batched.t[k]),
                                   np.asarray(single.t), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batched.R[k]),
                                   np.asarray(single.R), atol=1e-5)
