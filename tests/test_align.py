"""Rigid landmark alignment (ops/align.py) — the reference's MATLAB
rigid_transform_3D.m / calcTransform.m and global_transform.cpp roles."""

import jax.numpy as jnp
import numpy as np

from slam_tpu.ops.align import apply_se2_to_cloud, rigid_transform_3d


def _rot(yaw, pitch=0.3, roll=-0.2):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cr, sr = np.cos(roll), np.sin(roll)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def test_recovers_known_transform():
    rng = np.random.default_rng(0)
    a = rng.uniform(-10, 10, (25, 3)).astype(np.float32)
    R = _rot(1.1).astype(np.float32)
    t = np.array([3.0, -2.0, 0.7], np.float32)
    b = a @ R.T + t
    res = rigid_transform_3d(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-3)
    assert float(res.rmse) < 1e-3
    assert abs(float(jnp.linalg.det(res.R)) - 1.0) < 1e-5


def test_reflection_corrected_and_weights_ignore_outlier():
    rng = np.random.default_rng(1)
    a = rng.uniform(-5, 5, (12, 3)).astype(np.float32)
    R = _rot(-2.3).astype(np.float32)
    b = a @ R.T + np.array([0.5, 0.5, -1.0], np.float32)
    b[0] += 40.0                   # gross outlier
    w = np.ones(12, np.float32)
    w[0] = 0.0                     # ...down-weighted away
    res = rigid_transform_3d(jnp.asarray(a), jnp.asarray(b), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-4)
    assert float(res.rmse) < 1e-3  # weighted rmse excludes the outlier
    assert abs(float(jnp.linalg.det(res.R)) - 1.0) < 1e-5  # no reflection


def test_apply_se2_matches_rigid_recovery():
    """A cloud moved by apply_se2_to_cloud must be recovered by
    rigid_transform_3d as that exact planar transform."""
    rng = np.random.default_rng(2)
    xyz = rng.uniform(-8, 8, (30, 3)).astype(np.float32)
    moved = apply_se2_to_cloud(jnp.asarray(xyz), 2.0, -1.5, 0.8)
    res = rigid_transform_3d(jnp.asarray(xyz), moved)
    assert abs(float(res.t[0]) - 2.0) < 1e-3
    assert abs(float(res.t[1]) + 1.5) < 1e-3
    assert abs(float(res.t[2])) < 1e-3
    yaw = float(jnp.arctan2(res.R[1, 0], res.R[0, 0]))
    assert abs(yaw - 0.8) < 1e-4
    assert float(res.rmse) < 1e-4


def test_ate_aligned_removes_static_frame_offset():
    """ate_aligned (standard Sturm-style ATE): a trajectory reported in a
    rigidly offset frame — exactly what a frozen early map anchor produces —
    must score ~its noise level after alignment, while raw ATE charges the
    full offset at every step."""
    import numpy as np

    from slam_tpu.pipeline.slam2d import ate, ate_aligned

    rng = np.random.default_rng(0)
    t = np.linspace(0, 6, 80)
    true = np.stack([3 * np.cos(t), 2 * np.sin(1.3 * t)], -1)
    th, off = 0.02, np.array([0.05, -0.03])   # static frame offset
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    est = true @ R.T + off + rng.normal(0, 0.002, true.shape)

    raw = float(ate(jnp.asarray(est), jnp.asarray(true)))
    aligned = float(ate_aligned(jnp.asarray(est), jnp.asarray(true)))
    assert raw > 0.05, raw                     # the offset dominates raw
    assert aligned < 0.004, aligned            # alignment leaves only noise
    # identity case: alignment of an already-aligned trajectory is a no-op
    same = float(ate_aligned(jnp.asarray(true), jnp.asarray(true)))
    assert same < 1e-5
