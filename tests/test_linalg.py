"""Unrolled batched Cholesky/substitution vs numpy oracles — these carry the
GP-INSAC solve (ops/ground.py), so they must match the general solver."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops.linalg import (back_substitute, cholesky_unrolled,
                                 forward_substitute, spd_solve)


def _random_spd(rng, batch, C):
    A = rng.normal(size=batch + (C, C)).astype(np.float32)
    return A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(C, dtype=np.float32)


def test_cholesky_matches_numpy():
    rng = np.random.default_rng(0)
    M = _random_spd(rng, (4, 3), 16)
    L = np.asarray(cholesky_unrolled(jnp.array(M)))
    ref = np.linalg.cholesky(M.astype(np.float64))
    np.testing.assert_allclose(L, ref, rtol=2e-4, atol=2e-4)


def test_substitution_solves():
    rng = np.random.default_rng(1)
    M = _random_spd(rng, (5,), 24)
    R = rng.normal(size=(5, 24, 7)).astype(np.float32)
    Y = np.asarray(spd_solve(jnp.array(M), jnp.array(R)))
    ref = np.linalg.solve(M.astype(np.float64), R.astype(np.float64))
    np.testing.assert_allclose(Y, ref, rtol=1e-3, atol=1e-3)


def test_forward_back_are_triangular_solves():
    rng = np.random.default_rng(2)
    M = _random_spd(rng, (), 12)
    L = np.linalg.cholesky(M).astype(np.float32)
    R = rng.normal(size=(12, 4)).astype(np.float32)
    yf = np.asarray(forward_substitute(jnp.array(L), jnp.array(R)))
    np.testing.assert_allclose(L @ yf, R, rtol=1e-4, atol=1e-4)
    yb = np.asarray(back_substitute(jnp.array(L), jnp.array(R)))
    np.testing.assert_allclose(L.T @ yb, R, rtol=1e-4, atol=1e-4)


def test_masked_gp_system_matches_general_solve():
    """The exact system shape the INSAC sweep builds: kernel masked to the
    model set + noise, identity elsewhere."""
    rng = np.random.default_rng(3)
    S, C = 6, 32
    r = rng.uniform(0, 60, (S, C)).astype(np.float32)
    h = rng.normal(size=(S, C)).astype(np.float32) * 0.2
    mf = (rng.uniform(size=(S, C)) < 0.5).astype(np.float32)
    d = r[:, :, None] - r[:, None, :]
    K = np.exp(-(d * d) / 200.0).astype(np.float32)
    eye = np.eye(C, dtype=np.float32)
    M = K * mf[:, :, None] * mf[:, None, :] + 0.3 * mf[:, None, :] * eye \
        + (1.0 - mf)[:, None, :] * eye
    B = K * mf[:, None, :]
    rhs = np.concatenate([(h * mf)[:, :, None], np.swapaxes(B, 1, 2)], axis=2)

    L = cholesky_unrolled(jnp.array(M))
    Y = forward_substitute(L, jnp.array(rhs))
    w, Yb = Y[..., 0], Y[..., 1:]
    f = np.asarray(jnp.einsum("sjc,sj->sc", Yb, w))
    v = np.asarray(1.0 - jnp.sum(Yb * Yb, axis=1))

    sol = np.linalg.solve(M.astype(np.float64), rhs.astype(np.float64))
    f_ref = np.einsum("scj,sj->sc", B, sol[:, :, 0])
    v_ref = 1.0 - np.einsum("scj,sjc->sc", B, sol[:, :, 1:])
    np.testing.assert_allclose(f, f_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(v, v_ref, rtol=1e-4, atol=1e-4)


def test_blocked_matches_unrolled():
    """Blocked panel Cholesky/substitution vs the column-unrolled versions,
    including C not a multiple of the block and the eps-clamped degenerate
    (semi-definite) case."""
    from slam_tpu.ops.linalg import (back_substitute_blocked, cholesky_blocked,
                                     forward_substitute_blocked)
    rng = np.random.default_rng(7)
    for C in (8, 24, 40, 64):
        M = _random_spd(rng, (5,), C)
        R = rng.normal(size=(5, C, 9)).astype(np.float32)
        Lu = cholesky_unrolled(jnp.array(M))
        Lb = cholesky_blocked(jnp.array(M))
        np.testing.assert_allclose(np.asarray(Lb), np.asarray(Lu),
                                   rtol=1e-4, atol=1e-4)
        yf_u = np.asarray(forward_substitute(Lu, jnp.array(R)))
        yf_b = np.asarray(forward_substitute_blocked(Lb, jnp.array(R)))
        np.testing.assert_allclose(yf_b, yf_u, rtol=1e-4, atol=1e-4)
        yb_u = np.asarray(back_substitute(Lu, jnp.array(R)))
        yb_b = np.asarray(back_substitute_blocked(Lb, jnp.array(R)))
        np.testing.assert_allclose(yb_b, yb_u, rtol=1e-3, atol=1e-3)
    # semi-definite input: a single block must stay finite like the
    # unrolled path (values are garbage on BOTH paths past the rank, so
    # only finiteness is contractual; multi-block additionally documents a
    # strict-PD precondition — its panel update can overflow)
    v = rng.normal(size=(6, 1)).astype(np.float32)
    Msd = jnp.array(v @ v.T)
    assert np.isfinite(np.asarray(cholesky_unrolled(Msd))).all()
    assert np.isfinite(np.asarray(cholesky_blocked(Msd, block=8))).all()


def test_ground_blocked_solver_matches():
    """segment_ground with SLAM_TPU_GP_SOLVER=blocked reproduces the
    unrolled-solver labels and regression heights."""
    from unittest import mock

    from slam_tpu.config import GroundSegConfig
    from slam_tpu.ops import ground as gmod
    from slam_tpu.types import cloud_from_xyz
    from tests.test_ground import make_scene

    cfg = GroundSegConfig(num_sectors=24, num_range_bins=64,
                          signal_capacity=32, max_insac_sweeps=12)
    xyz, _ = make_scene(seed=5)
    cloud = cloud_from_xyz(jnp.array(xyz))
    r_u = jax.jit(lambda c: gmod.segment_ground(c, cfg))(cloud)
    with mock.patch.object(gmod, "GP_SOLVER", "blocked"):
        r_b = jax.jit(lambda c: gmod.segment_ground(c, cfg))(cloud)
    v_u, v_b = np.asarray(r_u.cloud.valid), np.asarray(r_b.cloud.valid)
    l_u = np.where(v_u, np.asarray(r_u.cloud.flags), -1)
    l_b = np.where(v_b, np.asarray(r_b.cloud.flags), -1)
    agree = (l_u == l_b).mean()
    assert agree > 0.999, f"only {agree:.4f} label agreement"
    np.testing.assert_allclose(np.asarray(r_b.f_s), np.asarray(r_u.f_s),
                               rtol=1e-3, atol=1e-3)


def test_inv3_matches_numpy():
    from slam_tpu.ops.linalg import inv3
    rng = np.random.default_rng(3)
    # SPD batch (the EKF innovation-covariance shape) + a generic batch
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    spd = A @ np.swapaxes(A, 1, 2) + 10.0 * np.eye(3, dtype=np.float32)
    got = np.asarray(inv3(jnp.array(spd)))
    ref = np.linalg.inv(spd.astype(np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    gen = A + 3.0 * np.eye(3, dtype=np.float32)
    got = np.asarray(inv3(jnp.array(gen)))
    ref = np.linalg.inv(gen.astype(np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
