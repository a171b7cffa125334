"""One-hot matmul roll vs jnp.roll (the dynamic-shift hot path of all
rolling-origin grids)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops.roll import roll_2d


def test_matches_jnp_roll_all_shifts():
    rng = np.random.default_rng(0)
    a = jnp.array(rng.normal(size=(16, 16, 3)).astype(np.float32))
    for d0 in (-20, -5, -1, 0, 1, 7, 16, 33):
        for d1 in (-3, 0, 2, 16):
            got = roll_2d(a, jnp.int32(d0), jnp.int32(d1))
            want = jnp.roll(a, shift=(-d0, -d1), axis=(0, 1))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                          err_msg=f"d=({d0},{d1})")


def test_int8_roundtrip_exact():
    rng = np.random.default_rng(1)
    a = jnp.array(rng.integers(-1, 2, (12, 12)).astype(np.int8))
    got = roll_2d(a, jnp.int32(5), jnp.int32(-2))
    want = jnp.roll(a, shift=(-5, 2), axis=(0, 1))
    assert got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_vmapped_per_robot_shifts():
    rng = np.random.default_rng(2)
    B = 6
    a = jnp.array(rng.normal(size=(B, 10, 10)).astype(np.float32))
    d0 = jnp.array(rng.integers(-9, 10, B), jnp.int32)
    d1 = jnp.array(rng.integers(-9, 10, B), jnp.int32)
    got = jax.jit(jax.vmap(roll_2d))(a, d0, d1)
    for b in range(B):
        want = jnp.roll(a[b], shift=(-int(d0[b]), -int(d1[b])), axis=(0, 1))
        np.testing.assert_array_equal(np.asarray(got[b]), np.asarray(want))
