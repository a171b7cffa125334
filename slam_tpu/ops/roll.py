"""Dynamic 2D roll via one-hot permutation matmuls.

jnp.roll with a TRACED shift lowers to dynamic slices; under vmap with
per-robot shifts XLA unrolls those into tens of thousands of tiny slice ops
(~18 ms/step at batch 1024 on the rolling point map — 245k ops per block in
the profile). A roll is a permutation, and a permutation is a one-hot
matmul: two MXU passes per grid, <1 ms for the whole fleet, exact at
HIGHEST precision (each output element selects exactly one input).

Used by the rolling-origin shifts of the occupancy grid, the point-map
centroid store, and the MLS cluster banks (mls.h:87-96 shiftOrigin
semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roll_2d(a: jnp.ndarray, d0: jnp.ndarray, d1: jnp.ndarray) -> jnp.ndarray:
    """jnp.roll(a, shift=(-d0, -d1), axis=(0, 1)) for dynamic d0/d1:
    out[i, j, ...] = a[(i + d0) % G0, (j + d1) % G1, ...].

    a: (G0, G1, ...) with any trailing dims; vmap over robots for batched
    per-robot shifts. Integer inputs round-trip exactly (small-int values
    are exact in f32, and HIGHEST-precision one-hot matmuls add only
    zeros)."""
    G0, G1 = a.shape[0], a.shape[1]
    i0 = jnp.arange(G0)
    i1 = jnp.arange(G1)
    dt = a.dtype if jnp.issubdtype(a.dtype, jnp.floating) else jnp.float32
    P0 = (((i0[:, None] + d0) % G0) == i0[None, :]).astype(dt)   # (G0, G0)
    P1 = (((i1[:, None] + d1) % G1) == i1[None, :]).astype(dt)   # (G1, G1)
    flat = a.reshape(G0, G1, -1).astype(dt)
    t = jnp.einsum("ij,jkc->ikc", P0, flat,
                   precision=jax.lax.Precision.HIGHEST)
    t = jnp.einsum("kl,ilc->ikc", P1, t,
                   precision=jax.lax.Precision.HIGHEST)
    return t.reshape(a.shape).astype(a.dtype)


def shift_step(center, new_center_xy, resolution):
    """Quantized rolling-origin step shared by every rolling grid
    (occupancy.shift_origin, mls.shift_origin_mls, point_map.shift_point_map
    — MLS::setPose semantics, mls.cpp:408-479): returns (d, new_center)
    where d is the whole-cell shift round((new - center)/res)."""
    res = jnp.asarray(resolution, center.dtype)
    d = jnp.round((new_center_xy - center) / res).astype(jnp.int32)
    return d, center + d.astype(center.dtype) * res


def fresh_mask(d, H: int, W: int) -> jnp.ndarray:
    """(H, W) cells that wrapped IN after roll_2d(a, d0, d1) — their
    pre-shift index fell outside the window and they must be cleared
    (mls.cpp:457-468)."""
    ii = jnp.arange(H)[:, None]
    jj = jnp.arange(W)[None, :]
    return ((ii + d[0] < 0) | (ii + d[0] >= H) |
            (jj + d[1] < 0) | (jj + d[1] >= W))
