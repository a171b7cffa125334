"""Box-sum stencils via banded matmuls.

The pad + 8-shifted-adds stencil pattern costs ~10 HBM passes over the grid
per use; a separable box filter is two matmuls with banded (G, G) matrices,
which the MXU executes in a fraction of the time at these sizes. Used by the
ground-adjacency rule (empty-neighbor counts), likelihood-field dilation, and
drivability neighbor checks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _band_np(n: int, radius: int):
    import numpy as np
    b = np.zeros((n, n), np.float32)
    for k in range(-radius, radius + 1):
        i = np.arange(max(0, -k), min(n, n - k))
        b[i, i + k] = 1.0
    return b


def _band(n: int, radius: int):
    # convert per call: caching jnp arrays leaks tracers across traces
    return jnp.asarray(_band_np(n, radius))


def box_sum_2d(x: jnp.ndarray, radius: int = 1,
               precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Sum over the (2r+1)^2 window (including self). x: (..., H, W).

    Pass precision=DEFAULT (single-pass bf16) when x is a 0/1 indicator
    raster: bf16 represents 0/1 exactly and the MXU accumulates in f32, so
    the window counts are exact at a third of the matmul cost. Keep HIGHEST
    for general float rasters (bf16 rounds the inputs)."""
    H, W = x.shape[-2:]
    bh = _band(H, radius)
    bw = _band(W, radius)
    y = jnp.einsum("ij,...jw->...iw", bh, x, precision=precision)
    return jnp.einsum("...iw,wk->...ik", y, bw, precision=precision)


def neighbor_sum_2d(x: jnp.ndarray, radius: int = 1,
                    precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Box sum excluding the center cell."""
    return box_sum_2d(x, radius, precision=precision) - x
