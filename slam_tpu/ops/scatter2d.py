"""2D grid scatter-add via one-hot matmuls — the MXU-friendly replacement for
jnp .at[].add scatters.

TPU scatter ops serialize (~35 ns/element); a scan's 512-point scatter into a
192^2 grid costs ~70 ms/step at batch 1024. The same accumulation factors
into two small matmuls per channel:

    out[i, j] = sum_n X[n, i] * v[n] * Y[n, j]
              = ((X * v).T @ Y)[i, j]
  with X = onehot(cx, H), Y = onehot(cy, W)

— ~19 MFLOP/robot/channel, which the MXU does in microseconds. Masked points
get all-zero one-hot rows AND zeroed values: a masked lane may carry NaN
coordinates (external dropouts), and 0 * NaN = NaN would otherwise poison
every cell of the product. Exact in f32 (the package forces matmul precision
highest; one-hot entries are exact 0/1).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _onehot(idx: jnp.ndarray, size: int, valid: jnp.ndarray) -> jnp.ndarray:
    """(N, size) f32 one-hot with invalid rows zeroed."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], size), 1)
    oh = (iota == idx[:, None]) & valid[:, None]
    return oh.astype(jnp.float32)


def scatter_add_2d(cx: jnp.ndarray, cy: jnp.ndarray, values: jnp.ndarray,
                   valid: jnp.ndarray, shape: tuple,
                   precision=jax.lax.Precision.DEFAULT) -> jnp.ndarray:
    """Accumulate per-point channel values into an (H, W, C) grid.

    cx, cy: (N,) int cell indices (any value; out-of-range must be masked by
    `valid`). values: (N, C). Returns (H, W, C) float32 sums.

    precision: DEFAULT (bf16 inputs, f32 accumulation) is exact for one-hot
    entries and small-integer/short-range values (counts, cell-relative
    offsets); pass HIGH when channel values need more than bf16's ~3 decimal
    digits (e.g. absolute world coordinates).
    """
    H, W = shape
    inb = valid & (cx >= 0) & (cy >= 0) & (cx < H) & (cy < W)
    X = _onehot(jnp.clip(cx, 0, H - 1), H, inb)           # (N, H)
    Y = _onehot(jnp.clip(cy, 0, W - 1), W, inb)           # (N, W)
    values = jnp.where(inb[:, None], values, 0.0)         # NaN-lane guard
    # out[i, j, c] = sum_n X[n,i] * values[n,c] * Y[n,j]
    XV = jnp.einsum("nh,nc->hcn", X, values, precision=precision)
    out = jnp.einsum("hcn,nw->hwc", XV, Y, precision=precision)
    return out


# one-hot scatters materialize an (N, H) + (N, W) transient and pay
# O(N*H*W) matmul FLOPs; beyond this N*max(H,W) budget the native serialized
# scatter (O(N) at ~35 ns/element) wins, and its transients stay O(N)
ONEHOT_SCATTER_LIMIT = 1 << 22

# what impl="auto" resolves to beyond the limit: "native" (serialized O(N)
# scatter) or "chunked" (one-hot matmuls streamed over N-chunks — keeps the
# MXU path at reference scan sizes at O(chunk*(H+W)) transients). Env-gated
# so the two engines can be A/B'd through the real pipeline per process.
LARGE_N_IMPL = os.environ.get("SLAM_TPU_LARGE_SCATTER", "native")


def scatter_add_2d_native(cx: jnp.ndarray, cy: jnp.ndarray, values: tuple,
                          valid: jnp.ndarray, shape: tuple) -> tuple:
    """Reference-scale planar scatter-add: native .at[].add into a flat
    (H*W + 1,) buffer (invalid points dump into the trailing slot). O(N)
    work/memory vs the one-hot path's O(N*(H+W)) transients — the right
    trade at 20k+ point scans (pointcloud_filter.cpp:290 gates >=30k)."""
    H, W = shape
    inb = valid & (cx >= 0) & (cy >= 0) & (cx < H) & (cy < W)
    flat = jnp.where(inb, cx * W + cy, H * W)
    # per-channel 1-D scatters beat one (N, C) row scatter on v5e: measured
    # 14.5 vs 19.9 ms/call at (16, 20480, 5) into 384^2 — the row variant's
    # lane-padded (N, C->128) updates cost more than C index walks
    outs = []
    for v in values:
        vv = jnp.where(inb, 1.0 if v is None else v, 0.0).astype(jnp.float32)
        acc = jnp.zeros((H * W + 1,), jnp.float32).at[flat].add(vv)
        outs.append(acc[:H * W].reshape(H, W))
    return tuple(outs)


def scatter_add_2d_chunked(cx: jnp.ndarray, cy: jnp.ndarray, values: tuple,
                           valid: jnp.ndarray, shape: tuple,
                           precision=jax.lax.Precision.DEFAULT,
                           precisions: tuple | None = None,
                           chunk: int = 2048) -> tuple:
    """One-hot matmul scatter streamed over N-chunks: keeps the MXU path at
    reference scan sizes where a whole-N one-hot would be an O(N*(H+W))
    transient. Exact like the one-hot path (0/1 entries, f32 accumulate).

    precisions: optional per-channel overrides, same contract as
    scatter_add_2d_multi (absolute-coordinate channels need more than
    DEFAULT's bf16 inputs)."""
    H, W = shape
    N = cx.shape[0]
    nc = -(-N // chunk)
    pad = nc * chunk - N
    cxp = jnp.pad(cx, (0, pad))
    cyp = jnp.pad(cy, (0, pad))
    vp = jnp.pad(valid, (0, pad))
    vals = tuple(None if v is None else jnp.pad(v, (0, pad)) for v in values)

    def body(i, accs):
        sl = jax.lax.dynamic_slice_in_dim
        cxc = sl(cxp, i * chunk, chunk)
        cyc = sl(cyp, i * chunk, chunk)
        vc = sl(vp, i * chunk, chunk)
        inb = vc & (cxc >= 0) & (cyc >= 0) & (cxc < H) & (cyc < W)
        X = _onehot(jnp.clip(cxc, 0, H - 1), H, inb)
        Y = _onehot(jnp.clip(cyc, 0, W - 1), W, inb)
        out = []
        for k, (a, v) in enumerate(zip(accs, vals)):
            p = precision if precisions is None or precisions[k] is None \
                else precisions[k]
            if v is None:
                Xv = X
            else:
                vc2 = jnp.where(inb, sl(v, i * chunk, chunk), 0.0)
                Xv = X * vc2[:, None]                     # NaN-lane guard
            out.append(a + jnp.einsum("nh,nw->hw", Xv, Y, precision=p))
        return tuple(out)

    init = tuple(jnp.zeros((H, W), jnp.float32) for _ in values)
    return jax.lax.fori_loop(0, nc, body, init)


def scatter_add_2d_multi(cx: jnp.ndarray, cy: jnp.ndarray, values: tuple,
                         valid: jnp.ndarray, shape: tuple,
                         precision=jax.lax.Precision.DEFAULT,
                         precisions: tuple | None = None,
                         impl: str = "auto") -> tuple:
    """Planar scatter-add: per-channel (N,) value planes -> tuple of (H, W)
    grids. Same one-hot factorization as scatter_add_2d, but channels never
    stack into an (N, C) array (whose minor dim XLA lane-pads to 128) — each
    channel is one (H, N) @ (N, W) matmul on clean rank-2 operands. Pass
    `None` as a channel for a pure count (skips the value multiply).

    precisions: optional per-channel precision overrides (None entries fall
    back to `precision`) — absolute-coordinate channels (e.g. world z) need
    more than DEFAULT's bf16 inputs.

    impl: "onehot" (MXU matmuls, exact at f32), "native" (serialized TPU
    scatter, O(N), f32), "chunked" (streamed one-hot), or "auto" — one-hot
    until N*max(H,W) exceeds ONEHOT_SCATTER_LIMIT, LARGE_N_IMPL beyond
    (reference-scale scans)."""
    H, W = shape
    if impl == "auto":
        impl = (LARGE_N_IMPL if cx.shape[0] * max(H, W) > ONEHOT_SCATTER_LIMIT
                else "onehot")
    if impl == "native":
        return scatter_add_2d_native(cx, cy, values, valid, shape)
    if impl == "chunked":
        return scatter_add_2d_chunked(cx, cy, values, valid, shape,
                                      precision=precision,
                                      precisions=precisions)
    inb = valid & (cx >= 0) & (cy >= 0) & (cx < H) & (cy < W)
    X = _onehot(jnp.clip(cx, 0, H - 1), H, inb)           # (N, H)
    Y = _onehot(jnp.clip(cy, 0, W - 1), W, inb)           # (N, W)
    outs = []
    for i, v in enumerate(values):
        p = precision if precisions is None or precisions[i] is None \
            else precisions[i]
        Xv = X if v is None else X * jnp.where(inb, v, 0.0)[:, None]
        outs.append(jnp.einsum("nh,nw->hw", Xv, Y, precision=p))
    return tuple(outs)


def gather_cells_2d(grids: jnp.ndarray, ci: jnp.ndarray, cj: jnp.ndarray,
                    precision=jax.lax.Precision.DEFAULT,
                    impl: str = "auto") -> jnp.ndarray:
    """Gather per-cell channel vectors grids[ci[n], cj[n], :] -> (N, C) via
    one-hot matmuls — TPU native gathers cost ~20 ns/element (a 512-point
    export gathered 4 channels for ~42 ms/step at batch 1024); as matmuls
    the MXU does it in a few ms. grids: (H, W, C). Beyond
    ONEHOT_SCATTER_LIMIT (N*max(H,W)) the per-channel native flat gather is
    cheaper (O(N*C)) than the one-hot transients — impl="auto" switches."""
    H, W, C = grids.shape
    N = ci.shape[0]
    if impl == "auto":
        impl = ("native" if N * max(H, W) > ONEHOT_SCATTER_LIMIT
                else "onehot")
    ci = jnp.clip(ci, 0, H - 1)
    cj = jnp.clip(cj, 0, W - 1)
    if impl == "native":
        # one (N, C) row gather — C separate 1-D gathers serialize the index
        # walk C times (ground.py measured 4.1 ms vs 6.2 ms for its 5-table
        # case at (16, 20480) on v5e)
        flat = ci * W + cj
        return grids.reshape(H * W, C)[flat]
    X = _onehot(ci, H, jnp.ones(N, bool))   # (N, H)
    Y = _onehot(cj, W, jnp.ones(N, bool))   # (N, W)
    A = jnp.einsum("nh,hwc->nwc", X, grids, precision=precision)
    return jnp.einsum("nwc,nw->nc", A, Y, precision=precision)


def scatter_max_2d(cx, cy, values, valid, shape):
    """(H, W) max of per-point scalars; cells no point touches read 0.0
    (for 'touched' style flags use values=1.0 and compare > 0)."""
    H, W = shape
    inb = valid & (cx >= 0) & (cy >= 0) & (cx < H) & (cy < W)
    flat = jnp.where(inb, cx * W + cy, H * W)
    neg = jnp.finfo(jnp.float32).min
    vv = jnp.where(inb, values, neg).astype(jnp.float32)
    acc = jnp.full((H * W + 1,), neg, jnp.float32).at[flat].max(vv)
    out = acc[:H * W].reshape(H, W)
    return jnp.where(out == neg, 0.0, out)
