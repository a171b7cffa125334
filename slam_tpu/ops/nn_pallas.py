"""Pallas TPU kernel: fused class-constrained nearest-neighbor search.

The jnp path (ops/nn.py) materializes the (S, C) distance matrix in HBM —
at ICP's 20 iterations that traffic dominates the whole SLAM step. This
kernel tiles queries into VMEM, forms the distance tile against the full
model set, applies validity/class penalties, and reduces to (index,
distance) in-register — HBM sees only the coordinate planes and the (S,)
outputs.

Layout: coordinates are passed as separate planes, queries shaped (B, S, 1)
(sublane-major) and model points (B, 1, C) (lane-major), so the (TQ, C)
distance tile is a pure broadcast — no in-kernel transposes/relayouts (a
(C, 2)-shaped model block forces lane<->sublane relayouts that blow VMEM).

Batching: the robot batch is a leading *grid* dimension (one robot per grid
step), wired to jax.vmap through a custom_vmap rule — the default pallas
batching rule folds the whole batch into one kernel instance and spills
VMEM (observed: 299 MB spill for batch 1024).

Semantics identical to ops.nn.nearest_neighbor (squared distances, BIG
penalty on invalid/cross-class pairs). Falls back to the jnp path off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_tpu.ops import nn as nn_jnp

BIG = 1e30


def _nn_kernel(qx_ref, qy_ref, qc_ref, mx_ref, my_ref, mc_ref,
               idx_ref, dist_ref):
    """One grid step: R robots' full query sets vs their model sets.

    qx/qy/qc: (R, S, 1)  query coords + class (-1 pad / 0 / 1)
    mx/my/mc: (R, 1, C)  model coords + class (2 == invalid)
    idx_ref/dist_ref: (R, S, 1)

    Multiple robots per grid step amortize the per-step dispatch overhead
    (measured ~5 us/step: at 1 robot/step a 1024-robot batch spent 10 ms on
    overhead alone).
    """
    dx = qx_ref[:] - mx_ref[:]        # (R, S, C) pure broadcast
    dy = qy_ref[:] - my_ref[:]
    d2 = dx * dx + dy * dy
    bad = (mc_ref[:] >= 2.0) | (qc_ref[:] != mc_ref[:])
    d2 = jnp.where(bad, BIG + d2, d2)

    idx_ref[:] = jnp.argmin(d2, axis=2, keepdims=True).astype(jnp.int32)
    dist_ref[:] = jnp.min(d2, axis=2, keepdims=True)


@functools.partial(jax.jit, static_argnames=())
def _nn_batched(qx, qy, qc, mx, my, mc):
    """qx/qy/qc: (B, S), mx/my/mc: (B, C)."""
    B, S = qx.shape
    C = mx.shape[1]
    # robots per grid step: Mosaic keeps ~4.4 (R, S, C) f32 arrays live in
    # the kernel (measured from a compile-time scoped-vmem OOM at S=384,
    # C=512: 83.04MB at R=25 = 3.48MB/robot); budget 6 arrays for headroom.
    # Default scoped limit is 16MB, raised to VMEM_LIMIT below.
    VMEM_LIMIT = 64 << 20
    per_robot = S * C * 4 * 6
    R = max(1, min(B, (VMEM_LIMIT * 9 // 10) // per_robot))
    num_steps = (B + R - 1) // R
    padb = num_steps * R - B

    def prep_q(a, fill=0.0):
        return jnp.pad(a, ((0, padb), (0, 0)),
                       constant_values=fill)[..., None]      # (B', S, 1)

    def prep_m(a, fill=2.0):
        return jnp.pad(a, ((0, padb), (0, 0)),
                       constant_values=fill)[:, None, :]     # (B', 1, C)

    qs = [prep_q(qx), prep_q(qy), prep_q(qc, fill=-1.0)]
    ms = [prep_m(mx, 0.0), prep_m(my, 0.0), prep_m(mc, 2.0)]

    q_spec = pl.BlockSpec((R, S, 1), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((R, 1, C), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((R, S, 1), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)

    idx, dist = pl.pallas_call(
        _nn_kernel,
        grid=(num_steps,),
        in_specs=[q_spec, q_spec, q_spec, m_spec, m_spec, m_spec],
        out_specs=[o_spec, o_spec],
        out_shape=[
            jax.ShapeDtypeStruct((num_steps * R, S, 1), jnp.int32),
            jax.ShapeDtypeStruct((num_steps * R, S, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(*qs, *ms)
    return idx[:B, :, 0], dist[:B, :, 0]


def _split(q, m, m_valid, q_class, m_class):
    qc = q_class.astype(jnp.float32)
    mc = jnp.where(m_valid, m_class.astype(jnp.float32), 2.0)
    return (q[..., 0], q[..., 1], qc, m[..., 0], m[..., 1], mc)


@jax.custom_batching.custom_vmap
def nearest_neighbor_pallas(q, m, m_valid, q_class, m_class):
    """Drop-in for ops.nn.nearest_neighbor on TPU. q: (S, 2), m: (C, 2)."""
    parts = [a[None] for a in _split(q, m, m_valid, q_class, m_class)]
    idx, dist = _nn_batched(*parts)
    return idx[0], dist[0]


@nearest_neighbor_pallas.def_vmap
def _nn_vmap_rule(axis_size, in_batched, q, m, m_valid, q_class, m_class):
    def bcast(x, batched):
        return x if batched else jnp.broadcast_to(x[None],
                                                  (axis_size,) + x.shape)

    q = bcast(q, in_batched[0])
    m = bcast(m, in_batched[1])
    m_valid = bcast(m_valid, in_batched[2])
    q_class = bcast(q_class, in_batched[3])
    m_class = bcast(m_class, in_batched[4])
    idx, dist = _nn_batched(*_split(q, m, m_valid, q_class, m_class))
    return (idx, dist), (True, True)


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# Largest (S, C) problem routed to the VMEM-resident kernel: the kernel
# materializes ~6 (R, S, C) f32 arrays, so past this the per-robot tile
# cannot fit even at R=1 (the reloc ICP polish matches a 4k scene against
# a 40k map: 671 MB — register-spill OOM at compile). Beyond it, the
# query-tiled XLA path streams (chunk, C) tiles through HBM instead.
RESIDENT_NN_LIMIT = 2_500_000


def nearest_neighbor(q, m, m_valid, q_class=None, m_class=None):
    """Backend-dispatching NN: Pallas on TPU (query-tiled XLA fallback for
    problems too large for VMEM residency), jnp elsewhere.

    The TPU kernel is 2D-only; higher-D inputs raise LOUDLY here rather
    than silently matching on x/y alone while the jnp fallback uses all
    coordinates (backend-dependent correspondences). The class constraint
    needs BOTH class planes (the jnp path applies it only then); one-sided
    classes are normalized to unconstrained on both backends."""
    if q_class is None or m_class is None:
        q_class = m_class = None
    if on_tpu() and q.shape[-2] * m.shape[-2] > RESIDENT_NN_LIMIT:
        return nn_jnp.nearest_neighbor_tiled(q, m, m_valid, q_class,
                                             m_class)
    if on_tpu():
        if q.shape[-1] != 2 or m.shape[-1] != 2:
            raise ValueError(
                f"TPU NN kernel is 2D-only (got q D={q.shape[-1]}, "
                f"m D={m.shape[-1]}); use ops.nn.nearest_neighbor for 3D")
        if q_class is None:
            q_class = jnp.zeros(q.shape[:-1], jnp.int32)
            m_class = jnp.zeros(m.shape[:-1], jnp.int32)
        return nearest_neighbor_pallas(q, m, m_valid, q_class, m_class)
    return nn_jnp.nearest_neighbor(q, m, m_valid, q_class, m_class)
