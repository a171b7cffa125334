"""Fully-fused class-constrained ICP as one Pallas TPU kernel.

One kernel launch runs the reference's whole Icp::fit loop (icp.cpp:80-122:
<=20 iterations of correspondence + weighted Kabsch + convergence gate) for
one robot per grid step. The scene (S,) planes, model (C,) planes, and the
(S, C) distance tile live in VMEM for the entire loop — iterating in XLA
instead costs a full HBM round-trip of the distance tile per iteration
(measured: 433 ms/step at batch 1024, ~60% of the whole SLAM tick).

Kabsch is computed from raw moments of the correspondence tile:
  u[q, c] = 1/|ties| for c among q's nearest inlier model points
  W = sum_q w_q,  mu_q = sum w_q q / W,  mu_m = sum_{qc} u m / W
  H = sum_{qc} u (q - mu_q)(m - mu_m)^T = S_qm - W mu_q mu_m^T
  dyaw = atan2(H01 - H10, H00 + H11)        (2D closed form)
so no argmin/gather is needed — ties average the tied model points (the
reference takes the KD-tree's first hit; with voxelized maps exact ties are
measure-zero and the fixed point is identical).

Semantics otherwise match ops.icp.icp_fit: squared-distance inlier gate,
class participation only when the model has >3 points of that class,
no-correspondence freeze (delta = -1), min_delta convergence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_tpu.config import IcpConfig
from slam_tpu.ops.icp import IcpResult

BIG = 1e30


def _icp_kernel(max_iter: int, inlier_dist: float, min_delta: float,
                min_scene: int, s_ref, m_ref, init_ref, out_ref):
    """s_ref: (1, S, 3) = [x, y, class(-1 pad/0 NGA/1 GA)];
    m_ref: (1, C, 3) = [x, y, class(0/1, 2=invalid)].

    Whole-array operands avoid host-side plane extraction: slicing columns
    of (N, 3) arrays in XLA relayouts them into linear-tiled pallas operands
    (~11 ms per plane per step at batch 1024). Columns are sliced in VMEM;
    the model columns transpose to lane vectors once, amortized over all
    iterations."""
    sx = s_ref[0][:, 0:1]     # (S, 1)
    sy = s_ref[0][:, 1:2]
    sc = s_ref[0][:, 2:3]     # class: -1 pad/invalid, 0 NGA, 1 GA
    mx = jnp.transpose(m_ref[0][:, 0:1])   # (1, C)
    my = jnp.transpose(m_ref[0][:, 1:2])
    mc = jnp.transpose(m_ref[0][:, 2:3])   # class: 0/1, 2 = invalid
    _icp_core(max_iter, inlier_dist, min_delta, min_scene,
              sx, sy, sc, mx, my, mc, init_ref, out_ref)


def _icp_kernel_planes(max_iter: int, inlier_dist: float, min_delta: float,
                       min_scene: int, sx_ref, sy_ref, sc_ref,
                       mx_ref, my_ref, mc_ref, init_ref, out_ref):
    """Plane operands: scene/model coordinates arrive as six (1, N) rows —
    the layouts XLA stores (B, N) arrays in natively, so no packed (B, N, 3)
    arrays (lane-padded 42x in HBM) are ever materialized, and the model rows
    are already the (1, C) lane vectors the distance tile wants (zero
    in-kernel transposes on the large side; the three scene rows transpose
    to (S, 1) columns once per call)."""
    sx = jnp.transpose(sx_ref[0])    # (1, S) -> (S, 1)
    sy = jnp.transpose(sy_ref[0])
    sc = jnp.transpose(sc_ref[0])
    _icp_core(max_iter, inlier_dist, min_delta, min_scene,
              sx, sy, sc, mx_ref[0], my_ref[0], mc_ref[0],
              init_ref, out_ref)


def _icp_core(max_iter: int, inlier_dist: float, min_delta: float,
              min_scene: int, sx, sy, sc, mx, my, mc, init_ref, out_ref):
    """Shared fit loop: sx/sy/sc are (S, 1) columns, mx/my/mc (1, C) rows."""
    m_ga = jnp.sum(jnp.where(mc == 1.0, 1.0, 0.0))
    m_nga = jnp.sum(jnp.where(mc == 0.0, 1.0, 0.0))
    n_scene = jnp.sum(jnp.where(sc >= 0.0, 1.0, 0.0))
    ok = (n_scene >= min_scene) & (m_ga + m_nga >= 5.0)

    # masks kept as f32 (0/1): vector bool casts hit Mosaic lowering bugs
    class_on = jnp.where(sc == 1.0,
                         jnp.where(m_ga > 3.0, 1.0, 0.0),
                         jnp.where(m_nga > 3.0, 1.0, 0.0))
    participate = jnp.where(sc >= 0.0, 1.0, 0.0) * class_on   # (S, 1)
    pair_ok = jnp.where(sc == mc, 1.0, 0.0) * \
        jnp.where(mc >= 2.0, 0.0, 1.0)                        # (S, C)
    penalty = (1.0 - pair_ok) * BIG  # loop-invariant: hoisted off the tile

    # rotation carried as a (cos, sin) pair: Mosaic has no scalar atan2/trig,
    # and Kabsch only needs the normalized (H00+H11, H01-H10) direction
    def body(i, carry):
        tx, ty, cth, sth, converged, ncorr, mres, delta = carry
        qx = cth * sx - sth * sy + tx               # (S, 1)
        qy = sth * sx + cth * sy + ty
        dx = qx - mx                                 # (S, C)
        dy = qy - my
        d2 = dx * dx + dy * dy + penalty
        rowmin = jnp.min(d2, axis=1, keepdims=True)  # (S, 1)
        w = participate * jnp.where(rowmin < inlier_dist, 1.0, 0.0)  # (S, 1)
        sel = jnp.where(d2 <= rowmin, 1.0, 0.0) * w  # ties included
        nt = jnp.sum(sel, axis=1, keepdims=True)
        # row-sum factorization: every Kabsch moment needs only the per-row
        # tie-averaged model point (ux, uy) = sum_c u[:, c] * (mx, my)[c], so
        # the (S, C) tile is touched by exactly three multiply-rowsum passes;
        # the H cross-moments then reduce (S, 1) columns. Algebraically
        # identical to the full-tile form (sum_qc u q m^T = sum_q q (u m)_q).
        inv_nt = 1.0 / jnp.maximum(nt, 1.0)
        ux = jnp.sum(sel * mx, axis=1, keepdims=True) * inv_nt   # (S, 1)
        uy = jnp.sum(sel * my, axis=1, keepdims=True) * inv_nt

        W = jnp.sum(w)
        Ws = jnp.maximum(W, 1e-12)
        mqx = jnp.sum(w * qx) / Ws
        mqy = jnp.sum(w * qy) / Ws
        # rows with w == 0 have sel == 0 hence ux = uy = 0: they drop out of
        # the sums exactly as the zero rows of u did
        mmx = jnp.sum(ux) / Ws
        mmy = jnp.sum(uy) / Ws
        H00 = jnp.sum(qx * ux) - W * mqx * mmx
        H01 = jnp.sum(qx * uy) - W * mqx * mmy
        H10 = jnp.sum(qy * ux) - W * mqy * mmx
        H11 = jnp.sum(qy * uy) - W * mqy * mmy
        a = H00 + H11
        b = H01 - H10
        rn = jax.lax.rsqrt(jnp.maximum(a * a + b * b, 1e-24))
        c_ = a * rn
        s_ = b * rn
        t_x = mmx - (c_ * mqx - s_ * mqy)
        t_y = mmy - (s_ * mqx + c_ * mqy)

        ntx = c_ * tx - s_ * ty + t_x
        nty = s_ * tx + c_ * ty + t_y
        ncth = c_ * cth - s_ * sth
        nsth = s_ * cth + c_ * sth
        rnorm = jax.lax.rsqrt(jnp.maximum(ncth * ncth + nsth * nsth, 1e-24))
        ncth = ncth * rnorm
        nsth = nsth * rnorm
        frob = jnp.sqrt(jnp.maximum(4.0 - 4.0 * c_, 0.0))
        d = jnp.maximum(frob, jnp.sqrt(t_x * t_x + t_y * t_y))
        has_corr = W > 0.0
        d = jnp.where(has_corr, d, -1.0)
        new_mres = jnp.sum(w * rowmin) / Ws

        upd = ~converged
        go = upd & has_corr
        tx = jnp.where(go, ntx, tx)
        ty = jnp.where(go, nty, ty)
        cth = jnp.where(go, ncth, cth)
        sth = jnp.where(go, nsth, sth)
        ncorr = jnp.where(upd, W, ncorr)
        mres = jnp.where(upd, new_mres, mres)
        delta = jnp.where(upd, d, delta)
        converged = converged | (d < min_delta)
        return tx, ty, cth, sth, converged, ncorr, mres, delta

    init = (jnp.int32(0), init_ref[0, 0, 0], init_ref[0, 0, 1],
            init_ref[0, 0, 2], init_ref[0, 0, 3],
            ~ok, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(jnp.inf))

    def cond(carry):
        i, *_, converged, _n, _m, _d = carry
        return (i < max_iter) & ~converged

    def wbody(carry):
        i = carry[0]
        out = body(i, carry[1:])
        return (i + 1,) + out

    # while_loop: converged robots skip remaining iterations entirely
    # (fitIterate's early break, icp.cpp:119-121) — typical convergence is
    # 5-10 iterations, halving the kernel's work vs a fixed fori_loop
    _, tx, ty, cth, sth, _, ncorr, mres, delta = jax.lax.while_loop(
        cond, wbody, init)
    tx = jnp.where(ok, tx, init_ref[0, 0, 0])
    ty = jnp.where(ok, ty, init_ref[0, 0, 1])
    cth = jnp.where(ok, cth, init_ref[0, 0, 2])
    sth = jnp.where(ok, sth, init_ref[0, 0, 3])
    out_ref[:] = jnp.stack([
        tx, ty, cth, sth,
        jnp.where(ok, 1.0, 0.0), ncorr, mres, delta,
    ])[None, None, :]


# scalar blocks must be 3D: only the last two block dims are constrained
# (divisible by (8,128) or equal to the array dims)
def _scalar_spec(n, space):
    return pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0), memory_space=space)


def _pack_init4(init):
    """(B, 3) [x, y, yaw] -> (B, 1, 4) [x, y, cos, sin] SMEM operand."""
    return jnp.stack([init[:, 0], init[:, 1],
                      jnp.cos(init[:, 2]), jnp.sin(init[:, 2])],
                     axis=-1)[:, None, :]


def _run_icp_kernel(kern, in_specs, operands, B, vmem_mb=64) -> IcpResult:
    """Shared pallas_call plumbing for every fused-ICP wrapper: the (B, 1, 8)
    output slab decodes as [tx, ty, cos, sin, ok, num_corr, mean_res, delta]
    (_icp_core's out_ref layout)."""
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=_scalar_spec(8, pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20),
    )(*operands)
    out = out[:, 0]
    pose = jnp.stack([out[:, 0], out[:, 1],
                      jnp.arctan2(out[:, 3], out[:, 2])], axis=-1)
    return IcpResult(
        pose=pose,
        ok=(out[:, 4] > 0.5) & (out[:, 5] > 0),
        num_corr=out[:, 5].astype(jnp.int32),
        delta=out[:, 7],
        mean_residual=out[:, 6],
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _icp_batched(s3, m3, init, cfg: IcpConfig):
    """s3: (B, S, 3), m3: (B, C, 3) = [x, y, class]; init (B, 3) [x, y, yaw]."""
    B, S, _ = s3.shape
    C = m3.shape[1]

    kern = functools.partial(
        _icp_kernel, cfg.max_iterations, cfg.inlier_dist, cfg.min_delta,
        cfg.min_scene_points)

    q_spec = pl.BlockSpec((1, S, 3), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, C, 3), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    return _run_icp_kernel(
        kern, [q_spec, m_spec, _scalar_spec(4, pltpu.SMEM)],
        (s3, m3, _pack_init4(init)), B)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _icp_batched_planes(sx, sy, sc, mx, my, mc, init, cfg: IcpConfig):
    """Plane-operand batched call: sx/sy/sc (B, S), mx/my/mc (B, C) f32
    (classes pre-encoded: scene -1 pad/0 NGA/1 GA; model 0/1, 2 invalid);
    init (B, 3) [x, y, yaw]."""
    B, S = sx.shape
    C = mx.shape[1]

    kern = functools.partial(
        _icp_kernel_planes, cfg.max_iterations, cfg.inlier_dist,
        cfg.min_delta, cfg.min_scene_points)

    # planes ride as (B, 1, N) — 2D blocks with a size-1 sublane dim violate
    # the (8, 128)-divisibility rule, but a leading block dim of 1 that equals
    # the array dim is allowed (the reshape is layout-free)
    def row(n):
        return _scalar_spec(n, pltpu.VMEM)

    return _run_icp_kernel(
        kern,
        [row(S), row(S), row(S), row(C), row(C), row(C),
         _scalar_spec(4, pltpu.SMEM)],
        (sx[:, None], sy[:, None], sc[:, None],
         mx[:, None], my[:, None], mc[:, None], _pack_init4(init)), B)


def _icp_kernel_tiled(max_iter: int, inlier_dist: float, min_delta: float,
                      min_scene: int, s_blk: int, c_blk: int,
                      sx_ref, sy_ref, sc_ref, mx_ref, my_ref, mc_ref,
                      init_ref, out_ref):
    """Reference-scale fit loop: the (S, C) distance work streams through
    (s_blk, c_blk) blocks so VMEM holds only the six coordinate/class ROWS
    (240 KB at 20k points) plus one block — never an (S, C) tile (1.6 GB at
    20k x 20k f32, the round-2 VERDICT wall). SURVEY.md §7 hard part (c):
    ICP correspondence at 20k x 20k without KD-trees, via Pallas tiling.

    Per fit iteration (while_loop, early exit on convergence):
      outer fori over S-chunks: transpose the (1, s_blk) scene slice to a
        (s_blk, 1) column, transform by the carried pose;
      inner fori over C-chunks: (s_blk, c_blk) squared distances with the
        class penalty BIG*(sc-mc)^2 (exact for classes in {-1,0,1,2}),
        merged into running (rowmin, tie-sum mx, tie-sum my, tie count)
        carries — block ties merge exactly like the resident kernel's
        whole-row ties (d2 values are computed identically, so equality
        comparisons agree bit-for-bit);
      then the same row-sum-factored Kabsch moments as _icp_core, summed
      into ten scalar accumulators across S-chunks.

    Semantics == _icp_core up to f32 summation order (chunked vs whole-row
    reductions)."""
    S = sx_ref.shape[-1]
    C = mx_ref.shape[-1]
    n_s = S // s_blk
    n_c = C // c_blk

    mc_row = mc_ref[0]                     # (1, C)
    m_ga = jnp.sum(jnp.where(mc_row == 1.0, 1.0, 0.0))
    m_nga = jnp.sum(jnp.where(mc_row == 0.0, 1.0, 0.0))
    n_scene = jnp.sum(jnp.where(sc_ref[0] >= 0.0, 1.0, 0.0))
    ok = (n_scene >= min_scene) & (m_ga + m_nga >= 5.0)
    ga_on = jnp.where(m_ga > 3.0, 1.0, 0.0)
    nga_on = jnp.where(m_nga > 3.0, 1.0, 0.0)

    def iter_body(carry):
        it, tx, ty, cth, sth, converged, ncorr, mres, delta = carry

        def s_body(si, acc):
            sl = pl.ds(si * s_blk, s_blk)
            sxb = jnp.transpose(sx_ref[0, :, sl])            # (1,s) -> (s,1)
            syb = jnp.transpose(sy_ref[0, :, sl])
            scb = jnp.transpose(sc_ref[0, :, sl])
            qx = cth * sxb - sth * syb + tx
            qy = sth * sxb + cth * syb + ty
            participate = jnp.where(scb >= 0.0, 1.0, 0.0) * \
                jnp.where(scb == 1.0, ga_on, nga_on)

            def c_body(ci, cc):
                rowmin, sxa, sya, nt = cc
                cl = pl.ds(ci * c_blk, c_blk)
                mxc = mx_ref[0, :, cl]                         # (1, c)
                myc = my_ref[0, :, cl]
                mcc = mc_ref[0, :, cl]
                dx = qx - mxc                                   # (s, c)
                dy = qy - myc
                pc = scb - mcc
                d2 = dx * dx + dy * dy + BIG * (pc * pc)
                m = jnp.min(d2, axis=1, keepdims=True)          # (s, 1)
                sel = jnp.where(d2 <= m, 1.0, 0.0)
                sxc = jnp.sum(sel * mxc, axis=1, keepdims=True)
                syc = jnp.sum(sel * myc, axis=1, keepdims=True)
                nc = jnp.sum(sel, axis=1, keepdims=True)
                better = m < rowmin
                equal = jnp.where(m == rowmin, 1.0, 0.0)
                sxa = jnp.where(better, sxc, sxa + equal * sxc)
                sya = jnp.where(better, syc, sya + equal * syc)
                nt = jnp.where(better, nc, nt + equal * nc)
                rowmin = jnp.minimum(rowmin, m)
                return rowmin, sxa, sya, nt

            z = jnp.zeros((s_blk, 1), jnp.float32)
            rowmin, sxa, sya, nt = jax.lax.fori_loop(
                0, n_c, c_body, (jnp.full((s_blk, 1), BIG, jnp.float32),
                                 z, z, z))

            w = participate * jnp.where(rowmin < inlier_dist, 1.0, 0.0)
            inv_nt = 1.0 / jnp.maximum(nt, 1.0)
            ux = w * sxa * inv_nt
            uy = w * sya * inv_nt
            (W, Swqx, Swqy, Sux, Suy, A00, A01, A10, A11, Sres) = acc
            return (W + jnp.sum(w),
                    Swqx + jnp.sum(w * qx), Swqy + jnp.sum(w * qy),
                    Sux + jnp.sum(ux), Suy + jnp.sum(uy),
                    A00 + jnp.sum(qx * ux), A01 + jnp.sum(qx * uy),
                    A10 + jnp.sum(qy * ux), A11 + jnp.sum(qy * uy),
                    Sres + jnp.sum(w * rowmin))

        zf = jnp.float32(0.0)
        (W, Swqx, Swqy, Sux, Suy, A00, A01, A10, A11, Sres) = \
            jax.lax.fori_loop(0, n_s, s_body, (zf,) * 10)

        # identical pose-update algebra to _icp_core's body
        Ws = jnp.maximum(W, 1e-12)
        mqx = Swqx / Ws
        mqy = Swqy / Ws
        mmx = Sux / Ws
        mmy = Suy / Ws
        H00 = A00 - W * mqx * mmx
        H01 = A01 - W * mqx * mmy
        H10 = A10 - W * mqy * mmx
        H11 = A11 - W * mqy * mmy
        a = H00 + H11
        b = H01 - H10
        rn = jax.lax.rsqrt(jnp.maximum(a * a + b * b, 1e-24))
        c_ = a * rn
        s_ = b * rn
        t_x = mmx - (c_ * mqx - s_ * mqy)
        t_y = mmy - (s_ * mqx + c_ * mqy)

        ntx = c_ * tx - s_ * ty + t_x
        nty = s_ * tx + c_ * ty + t_y
        ncth = c_ * cth - s_ * sth
        nsth = s_ * cth + c_ * sth
        rnorm = jax.lax.rsqrt(jnp.maximum(ncth * ncth + nsth * nsth, 1e-24))
        ncth = ncth * rnorm
        nsth = nsth * rnorm
        frob = jnp.sqrt(jnp.maximum(4.0 - 4.0 * c_, 0.0))
        d = jnp.maximum(frob, jnp.sqrt(t_x * t_x + t_y * t_y))
        has_corr = W > 0.0
        d = jnp.where(has_corr, d, -1.0)
        new_mres = Sres / Ws

        upd = ~converged
        go = upd & has_corr
        tx = jnp.where(go, ntx, tx)
        ty = jnp.where(go, nty, ty)
        cth = jnp.where(go, ncth, cth)
        sth = jnp.where(go, nsth, sth)
        ncorr = jnp.where(upd, W, ncorr)
        mres = jnp.where(upd, new_mres, mres)
        delta = jnp.where(upd, d, delta)
        converged = converged | (d < min_delta)
        return (it + 1, tx, ty, cth, sth, converged, ncorr, mres, delta)

    def cond(carry):
        it, *_, converged, _n, _m, _d = carry
        return (it < max_iter) & ~converged

    init = (jnp.int32(0), init_ref[0, 0, 0], init_ref[0, 0, 1],
            init_ref[0, 0, 2], init_ref[0, 0, 3],
            ~ok, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(jnp.inf))
    _, tx, ty, cth, sth, _, ncorr, mres, delta = jax.lax.while_loop(
        cond, iter_body, init)
    tx = jnp.where(ok, tx, init_ref[0, 0, 0])
    ty = jnp.where(ok, ty, init_ref[0, 0, 1])
    cth = jnp.where(ok, cth, init_ref[0, 0, 2])
    sth = jnp.where(ok, sth, init_ref[0, 0, 3])
    out_ref[:] = jnp.stack([
        tx, ty, cth, sth,
        jnp.where(ok, 1.0, 0.0), ncorr, mres, delta,
    ])[None, None, :]


def _pad_plane(p, mult, fill):
    n = p.shape[-1]
    r = (-n) % mult
    if r == 0:
        return p
    pad = [(0, 0)] * (p.ndim - 1) + [(0, r)]
    return jnp.pad(p, pad, constant_values=fill)


def _fit_block(n: int, blk_cap: int, mult: int) -> int:
    """Block size <= blk_cap (a `mult` multiple) minimizing padded distance
    work: pick the `mult`-multiple block whose ceil(n/blk)*blk total is
    smallest, tie-broken to the LARGEST block (fewest per-block merge
    passes). n=384, cap 256 -> one-pass choice was 256 (pad 128, 25% waste);
    this picks 128 (pad 0). n=2100, cap 2048 -> 128 (pad 76) instead of
    1152 (pad 204)."""
    assert blk_cap % mult == 0, (
        f"blk_cap {blk_cap} must be a {mult}-multiple: the kernel's lane-dim "
        f"pl.ds starts are only provably aligned for {mult}-multiple blocks")
    n = max(n, mult)
    if n >= blk_cap:
        candidates = range(mult, blk_cap + 1, mult)
    else:
        candidates = range(mult, -(-n // mult) * mult + 1, mult)
    return min(candidates, key=lambda blk: (-(-n // blk) * blk, -blk))


@functools.partial(jax.jit, static_argnames=("cfg", "s_blk", "c_blk"))
def _icp_batched_planes_tiled(sx, sy, sc, mx, my, mc, init, cfg: IcpConfig,
                              s_blk: int = 256, c_blk: int = 2048):
    """Tiled plane-operand batched call (large S x C). Pads S/C up to block
    multiples: scene pads ride as class -1 (non-participating), model pads
    as class 2 (invalid -> BIG penalty). s_blk/c_blk are CAPS — the actual
    block sizes shrink to fit the operands with minimal padding
    (_fit_block)."""
    # BOTH block sizes must be 128 multiples: the kernel's pl.ds starts
    # (si*s_blk, ci*c_blk) slice the LANE dim of (1, 1, N) refs, and Mosaic
    # only admits lane-dim dynamic slices it can statically prove
    # 128-aligned ("index in dimension 2 is a multiple of 128"). An
    # 8-multiple scene fit (e.g. S=384 -> s_blk=192) fails to compile
    # on-chip even though it minimizes padding.
    c_blk = _fit_block(mx.shape[-1], c_blk, 128)
    s_blk = _fit_block(sx.shape[-1], s_blk, 128)
    sx = _pad_plane(sx, s_blk, 0.0)
    sy = _pad_plane(sy, s_blk, 0.0)
    sc = _pad_plane(sc, s_blk, -1.0)
    mx = _pad_plane(mx, c_blk, 0.0)
    my = _pad_plane(my, c_blk, 0.0)
    mc = _pad_plane(mc, c_blk, 2.0)
    B, S = sx.shape
    C = mx.shape[1]

    kern = functools.partial(
        _icp_kernel_tiled, cfg.max_iterations, cfg.inlier_dist,
        cfg.min_delta, cfg.min_scene_points, s_blk, c_blk)

    def row(n):
        return _scalar_spec(n, pltpu.VMEM)

    return _run_icp_kernel(
        kern,
        [row(S), row(S), row(S), row(C), row(C), row(C),
         _scalar_spec(4, pltpu.SMEM)],
        (sx[:, None], sy[:, None], sc[:, None],
         mx[:, None], my[:, None], mc[:, None], _pack_init4(init)), B,
        vmem_mb=100)


# resident-kernel ceiling: an (S, C) block plus temps must fit VMEM; beyond
# this the tiled kernel streams blocks instead (2M f32 elements x ~4 live
# temps = 32 MB)
RESIDENT_TILE_LIMIT = 2 << 20


def _custom_vmap_planes(batched):
    """Wrap a (B, ...)-batched plane-operand ICP into a single-problem
    callable whose jax.vmap maps straight onto the kernel's batch grid
    (broadcasting unbatched operands)."""

    @jax.custom_batching.custom_vmap
    def icp_fused(sx, sy, sc, mx, my, mc, init_pose):
        r = batched(sx[None], sy[None], sc[None], mx[None], my[None],
                    mc[None], init_pose[None])
        return jax.tree.map(lambda x: x[0], r)

    @icp_fused.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x[None],
                                                (axis_size,) + x.shape)

        ops = (bcast(a, b) for a, b in zip(args, in_batched))
        r = batched(*ops)
        return r, jax.tree.map(lambda _: True, r)

    return icp_fused


@functools.lru_cache(maxsize=None)
def make_icp_fused_planes_tiled(cfg: IcpConfig, s_blk: int = 256,
                                c_blk: int = 2048):
    """Tiled fused ICP (plane operands), custom_vmap'd like
    make_icp_fused_planes; use when S*C > RESIDENT_TILE_LIMIT."""
    return _custom_vmap_planes(
        lambda *a: _icp_batched_planes_tiled(*a, cfg, s_blk, c_blk))


def encode_scene_class(valid, ga):
    """Scene class plane: -1 pad/invalid, 0 NGA, 1 GA (f32)."""
    return jnp.where(valid, jnp.where(ga, 1.0, 0.0), -1.0)


def encode_model_class(valid, ga):
    """Model class plane: 0 NGA, 1 GA, 2 invalid (f32)."""
    return jnp.where(valid, jnp.where(ga, 1.0, 0.0), 2.0)


@functools.lru_cache(maxsize=None)
def make_icp_fused_planes(cfg: IcpConfig):
    """Plane-operand fused ICP: (sx, sy, s_class, mx, my, m_class, init) with
    classes from encode_{scene,model}_class. custom_vmap'd like
    make_icp_fused so jax.vmap maps onto the kernel's batch grid."""
    return _custom_vmap_planes(
        lambda *a: _icp_batched_planes(*a, cfg))


def fused_register(sx, sy, s_valid, s_ga, target_planes, map_cloud, pred,
                   cfg: IcpConfig):
    """Fused scan-to-map registration shared by the 2D and 3D pipelines:
    unpack the target planes (from the map PointCloud when no pre-extracted
    planes ride along), apply the +-crop_dist crop box as a validity mask
    (the PassThrough crop, icpTools.cpp:226-239), and run the fused kernel.

    target_planes: optional (mpx, mpy, mga, mvalid) tuple; falls back to
    map_cloud's columns. Keeping this in one place pins the crop/class
    encoding semantics identical across pipelines.

    Kernel choice: the VMEM-resident kernel up to RESIDENT_TILE_LIMIT
    (S, C) elements, the streaming tiled kernel beyond (reference-scale
    scans: 20k pts/class, icpTools.h:21)."""
    if target_planes is None:
        mpx = map_cloud.xyz[..., 0]
        mpy = map_cloud.xyz[..., 1]
        mga = map_cloud.is_ga()
        mvalid = map_cloud.valid
    else:
        mpx, mpy, mga, mvalid = target_planes
    d = cfg.crop_dist
    inb = mvalid & (jnp.abs(mpx - pred[0]) <= d) & \
        (jnp.abs(mpy - pred[1]) <= d)
    S = sx.shape[-1]
    C = mpx.shape[-1]
    make = (make_icp_fused_planes_tiled if S * C > RESIDENT_TILE_LIMIT
            else make_icp_fused_planes)
    return make(cfg)(
        sx, sy, encode_scene_class(s_valid, s_ga),
        mpx, mpy, encode_model_class(inb, mga), pred)


def _pack3(xy, valid, ga, invalid_code):
    """(N, 3) = [x, y, class]: reuses the xyz layout so no plane extraction."""
    c = jnp.where(ga, 1.0, 0.0)
    c = jnp.where(valid, c, invalid_code)
    return jnp.concatenate([xy[..., :2], c[..., None]], axis=-1)


@functools.lru_cache(maxsize=None)
def make_icp_fused(cfg: IcpConfig):
    """Factory: a custom_vmap'd fused ICP closed over a (hashable) IcpConfig,
    so jax.vmap over robots maps onto the kernel's batch grid dimension."""

    @jax.custom_batching.custom_vmap
    def icp_fit_fused(scene_xy, scene_valid, scene_ga, model_xy, model_valid,
                      model_ga, init_pose):
        s3 = _pack3(scene_xy, scene_valid, scene_ga, -1.0)
        m3 = _pack3(model_xy, model_valid, model_ga, 2.0)
        r = _icp_batched(s3[None], m3[None], init_pose[None], cfg)
        return jax.tree.map(lambda x: x[0], r)

    @icp_fit_fused.def_vmap
    def _rule(axis_size, in_batched, scene_xy, scene_valid, scene_ga,
              model_xy, model_valid, model_ga, init_pose):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x[None],
                                                (axis_size,) + x.shape)

        scene_xy = bcast(scene_xy, in_batched[0])
        scene_valid = bcast(scene_valid, in_batched[1])
        scene_ga = bcast(scene_ga, in_batched[2])
        model_xy = bcast(model_xy, in_batched[3])
        model_valid = bcast(model_valid, in_batched[4])
        model_ga = bcast(model_ga, in_batched[5])
        init_pose = bcast(init_pose, in_batched[6])
        s3 = _pack3(scene_xy, scene_valid, scene_ga, -1.0)
        m3 = _pack3(model_xy, model_valid, model_ga, 2.0)
        r = _icp_batched(s3, m3, init_pose, cfg)
        return r, jax.tree.map(lambda _: True, r)

    return icp_fit_fused
