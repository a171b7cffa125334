"""Batched small-matrix linear algebra, unrolled for the TPU VPU.

XLA lowers jnp.linalg.solve / cholesky on TPU through expander passes that
emit While loops with dynamic slices — fine for one big matrix, very slow for
thousands of tiny ones (the GP-INSAC sweep solves B*S systems of C=32 per
sweep; the LU custom-call was 56% of the whole 3D step). For C <= ~64 an
unrolled Cholesky + substitution is pure batched vector arithmetic: every
scalar op of the textbook algorithm becomes one (batch,)-wide VPU op, no
control flow, fully fusible.

Numerics match jnp.linalg.solve to ~1e-6 on the GP systems (see
tests/test_linalg.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_unrolled(M: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Lower-triangular Cholesky factor of batched SPD matrices (..., C, C).

    Unrolled over the C columns; intended for small static C (<= 64).
    Diagonal is clamped at sqrt(eps) so a semi-definite input degrades
    gracefully instead of producing NaNs.
    """
    C = M.shape[-1]
    L = jnp.zeros_like(M)
    idx = jnp.arange(C)
    for j in range(C):
        # s_i = M[i, j] - sum_{k<j} L[i, k] * L[j, k]; columns >= j of L are
        # still zero, so the full-K einsum only picks up k < j.
        s = M[..., :, j] - jnp.einsum("...ik,...k->...i", L, L[..., j, :])
        d = jnp.sqrt(jnp.maximum(s[..., j], eps))
        col = s / d[..., None]
        L = L.at[..., :, j].set(jnp.where(idx >= j, col, 0.0))
    return L


def forward_substitute(L: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Solve L Y = R for batched lower-triangular L (..., C, C), R (..., C, Q).

    Unrolled forward substitution; rows >= i of Y are zero when row i is
    computed, so the full-K einsum only picks up k < i.
    """
    C = L.shape[-1]
    Y = jnp.zeros_like(R)
    for i in range(C):
        yi = (R[..., i, :] - jnp.einsum("...k,...kq->...q", L[..., i, :], Y)
              ) / L[..., i, i][..., None]
        Y = Y.at[..., i, :].set(yi)
    return Y


def back_substitute(L: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T Y = R (L lower-triangular), completing an SPD solve after
    forward_substitute."""
    C = L.shape[-1]
    Y = jnp.zeros_like(R)
    for i in reversed(range(C)):
        # L^T[i, k] = L[k, i]; rows > i already filled, rows < i still zero
        yi = (R[..., i, :] - jnp.einsum("...k,...kq->...q", L[..., :, i], Y)
              ) / L[..., i, i][..., None]
        Y = Y.at[..., i, :].set(yi)
    return Y


def spd_solve(M: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Solve M Y = R for batched SPD M via unrolled Cholesky."""
    L = cholesky_unrolled(M)
    return back_substitute(L, forward_substitute(L, R))


def cholesky_blocked(M: jnp.ndarray, block: int = 8,
                     eps: float = 1e-12) -> jnp.ndarray:
    """Right-looking blocked Cholesky of batched SPD matrices (..., C, C).

    The column-unrolled variant materializes a full (..., C, C) copy per
    `.at[:, j].set` — C copies of the whole factor per call (~12 GB of HBM
    traffic for the GP-INSAC sweeps at reference scale). Blocking touches
    the full matrix only once per PANEL: one rank-`block` einsum update per
    block (MXU-friendly), with the serialized recurrences confined to
    (..., block, block) diagonal factors and (..., C, block) panel solves.
    Same math, same eps clamping — agrees with cholesky_unrolled to fp
    roundoff (tests/test_linalg.py).

    PRECONDITION: strictly positive-definite input (the GP-INSAC system has
    >= gp_noise on every diagonal). On a SEMI-definite input the unrolled
    variant degrades to garbage-but-FINITE columns, while the blocked panel
    update squares those huge columns (rank-`block` einsum) and can overflow
    f32 to inf - inf = NaN.
    """
    C = M.shape[-1]
    idx = jnp.arange(C)
    A = M
    panels = []
    for j0 in range(0, C, block):
        b = min(block, C - j0)
        panel = A[..., :, j0:j0 + b]                    # residual columns
        Lbb = cholesky_unrolled(panel[..., j0:j0 + b, :], eps)
        # panel solve X Lbb^T = A[:, blk]  (column recurrence over b cols);
        # the divisor gets a sign-preserving magnitude floor so a degraded
        # (semi-definite) diagonal yields finite garbage like the unrolled
        # path instead of 0/0 = NaN — a no-op for any PD input
        floor = eps ** 0.5
        xs = []
        for k in range(b):
            s = panel[..., :, k]
            for m in range(k):
                s = s - xs[m] * Lbb[..., k, m][..., None]
            d = Lbb[..., k, k]
            d = jnp.where(jnp.abs(d) < floor,
                          jnp.where(d < 0, -floor, floor), d)
            xs.append(s / d[..., None])
        Lp = jnp.stack(xs, axis=-1)                      # (..., C, b)
        Lp = jnp.where(idx[:, None] >= (j0 + jnp.arange(b))[None, :],
                       Lp, 0.0)
        panels.append(Lp)
        if j0 + b < C:
            A = A - jnp.einsum("...ik,...jk->...ij", Lp, Lp)
    return jnp.concatenate(panels, axis=-1)


def forward_substitute_blocked(L: jnp.ndarray, R: jnp.ndarray,
                               block: int = 8) -> jnp.ndarray:
    """Blocked L Y = R solve: unrolled substitution inside each diagonal
    block, one (..., C, block) x (..., block, Q) einsum update between
    blocks — avoids the row-at-a-time full-R copies of forward_substitute."""
    C = L.shape[-1]
    Rres = R
    Ys = []
    for i0 in range(0, C, block):
        b = min(block, C - i0)
        Yb = forward_substitute(L[..., i0:i0 + b, i0:i0 + b],
                                Rres[..., i0:i0 + b, :])
        Ys.append(Yb)
        if i0 + b < C:
            # rows <= i0+b are already consumed; over-updating them is free
            Rres = Rres - jnp.einsum("...ik,...kq->...iq",
                                     L[..., :, i0:i0 + b], Yb)
    return jnp.concatenate(Ys, axis=-2)


def back_substitute_blocked(L: jnp.ndarray, R: jnp.ndarray,
                            block: int = 8) -> jnp.ndarray:
    """Blocked L^T Y = R solve (reverse-order blocks), same scheme as
    forward_substitute_blocked."""
    C = L.shape[-1]
    Rres = R
    Ys = []
    starts = list(range(0, C, block))
    for i0 in reversed(starts):
        b = min(block, C - i0)
        Yb = back_substitute(L[..., i0:i0 + b, i0:i0 + b],
                             Rres[..., i0:i0 + b, :])
        Ys.insert(0, Yb)
        if i0 > 0:
            # (L^T)[i, k] = L[k, i] for block rows k: update remaining rows
            Rres = Rres - jnp.einsum("...ki,...kq->...iq",
                                     L[..., i0:i0 + b, :], Yb)
    return jnp.concatenate(Ys, axis=-2)


def inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of batched 3x3 matrices (..., 3, 3).

    jnp.linalg.inv on TPU lowers to an LuDecompositionBlock custom-call plus
    triangular solves (~1 ms/tick at batch 1024 in the EKF slam update); the
    cofactor expansion is ~30 fused VPU ops. Intended for well-conditioned
    matrices (innovation covariances S = C Sigma C^T + Q with Q >= 10 I)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = f * g - d * i
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    adj = jnp.stack([
        jnp.stack([A, c * h - b * i, b * f - c * e], axis=-1),
        jnp.stack([B, a * i - c * g, c * d - a * f], axis=-1),
        jnp.stack([C, b * g - a * h, a * e - b * d], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]
