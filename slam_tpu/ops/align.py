"""Rigid alignment of corresponding 3D point sets — TPU-native rebuild of the
reference's surveyed-landmark alignment (global_matching/matlab/
rigid_transform_3D.m:14-27, calcTransform.m) and the SE(2) map transform of
global_transform.cpp:46-65.

Weighted Kabsch in 3D with proper-rotation (det) correction, plus the RMSE
check calcTransform.m:30-36 used as its acceptance metric.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RigidResult(NamedTuple):
    R: jnp.ndarray      # (3, 3)
    t: jnp.ndarray      # (3,)
    rmse: jnp.ndarray   # ()


def rigid_transform_3d(a: jnp.ndarray, b: jnp.ndarray,
                       w: jnp.ndarray | None = None) -> RigidResult:
    """Find R, t minimizing sum w_i |R a_i + t - b_i|^2 (SVD Kabsch,
    rigid_transform_3D.m). a, b: (N, 3)."""
    if w is None:
        w = jnp.ones(a.shape[0], a.dtype)
    ws = jnp.maximum(jnp.sum(w), 1e-9)
    ca = jnp.sum(w[:, None] * a, 0) / ws
    cb = jnp.sum(w[:, None] * b, 0) / ws
    H = jnp.einsum("ni,n,nj->ij", a - ca, w, b - cb)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) .at[2].set(d))
    R = Vt.T @ D @ U.T
    t = cb - R @ ca
    res = (a @ R.T + t) - b
    rmse = jnp.sqrt(jnp.sum(w[:, None] * res * res) / ws)
    return RigidResult(R=R, t=t, rmse=rmse)


def apply_se2_to_cloud(xyz: jnp.ndarray, dx: float, dy: float,
                       dyaw: float) -> jnp.ndarray:
    """Hand-measured SE(2) map shift (global_transform.cpp:46-65)."""
    c, s = jnp.cos(dyaw), jnp.sin(dyaw)
    x = c * xyz[..., 0] - s * xyz[..., 1] + dx
    y = s * xyz[..., 0] + c * xyz[..., 1] + dy
    return jnp.stack([x, y, xyz[..., 2]], axis=-1)
