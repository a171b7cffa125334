"""Nearest-neighbor correspondence search — the TPU-native replacement for the
reference's KD-trees (ccicp2d/src/kdtree.{h,cpp}, pcl::KdTreeFLANN).

KD-trees are pointer-chasing structures that map terribly onto the MXU/VPU.
At SLAM scan sizes (<=20k points, icpTools.h:21) a tiled brute-force distance
matrix is faster on TPU: the pairwise term -2*q@m.T is a matmul the MXU eats,
and the row argmin is a VPU reduction. Class constraints (GA vs NGA,
icpPointToPoint.cpp:59-126) become additive masks on the distance matrix
instead of separate trees.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

BIG = jnp.float32(1e30)


def pairwise_sq_dist(q: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances (..., S, C) between q (..., S, D) and m (..., C, D).

    Uses |q|^2 + |m|^2 - 2 q.m so the cross term is a single MXU matmul.
    """
    qq = jnp.sum(q * q, axis=-1, keepdims=True)            # (S, 1)
    mm = jnp.sum(m * m, axis=-1, keepdims=True)            # (C, 1)
    # precision=HIGHEST: TPU's default bf16 matmul would give O(m)-scale
    # distance errors at 100 m coordinates (RMAX, groundSegmentation.cpp:36)
    cross = jnp.einsum("...sd,...cd->...sc", q, m,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    d2 = qq - 2.0 * cross + jnp.swapaxes(mm, -1, -2)
    return jnp.maximum(d2, 0.0)


def nearest_neighbor(
    q: jnp.ndarray,
    m: jnp.ndarray,
    m_valid: jnp.ndarray,
    q_class: jnp.ndarray | None = None,
    m_class: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each query point return (nn_index, nn_sq_dist) into the model set.

    Invalid model points get +BIG distance; when classes are given, cross-class
    pairs get +BIG as well (the two-KD-tree split of icp.cpp:62-69).
    Returns squared distances — matching the reference KDTree's `.dis` field,
    which the inlier gate compares directly against inDist
    (icpPointToPoint.cpp:76: result[0].dis < inDist).
    """
    d2 = pairwise_sq_dist(q, m)
    penalty = jnp.where(m_valid, 0.0, BIG)[..., None, :]
    if q_class is not None and m_class is not None:
        mismatch = q_class[..., :, None] != m_class[..., None, :]
        penalty = penalty + jnp.where(mismatch, BIG, 0.0)
    d2 = d2 + penalty
    idx = jnp.argmin(d2, axis=-1)
    best = jnp.take_along_axis(d2, idx[..., None], axis=-1)[..., 0]
    return idx, best




def nearest_neighbor_tiled(q, m, m_valid, q_class=None, m_class=None,
                           chunk: int = 512):
    """nearest_neighbor with the query axis processed in `chunk`-sized
    tiles (lax.map): peak memory is (chunk, C) instead of (S, C), for
    problems whose full distance matrix would not fit on-accelerator —
    e.g. the relocalization ICP polish matching a 4k scene against a 40k
    map cloud (671 MB at f32). Identical results to nearest_neighbor."""
    S = q.shape[-2]
    pad = (-S) % chunk
    qp = jnp.pad(q, ((0, pad), (0, 0)))
    qcp = None
    if q_class is not None and m_class is not None:
        qcp = jnp.pad(q_class, (0, pad))

    def one(args):
        qc_blk = args[1] if qcp is not None else None
        return nearest_neighbor(args[0], m, m_valid, qc_blk, m_class)

    blocks = (qp.reshape(-1, chunk, q.shape[-1]),) + (
        (qcp.reshape(-1, chunk),) if qcp is not None else ())
    idx, d2 = jax.lax.map(one, blocks)
    return idx.reshape(-1)[:S], d2.reshape(-1)[:S]
