"""Class-constrained 2D ICP — TPU-native rebuild of ccicp2d.

Replaces:
  - Icp/IcpPointToPoint (icp.cpp:80-122, icpPointToPoint.cpp:33-172): the
    fit loop with per-class KD-tree correspondence + Kabsch/Arun weighted-SVD
    pose solve becomes a lax.scan over masked brute-force NN (ops/nn.py) and a
    closed-form 2D Procrustes solve (the 2x2 SVD R_=V*U^T of
    icpPointToPoint.cpp:158-162 reduces to one atan2 in 2D).
  - CCICP::doICPMatch (icpTools.cpp:123-218): pose init/extraction.
  - getEdgeWeight (icpPointToPoint.cpp:233-316): Censi-style 3x3 information
    matrix as einsums. NOTE: the reference has a typo (`dy = ax - bx`,
    icpPointToPoint.cpp:262) and the call is disabled (icpTools.cpp:191-192);
    we implement the corrected form.

Convergence: the reference breaks when max(|R_-I|_F, |t_|) < min_delta
(icp.cpp:119-121, icpPointToPoint.cpp:170). Since lax.scan runs a fixed 20
iterations, a `converged` flag freezes (R, t) once the gate fires — identical
fixed point, batch-friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tpu.config import IcpConfig
from slam_tpu.geometry import angle_wrap, rot2
from slam_tpu.ops.nn_pallas import nearest_neighbor  # pallas on TPU, jnp off


class IcpResult(NamedTuple):
    pose: jnp.ndarray        # (3,) x, y, yaw — scene->model transform
    ok: jnp.ndarray          # () bool — failure sentinel (orientation.w==9999)
    num_corr: jnp.ndarray    # () int32 — inlier correspondences at final step
    delta: jnp.ndarray       # () final parameter delta
    mean_residual: jnp.ndarray  # () mean inlier sq distance (diagnostics)


def procrustes_2d(t_pts, m_pts, w):
    """Weighted 2D Kabsch/Arun solve (icpPointToPoint.cpp:148-167).

    Finds R_, t_ minimizing sum_i w_i |m_i - (R_ t_i + t_)|^2. Returns
    (yaw, tx, ty, wsum). The 2x2 SVD solution R_=V*U^T equals
    atan2(H01-H10, H00+H11) for H = sum_i w_i (t_i - mu_t)(m_i - mu_m)^T.
    """
    wsum = jnp.maximum(jnp.sum(w, axis=-1), 1e-12)
    mu_t = jnp.sum(w[..., None] * t_pts, axis=-2) / wsum[..., None]
    mu_m = jnp.sum(w[..., None] * m_pts, axis=-2) / wsum[..., None]
    qt = t_pts - mu_t[..., None, :]
    qm = m_pts - mu_m[..., None, :]
    # H = qt^T diag(w) qm  (2x2); full precision — bf16 would corrupt the solve
    H = jnp.einsum("...ni,...n,...nj->...ij", qt, w, qm,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    yaw = jnp.arctan2(H[..., 0, 1] - H[..., 1, 0], H[..., 0, 0] + H[..., 1, 1])
    R_ = rot2(yaw)
    t_ = mu_m - jnp.einsum("...ij,...j->...i", R_, mu_t)
    return yaw, t_, wsum


def _class_participation(q_flags_ga, m_flags_ga, m_valid, min_pts=3):
    """A template point participates only if the model has >min_pts points of
    its class (icpPointToPoint.cpp:59,93: if(M_GA_SIZE>3) / if(M_NGA_SIZE>3))."""
    n_ga = jnp.sum(m_valid & m_flags_ga, axis=-1)
    n_nga = jnp.sum(m_valid & ~m_flags_ga, axis=-1)
    ga_on = n_ga > min_pts
    nga_on = n_nga > min_pts
    return jnp.where(q_flags_ga, ga_on[..., None], nga_on[..., None])


def fit_step(q_xyz, q_valid, q_ga, m_xyz, m_valid, m_ga, pose, inlier_dist):
    """One ICP step (icpPointToPoint.cpp:33-172) on 2D points.

    q_*: scene/template arrays (S, 2/bool); m_*: model arrays (C, 2/bool).
    pose: (3,) current scene->model estimate. Returns (new_pose, delta, stats).
    """
    R = rot2(pose[2])
    t = pose[:2]
    q = jnp.einsum("ij,nj->ni", R, q_xyz) + t

    participate = q_valid & _class_participation(q_ga, m_ga, m_valid)
    idx, d2 = nearest_neighbor(
        q, m_xyz, m_valid,
        q_class=q_ga.astype(jnp.int32), m_class=m_ga.astype(jnp.int32))
    inlier = participate & (d2 < inlier_dist)

    m_corr = m_xyz[idx]
    w = inlier.astype(q.dtype)
    dyaw, dt, wsum = procrustes_2d(q, m_corr, w)

    # compose: R|t = R_|t_ * R|t  (icpPointToPoint.cpp:165-167)
    R_ = rot2(dyaw)
    new_yaw = angle_wrap(pose[2] + dyaw)
    new_t = jnp.einsum("ij,j->i", R_, t) + dt
    new_pose = jnp.concatenate([new_t, new_yaw[None]])

    # delta = max(|R_-I|_F, |t_|)  (icpPointToPoint.cpp:170)
    frob = jnp.sqrt(jnp.sum((R_ - jnp.eye(2, dtype=R_.dtype)) ** 2))
    delta = jnp.maximum(frob, jnp.sqrt(jnp.sum(dt**2)))

    num_corr = jnp.sum(inlier).astype(jnp.int32)
    mean_res = jnp.sum(w * d2) / jnp.maximum(wsum, 1e-12)
    # zero correspondences => reference returns -1 and fitIterate stops
    # (icpPointToPoint.cpp:128-131); freeze the pose in that case.
    has_corr = num_corr > 0
    new_pose = jnp.where(has_corr, new_pose, pose)
    delta = jnp.where(has_corr, delta, -1.0)
    return new_pose, delta, num_corr, mean_res


def icp_fit(scene_xyz, scene_valid, scene_ga, model_xyz, model_valid, model_ga,
            init_pose, cfg: IcpConfig) -> IcpResult:
    """Full ICP (Icp::fit + fitIterate, icp.cpp:80-122).

    All inputs 2D (x, y). init_pose (3,) = [x, y, yaw]. The reference rejects
    scenes with <5 total points (icpTools.cpp:179-184) by returning the
    orientation.w==9999 sentinel; here `ok=False` and the init pose passes
    through unchanged (scan_registration.cpp:161-165 skips such scans).
    """
    n_scene = jnp.sum(scene_valid)
    n_model = jnp.sum(model_valid)
    ok = (n_scene >= cfg.min_scene_points) & (n_model >= 5)

    def body(carry, _):
        pose, converged, num_corr, mean_res, delta = carry
        new_pose, d, nc, mr = fit_step(
            scene_xyz, scene_valid, scene_ga, model_xyz, model_valid, model_ga,
            pose, cfg.inlier_dist)
        stop = converged | (d < cfg.min_delta) | (d < 0)
        pose = jnp.where(converged, pose, new_pose)
        num_corr = jnp.where(converged, num_corr, nc)
        mean_res = jnp.where(converged, mean_res, mr)
        delta = jnp.where(converged, delta, d)
        return (pose, stop, num_corr, mean_res, delta), None

    init = (init_pose, ~ok, jnp.int32(0), jnp.float32(0.0), jnp.float32(jnp.inf))
    if cfg.loop == "while":
        # batch early exit, same contract as ops/grid_icp.py: bit-identical
        # to the fixed scan (the body freezes converged lanes; the while
        # batching rule applies the same per-lane select), but stops paying
        # O(S*C) fit_step iterations once every batched lane has converged.
        def w_cond(c):
            return (c[0] < cfg.max_iterations) & ~jnp.all(c[1][1])

        def w_body(c):
            i, carry = c
            carry, _ = body(carry, None)
            return (i + 1, carry)

        _, (pose, _, num_corr, mean_res, delta) = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), init))
    else:
        (pose, _, num_corr, mean_res, delta), _ = jax.lax.scan(
            body, init, None, length=cfg.max_iterations)
    pose = jnp.where(ok, pose, init_pose)
    # num_corr == 0 (e.g. participation all-off: every scene class has <= 3
    # model points) is a FAILED registration — same contract as the fused
    # kernels and the grid matcher, so EKF gating can't diverge by backend
    return IcpResult(pose=pose, ok=ok & (num_corr > 0), num_corr=num_corr,
                     delta=delta, mean_residual=mean_res)


def edge_information_2d(t_pts, m_pts, w):
    """Censi/LUM-style 3x3 information matrix over 2D correspondences —
    corrected form of getEdgeWeight (icpPointToPoint.cpp:233-316).

    t_pts/m_pts: (N, 2) corresponding scene/model points, w: (N,) weights.
    Returns (3, 3) information for (x, y, yaw).
    """
    n = jnp.maximum(jnp.sum(w), 1.0)
    mid = 0.5 * (m_pts + t_pts)
    diff = m_pts - t_pts
    x, y = mid[..., 0], mid[..., 1]
    dx, dy = diff[..., 0], diff[..., 1]

    sx = jnp.sum(w * x)
    sy = jnp.sum(w * y)
    xpy = jnp.sum(w * (x * x + y * y))
    MM = jnp.array([[n, 0.0, -sy],
                    [0.0, n, sx],
                    [-sy, sx, xpy]])
    MZ = jnp.stack([jnp.sum(w * dx), jnp.sum(w * dy),
                    jnp.sum(w * (-y * dx + x * dy))])
    # closed-form 3x3 solve (MM is SPD by construction): avoids the LU
    # custom-call jnp.linalg.solve lowers to on TPU
    from slam_tpu.ops.linalg import inv3
    D = inv3(MM + 1e-9 * jnp.eye(3)) @ MZ
    tx = dx - D[0] + y * D[2]
    ty = dy - D[1] - x * D[2]
    ss = jnp.sum(w * (tx * tx + ty * ty)) / jnp.maximum(2.0 * n - 3.0, 1.0)
    info = MM / jnp.maximum(ss, 1e-12)
    # singular/ill-defined guard (graphSlamTools.cpp:203-208 analogue)
    bad = (ss < 1e-13) | ~jnp.isfinite(ss)
    return jnp.where(bad, jnp.eye(3, dtype=info.dtype), info)
