"""Full 3D point-to-point ICP — the TPU-native role of the reference's PCL
GICP keyframe-edge alignment (calcEdgeIcp, graphSlamTools.cpp:241-298: both
keyframe clouds voxelized at 0.5 m, SE(3) init Mfrom^-1 * Mto from odometry,
`gicp.align(*temp, transformation)`), feeding the 6x6 LUM information
(computeEdgeInformationLUM, graphSlamTools.cpp:108-214 — implemented as
`pose_graph3d.edge_information_lum6`).

TPU-first design: correspondence search is the same masked brute-force
distance matrix as the 2D matcher (ops/nn.py — the -2*q@m.T cross term is
one MXU matmul; keyframe clouds are <=~1k points after voxelization, so a
(P, P) tile is tiny), and the pose solve is the weighted 3D Kabsch that
already serves the surveyed-landmark alignment (ops/align.py
rigid_transform_3d, rigid_transform_3D.m:14-27). Class constraints (GA vs
non-GA, the two-KD-tree split of icp.cpp:62-69) ride along as additive
distance masks, same as 2D.

Convergence contract matches ops/icp.py: fixed-capacity loop with a
converged flag freezing (R, t) once delta = max(|R_-I|_F, |t_|) < min_delta
(icp.cpp:119-121 semantics), batch-early-exit variant included.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tpu.config import IcpConfig
from slam_tpu.ops.align import rigid_transform_3d
from slam_tpu.ops.nn import nearest_neighbor


class Icp3dResult(NamedTuple):
    t: jnp.ndarray              # (3,) scene->model translation
    R: jnp.ndarray              # (3, 3) scene->model rotation
    ok: jnp.ndarray             # () bool — failure sentinel
    num_corr: jnp.ndarray       # () int32 inliers at the final step
    delta: jnp.ndarray          # () final parameter delta
    mean_residual: jnp.ndarray  # () mean inlier squared distance


def _class_participation_multi(q_class, m_class, m_valid, num_classes=3,
                               min_pts=3):
    """Multi-class generalization of _class_participation: a template point
    participates only if the model holds >min_pts points of its class
    (icpPointToPoint.cpp:59,93 semantics, extended to the ground class the
    reference's keyframes carry — its GICP runs on the raw voxelized cloud,
    graphSlamTools.cpp:279-286, where ground points are what constrain z)."""
    counts = jnp.stack([jnp.sum(m_valid & (m_class == c))
                        for c in range(num_classes)])      # (num_classes,)
    return counts[q_class] > min_pts


def fit_step_3d(q_xyz, q_valid, q_class, m_xyz, m_valid, m_class, t, R,
                inlier_dist):
    """One 3D ICP step: transform scene by (R, t), class-constrained NN,
    inlier gate, weighted Kabsch, compose. Mirrors fit_step (ops/icp.py) in
    3D; the inlier gate compares SQUARED distance against inlier_dist — the
    reference's KDTree `.dis` quirk (icpPointToPoint.cpp:76), preserved so
    both matchers share one config field.

    q_class/m_class: int32 point classes (0 = non-GA obstacle, 1 = GA
    obstacle, 2 = ground); correspondences never cross classes.

    The solve is split by class the way the reference's GICP covariance
    weighting effectively splits it (plane-to-plane degenerates to
    point-to-plane on the ground): obstacle correspondences drive a full
    6-DoF Kabsch, ground correspondences then drive a z-only point-to-plane
    refinement (vertical normals: dz ~= t_z + w_x*y - w_y*x, a 3-parameter
    linear LSQ) fixing z/roll/pitch without the lateral pull point-to-point
    matching of a smooth surface would inject into x/y/yaw."""
    q = q_xyz @ R.T + t

    participate = q_valid & _class_participation_multi(q_class, m_class,
                                                       m_valid)
    idx, d2 = nearest_neighbor(q, m_xyz, m_valid,
                               q_class=q_class, m_class=m_class)
    inlier = participate & (d2 < inlier_dist)
    is_ground = q_class == 2
    m_corr = m_xyz[idx]

    # --- stage 1: full Kabsch on obstacle inliers ---
    w_obs = (inlier & ~is_ground).astype(q.dtype)
    step = rigid_transform_3d(q, m_corr, w_obs)
    has_obs = jnp.sum(w_obs) > 0
    R1 = jnp.where(has_obs, step.R, jnp.eye(3, dtype=q.dtype))
    t1 = jnp.where(has_obs, step.t, jnp.zeros(3, q.dtype))
    q1 = q @ R1.T + t1

    # --- stage 2: z-only plane fit on ground inliers ---
    # dz_i = m_z - q_z ~= t_z + w_x*y_i - w_y*x_i  (small rotation about
    # x/y applied at the scene's frame origin); 3x3 normal equations
    w_gnd = (inlier & is_ground).astype(q.dtype)
    dz = m_corr[:, 2] - q1[:, 2]
    A = jnp.stack([jnp.ones_like(dz), q1[:, 1], -q1[:, 0]], -1)   # (S, 3)
    from slam_tpu.ops.linalg import inv3
    AtA = jnp.einsum("na,n,nb->ab", A, w_gnd, A,
                     precision=jax.lax.Precision.HIGHEST)
    Atb = jnp.einsum("na,n->a", A * dz[:, None], w_gnd)
    sol = inv3(AtA + 1e-6 * jnp.eye(3, dtype=q.dtype)) @ Atb
    has_gnd = jnp.sum(w_gnd) >= 3
    tz = jnp.where(has_gnd, sol[0], 0.0)
    wx = jnp.where(has_gnd, sol[1], 0.0)
    wy = jnp.where(has_gnd, sol[2], 0.0)
    # small-angle rotation exp([wx, wy, 0]) + z shift
    cwx, swx = jnp.cos(wx), jnp.sin(wx)
    cwy, swy = jnp.cos(wy), jnp.sin(wy)
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                    [0.0, 0.0, 1.0]], q.dtype)
    Rx = Rx.at[1, 1].set(cwx).at[1, 2].set(-swx)
    Rx = Rx.at[2, 1].set(swx).at[2, 2].set(cwx)
    Ry = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                    [0.0, 0.0, 1.0]], q.dtype)
    Ry = Ry.at[0, 0].set(cwy).at[0, 2].set(swy)
    Ry = Ry.at[2, 0].set(-swy).at[2, 2].set(cwy)
    R2 = Rx @ Ry
    t2 = jnp.array([0.0, 0.0, 1.0], q.dtype) * tz

    # compose the two stages: x -> R2 (R1 x + t1) + t2
    R_ = R2 @ R1
    t_ = R2 @ t1 + t2
    new_R = R_ @ R
    new_t = R_ @ t + t_

    frob = jnp.sqrt(jnp.sum((R_ - jnp.eye(3, dtype=q.dtype)) ** 2))
    delta = jnp.maximum(frob, jnp.linalg.norm(t_))

    num_corr = jnp.sum(inlier).astype(jnp.int32)
    w = inlier.astype(q.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mean_res = jnp.sum(w * d2) / wsum
    # zero correspondences: freeze (icpPointToPoint.cpp:128-131 contract)
    has_corr = num_corr > 0
    new_t = jnp.where(has_corr, new_t, t)
    new_R = jnp.where(has_corr, new_R, R)
    delta = jnp.where(has_corr, delta, -1.0)
    return new_t, new_R, delta, num_corr, mean_res


def icp3d_fit(scene_xyz, scene_valid, scene_class, model_xyz, model_valid,
              model_class, init_t, init_R, cfg: IcpConfig,
              max_iterations: int | None = None) -> Icp3dResult:
    """Full 3D ICP fit (the Icp::fit / gicp.align role for keyframe edges).

    scene_xyz: (S, 3) template points (node j's keyframe cloud, node frame);
    model_xyz: (M, 3) target points (node i's cloud); *_class: int32 point
    classes (see fit_step_3d; pass zeros for unconstrained matching).
    init: SE(3) relative odometry (R_i^T R_j, R_i^T (t_j - t_i) —
    graphSlamTools.cpp:258). Returns the refined scene->model SE(3). `ok`
    follows the same minimum point gates as the 2D fit
    (icpTools.cpp:179-184 / icp.cpp:38-43).
    """
    iters = cfg.max_iterations if max_iterations is None else max_iterations
    n_scene = jnp.sum(scene_valid)
    n_model = jnp.sum(model_valid)
    ok = (n_scene >= cfg.min_scene_points) & (n_model >= 5)

    def body(carry, _):
        t, R, converged, num_corr, mean_res, delta = carry
        nt, nR, d, nc, mr = fit_step_3d(
            scene_xyz, scene_valid, scene_class, model_xyz, model_valid,
            model_class, t, R, cfg.inlier_dist)
        stop = converged | (d < cfg.min_delta) | (d < 0)
        t = jnp.where(converged, t, nt)
        R = jnp.where(converged, R, nR)
        num_corr = jnp.where(converged, num_corr, nc)
        mean_res = jnp.where(converged, mean_res, mr)
        delta = jnp.where(converged, delta, d)
        return (t, R, stop, num_corr, mean_res, delta), None

    init = (init_t, init_R, ~ok, jnp.int32(0), jnp.float32(0.0),
            jnp.float32(jnp.inf))
    if cfg.loop == "while":
        def w_cond(c):
            return (c[0] < iters) & ~jnp.all(c[1][2])

        def w_body(c):
            i, carry = c
            carry, _ = body(carry, None)
            return (i + 1, carry)

        _, (t, R, _, num_corr, mean_res, delta) = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), init))
    else:
        (t, R, _, num_corr, mean_res, delta), _ = jax.lax.scan(
            body, init, None, length=iters)
    t = jnp.where(ok, t, init_t)
    R = jnp.where(ok, R, init_R)
    return Icp3dResult(t=t, R=R, ok=ok & (num_corr > 0), num_corr=num_corr,
                       delta=delta, mean_residual=mean_res)
