"""Full SE(3) pose-graph optimization — the strict-fidelity counterpart of
the reference's g2o VertexSE3/EdgeSE3 solve (graph_slam.cpp:43-49, 179-186,
322-390) and its 6x6 LUM edge information (graphSlamTools.cpp:108-214
computeEdgeInformationLUM).

The production pipeline optimizes SE(2) x z (`pose_graph.py` — a documented
deviation: the reference's edges come from planar ICP, so roll/pitch carry
no measurement signal). This module closes the strict-fidelity gap: a
6-DoF node/edge graph with the reference's exact information model, for

  - missions whose edges DO observe roll/pitch (full 3D registration),
  - validating the SE(2) x z deviation (on planar graphs both optimizers
    must agree — `tests/test_pose_graph3d.py`),
  - lossless VertexSE3:QUAT/EDGE_SE3:QUAT interop (`g2o_io` full mode).

TPU-first design — "lift, solve, retract" with autodiff linearization:
g2o walks sparse block structures with CSparse/Cholmod on the CPU; here
every GN iteration linearizes the whole edge-residual vector with one
`jax.jacfwd` over the (N, 6) tangent (XLA vectorizes the JVPs; every edge
is independent), assembles the dense 6N x 6N normal system with einsums,
and solves it on the MXU. At the reference's graph sizes (keyframes every
5 m -> tens of nodes) the dense solve is faster than any sparse
factorization and, unlike g2o, vmaps across a robot fleet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from slam_tpu.ops import linalg
from slam_tpu.types import PoseGraph

# ---------------------------------------------------------------------------
# SO(3) manifold helpers
# ---------------------------------------------------------------------------


def so3_hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew matrix of (..., 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: exp of a rotation vector (..., 3) -> (..., 3, 3).

    Branch-free small-angle handling: the sin(t)/t and (1-cos t)/t^2
    coefficients switch to their Taylor forms under jnp.where with the
    argument sanitized first, so gradients stay NaN-free at t = 0 (the
    jacfwd linearization in optimize_se3 differentiates THROUGH this at
    exactly the zero tangent every iteration)."""
    t2 = jnp.sum(w * w, axis=-1)
    t = jnp.sqrt(jnp.where(t2 > 0, t2, 1.0))          # sanitized
    small = t2 < 1e-12
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / jnp.where(
        small, 1.0, t2))
    K = so3_hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return I + a[..., None, None] * K + \
        b[..., None, None] * (K @ K)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector of (..., 3, 3). Safe for identity and near-pi.

    Near pi the off-diagonal extraction degenerates (sin t -> 0), so the
    axis is recovered from the dominant diagonal of (R + I)/2 = aa^T there
    — pose-graph residuals near pi only appear in pathological graphs, but
    the optimizer must not NaN on them."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    # arccos has infinite slope at +-1: sanitize the argument INSIDE the
    # branches so jacfwd/jacrev through the non-taken branch stays finite
    # (optimize_se3 linearizes through here at near-zero residuals every
    # iteration — the identity case is the HOT case, not the edge case)
    # f32 cos_t saturates to exactly 1.0 for t below ~5e-4 (eps-at-1 is
    # 6e-8), so the Taylor window must be wider than that saturation zone;
    # the t/(2 sin t) series error at t = 4.5e-3 is ~4e-12 — free accuracy
    near0 = cos_t > 1.0 - 1e-5           # t < ~4.5e-3: Taylor regime
    big = cos_t < -1.0 + 5e-7            # t within ~1e-3 of pi
    t = jnp.arccos(jnp.where(near0 | big, 0.0, cos_t))
    t = jnp.where(near0, 0.0, jnp.where(big, jnp.pi, t))
    v = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    # |v| = 2 sin(t), so near identity t^2 ~= |v|^2 / 4 (smooth in R)
    t2s = jnp.sum(v * v, axis=-1) * 0.25
    sin_t = jnp.sin(jnp.where(near0 | big, jnp.pi / 2, t))  # sanitized
    scale = jnp.where(near0, 0.5 + t2s / 12.0, t / (2.0 * sin_t))
    w_generic = v * scale[..., None]
    # near-pi branch: R + I -> 2 aa^T as t -> pi, so the largest-diagonal
    # row of (R + I) is parallel to the axis (sign ambiguity a vs -a is
    # immaterial at pi and within tolerance just below it)
    B = R + jnp.eye(3, dtype=R.dtype)
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], -1)
    k = jnp.argmax(diag, axis=-1)
    row = jnp.take_along_axis(
        B, jnp.broadcast_to(k[..., None, None], B[..., :1, :].shape),
        axis=-2)[..., 0, :]
    nrm = jnp.linalg.norm(row, axis=-1, keepdims=True)
    axis = row / jnp.where(nrm > 1e-12, nrm, 1.0)
    w_pi = axis * t[..., None]
    return jnp.where(big[..., None], w_pi, w_generic)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """[w, x, y, z] quaternion (...,4) -> (...,3,3). Normalizes."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> [w, x, y, z], w >= 0. Branch-free Shepperd: compute
    all four candidate quaternions (one per dominant component) and select
    by the largest denominator — every candidate is finite because the
    denominators are clamped, and the selected one is the numerically
    stable one."""
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = r00 + r11 + r22
    # squared 4*components
    qw2 = jnp.clip(1.0 + tr, 0.0, None)
    qx2 = jnp.clip(1.0 + r00 - r11 - r22, 0.0, None)
    qy2 = jnp.clip(1.0 - r00 + r11 - r22, 0.0, None)
    qz2 = jnp.clip(1.0 - r00 - r11 + r22, 0.0, None)
    cands = jnp.stack([qw2, qx2, qy2, qz2], -1)
    k = jnp.argmax(cands, axis=-1)
    s = 2.0 * jnp.sqrt(jnp.clip(jnp.take_along_axis(
        cands, k[..., None], -1)[..., 0], 1e-12, None))
    qw = jnp.stack([s * 0.25, (r21 - r12) / s, (r02 - r20) / s,
                    (r10 - r01) / s], -1)
    qx = jnp.stack([(r21 - r12) / s, s * 0.25, (r01 + r10) / s,
                    (r02 + r20) / s], -1)
    qy = jnp.stack([(r02 - r20) / s, (r01 + r10) / s, s * 0.25,
                    (r12 + r21) / s], -1)
    qz = jnp.stack([(r10 - r01) / s, (r02 + r20) / s, (r12 + r21) / s,
                    s * 0.25], -1)
    kk = k[..., None]
    q = jnp.select([kk == 0, kk == 1, kk == 2], [qw, qx, qy], qz)
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# The SE(3) graph container
# ---------------------------------------------------------------------------


@struct.dataclass
class Se3Graph:
    """Fixed-capacity 6-DoF pose graph (g2o VertexSE3/EdgeSE3 semantics,
    graph_slam.h:9-37 / graph_slam.cpp:179-186).

    node_t:    (N, 3) translations
    node_R:    (N, 3, 3) rotations
    node_valid:(N,) bool
    edge_ij:   (E, 2) int32 from, to
    edge_t:    (E, 3) measured relative translation (from-frame)
    edge_R:    (E, 3, 3) measured relative rotation
    edge_info: (E, 6, 6) information, tangent order [t_x t_y t_z w_x w_y w_z]
               (the reference's LUM order: translation first,
               graphSlamTools.cpp:152-176)
    edge_valid:(E,) bool
    """

    node_t: jnp.ndarray
    node_R: jnp.ndarray
    node_valid: jnp.ndarray
    edge_ij: jnp.ndarray
    edge_t: jnp.ndarray
    edge_R: jnp.ndarray
    edge_info: jnp.ndarray
    edge_valid: jnp.ndarray


def init_se3_graph(max_nodes: int, max_edges: int,
                   dtype=jnp.float32) -> Se3Graph:
    N, E = max_nodes, max_edges
    return Se3Graph(
        node_t=jnp.zeros((N, 3), dtype),
        node_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (N, 3, 3)),
        node_valid=jnp.zeros((N,), bool),
        edge_ij=jnp.zeros((E, 2), jnp.int32),
        edge_t=jnp.zeros((E, 3), dtype),
        edge_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (E, 3, 3)),
        edge_info=jnp.zeros((E, 6, 6), dtype),
        edge_valid=jnp.zeros((E,), bool),
    )


def from_planar(graph: PoseGraph, rp_info: float = 1e4) -> Se3Graph:
    """Lift the production SE(2) x z graph into SE(3).

    Yaw becomes a z-axis rotation; the 4x4 (x, y, yaw, z) information embeds
    at tangent indices (0, 1, 5, 2) with the unobserved roll/pitch rows
    pinned at `rp_info` (the planar model measures them as exactly 0) —
    the same convention as g2o_io.save_g2o(mode="se3")."""
    N = graph.node_pose.shape[0]
    E = graph.edge_ij.shape[0]
    yaw = graph.node_pose[:, 2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    node_R = jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)
    node_t = jnp.stack([graph.node_pose[:, 0], graph.node_pose[:, 1],
                        graph.node_pose[:, 3]], -1)

    eyaw = graph.edge_rel[:, 2]
    ec, es = jnp.cos(eyaw), jnp.sin(eyaw)
    ez = jnp.zeros_like(ec)
    eo = jnp.ones_like(ec)
    edge_R = jnp.stack([
        jnp.stack([ec, -es, ez], -1),
        jnp.stack([es, ec, ez], -1),
        jnp.stack([ez, ez, eo], -1),
    ], -2)
    edge_t = jnp.stack([graph.edge_rel[:, 0], graph.edge_rel[:, 1],
                        graph.edge_rel[:, 3]], -1)

    idx = jnp.array([0, 1, 5, 2])                     # x y yaw z -> tangent
    info6 = jnp.zeros((E, 6, 6), graph.edge_info.dtype)
    info6 = info6.at[:, idx[:, None], idx[None, :]].set(graph.edge_info)
    rp = jnp.where(graph.edge_valid, rp_info, 0.0)
    info6 = info6.at[:, 3, 3].set(rp).at[:, 4, 4].set(rp)

    return Se3Graph(node_t=node_t, node_R=node_R,
                    node_valid=graph.node_valid,
                    edge_ij=graph.edge_ij, edge_t=edge_t, edge_R=edge_R,
                    edge_info=info6, edge_valid=graph.edge_valid)


# ---------------------------------------------------------------------------
# 6x6 LUM edge information (computeEdgeInformationLUM,
# graphSlamTools.cpp:108-214)
# ---------------------------------------------------------------------------


def edge_information_lum6(source_trans: jnp.ndarray, target: jnp.ndarray,
                          w: jnp.ndarray) -> jnp.ndarray:
    """The reference's LUM information as batched einsums.

    source_trans: (P, 3) source cloud already moved by the edge transform;
    target: (P, 3) the matched target point per source point (the reference
    does a kd NN lookup; callers pass `target[idx]` from our NN op);
    w: (P,) 0/1 correspondence weights (the reference's
    max_corr_distance gate, graphSlamTools.cpp:132).

    The reference accumulates, over correspondences with
    aver = (s + t) / 2 and diff = s - t, the normal equations of the
    linear model  diff ~= J(aver) @ D,  J's rows (graphSlamTools.cpp
    155-176, verified element-by-element against its MM/MZ updates):

        J_x = [1 0 0     0      -aver_y  aver_z]
        J_y = [0 1 0  -aver_z    aver_x    0   ]
        J_z = [0 0 1   aver_y      0    -aver_x]

    then info = (J^T J) / s^2 with s^2 the model's residual sum — i.e. the
    Gauss-Markov information of the 6-DoF alignment given the matched
    pairs. Singular / near-zero-residual cases return identity exactly as
    the reference does (graphSlamTools.cpp:204-210)."""
    dtype = source_trans.dtype
    aver = 0.5 * (source_trans + target)
    diff = source_trans - target
    ax, ay, az = aver[..., 0], aver[..., 1], aver[..., 2]
    zero = jnp.zeros_like(ax)
    one = jnp.ones_like(ax)
    J = jnp.stack([
        jnp.stack([one, zero, zero, zero, -ay, az], -1),
        jnp.stack([zero, one, zero, -az, ax, zero], -1),
        jnp.stack([zero, zero, one, ay, zero, -ax], -1),
    ], -2)                                            # (P, 3, 6)
    wJ = J * w[..., None, None]
    MM = jnp.einsum("pab,pac->bc", wJ, J)             # (6, 6)
    MZ = jnp.einsum("pab,pa->b", wJ, diff)
    n = jnp.sum(w)
    # solve MM D = MZ with a tiny regularizer so the solve itself never
    # NaNs; degenerate cases are routed to identity below like the
    # reference's singular fallback
    D = linalg.spd_solve(MM + jnp.eye(6, dtype=dtype) * 1e-9,
                         MZ[:, None])[:, 0]
    r = diff - jnp.einsum("pab,b->pa", J, D)
    ss = jnp.sum(w[..., None] * r * r)
    bad = (ss < 1e-13) | ~jnp.isfinite(ss) | (n < 7)
    info = MM / jnp.where(bad, 1.0, ss)
    return jnp.where(bad, jnp.eye(6, dtype=dtype), info)


# ---------------------------------------------------------------------------
# The optimizer: lift-solve-retract Gauss-Newton on SE(3)
# ---------------------------------------------------------------------------


def _edge_residuals_se3(node_t, node_R, graph: Se3Graph):
    """Stacked 6-vector residuals for all edges.

    e = [ R_z^T (R_i^T (t_j - t_i) - z_t) ;  Log(R_z^T R_i^T R_j) ]
    — the standard SE(3) edge error (g2o edge_se3.cpp semantics), with the
    translation part expressed in the measurement frame so the information
    matrix applies in the frame LUM computed it in."""
    i = graph.edge_ij[:, 0]
    j = graph.edge_ij[:, 1]
    Ri, Rj = node_R[i], node_R[j]
    dt = node_t[j] - node_t[i]
    local = jnp.einsum("eba,eb->ea", Ri, dt)          # R_i^T dt
    et = jnp.einsum("eba,eb->ea", graph.edge_R, local - graph.edge_t)
    Rerr = jnp.einsum("eba,ecb,ecd->ead", graph.edge_R, Ri, Rj)
    return jnp.concatenate([et, so3_log(Rerr)], axis=-1)   # (E, 6)


def optimize_se3(graph: Se3Graph, iterations: int = 10,
                 lm_lambda: float = 1e-3,
                 gauge_weight: float = 1e5,
                 min_delta: float = 1e-5) -> Se3Graph:
    """Dense batched Gauss-Newton on the SE(3) manifold.

    Each iteration lifts the problem to the tangent at the current estimate
    (node perturbations x_i = [dt_i; dw_i], applied as t <- t + R dt,
    R <- R Exp(dw) — the right/body convention), linearizes ALL edge
    residuals in one `jax.jacfwd`, assembles H = J^T Omega J as a dense
    6N x 6N matrix, and solves on the MXU. Node 0 carries a `gauge_weight`
    prior (the g2o setFixed(0) of graph_slam.cpp:330-334; 1e5 keeps the
    f32 Cholesky's diagonal span at ~1e9 while still dominating the
    largest edge informations by >=100x — see pose_graph.optimize);
    invalid nodes get a unit prior so H stays well-conditioned at any
    fill level.

    jits cleanly; vmap over a leading graph axis optimizes a fleet of
    graphs in one dispatch (the dense N is fixed by capacity)."""
    N = graph.node_t.shape[0]
    w_edge = graph.edge_valid.astype(graph.node_t.dtype)
    Om = graph.edge_info * w_edge[:, None, None]

    def gn_iter(state, _):
        t0, R0 = state

        def r_of_tangent(xi):                         # xi: (N, 6)
            dt, dw = xi[:, :3], xi[:, 3:]
            t = t0 + jnp.einsum("nab,nb->na", R0, dt)
            R = R0 @ so3_exp(dw)
            return _edge_residuals_se3(t, R, graph)   # (E, 6)

        xi0 = jnp.zeros((N, 6), t0.dtype)
        r = r_of_tangent(xi0)                         # (E, 6)
        J = jax.jacfwd(r_of_tangent)(xi0)             # (E, 6, N, 6)
        J = J.reshape(-1, N * 6)                      # (6E, 6N)
        Omr = jnp.einsum("eab,eb->ea", Om, r).reshape(-1)
        OmJ = jnp.einsum("eab,ebk->eak", Om,
                         J.reshape(-1, 6, N * 6)).reshape(-1, N * 6)
        H = J.T @ OmJ                                 # (6N, 6N) on the MXU
        b = J.T @ Omr
        diag = jnp.full((N * 6,), lm_lambda, t0.dtype)
        diag = diag.at[:6].set(gauge_weight)
        diag = diag + jnp.repeat(~graph.node_valid, 6) * 1.0
        # SPD system (GN normal equations + positive priors): blocked
        # Cholesky instead of jnp.linalg.solve — the TPU LU expander's
        # pivoting While loop dominated the graph tick (docs/PERF.md)
        Hd = H + jnp.diag(diag)
        L = linalg.cholesky_blocked(Hd)
        dx = linalg.back_substitute_blocked(
            L, linalg.forward_substitute_blocked(L, -b[:, None]))[:, 0]
        dx = dx.reshape(N, 6)
        t1 = t0 + jnp.einsum("nab,nb->na", R0, dx[:, :3])
        R1 = R0 @ so3_exp(dx[:, 3:])
        step = jnp.max(jnp.abs(dx) * graph.node_valid[:, None])
        return (t1, R1), step

    if min_delta > 0:
        # batch early exit, same construct/tolerance argument as
        # pose_graph.optimize: a skipped iteration would move the tangent
        # update < min_delta, and under vmap the loop runs until EVERY
        # graph in the fleet has converged (jax freezes finished elements).
        def cond(carry):
            _, it, step = carry
            return (it < iterations) & (step >= min_delta)

        def body(carry):
            state, it, _ = carry
            state, step = gn_iter(state, None)
            return state, it + 1, step

        big = jnp.asarray(jnp.inf, graph.node_t.dtype)
        (t, R), _, _ = jax.lax.while_loop(
            cond, body, ((graph.node_t, graph.node_R), jnp.int32(0), big))
    else:
        (t, R), _ = jax.lax.scan(gn_iter, (graph.node_t, graph.node_R),
                                 None, length=iterations)
    keep = graph.node_valid[:, None]
    t = jnp.where(keep, t, graph.node_t)
    R = jnp.where(keep[..., None], R, graph.node_R)
    return graph.replace(node_t=t, node_R=R)


def optimize_planar(graph: PoseGraph, cfg) -> tuple[PoseGraph, jnp.ndarray]:
    """Drop-in replacement for `pose_graph.optimize` that routes the planar
    production graph through the full SE(3) solver — the reference's literal
    pipeline typing (its graph is g2o VertexSE3/EdgeSE3 even though every
    edge comes from planar ICP, graph_slam.cpp:43-49, 179-186). Selected by
    `GraphConfig.engine = "se3"`.

    Lift (from_planar: yaw -> Rz, 4x4 info -> 6x6 LUM embedding with
    roll/pitch pinned), optimize on the manifold, project back to
    (x, y, yaw, z), and return the newest-node pre/post delta exactly like
    the SE(2) x z path (graph_slam.cpp:357-384)."""
    from slam_tpu.geometry import angle_wrap
    from slam_tpu.graph.pose_graph import newest_node

    last, _ = newest_node(graph)
    pre_last = graph.node_pose[last]

    se3 = from_planar(graph)
    se3 = optimize_se3(se3, iterations=cfg.opt_iterations,
                       lm_lambda=cfg.lm_lambda,
                       min_delta=getattr(cfg, "opt_min_delta", 1e-5))

    yaw = jnp.arctan2(se3.node_R[:, 1, 0], se3.node_R[:, 0, 0])
    new_pose = jnp.stack([se3.node_t[:, 0], se3.node_t[:, 1], yaw,
                          se3.node_t[:, 2]], axis=-1)
    new_pose = jnp.where(graph.node_valid[:, None], new_pose,
                         graph.node_pose)
    delta = new_pose[last] - pre_last
    delta = delta.at[2].set(angle_wrap(delta[2]))
    return graph.replace(node_pose=new_pose), delta


def from_native(graph: PoseGraph) -> Se3Graph:
    """Assemble the SE(3) problem from a 6-DoF product graph
    (edge_registration="3d"): node rotations from the full roll/pitch/yaw,
    edge measurements/informations straight from the 3D edge chain
    (edge_rel6 = [t; rotvec], edge_info6 = LUM 6x6) — no planar lift, no
    pinned roll/pitch rows. This is the reference's literal
    VertexSE3/EdgeSE3 graph (graph_slam.cpp:43-49, 179-186) with its
    measured 6-DoF edges (graphSlamTools.cpp:241-298)."""
    from slam_tpu.geometry import rot3_from_rpy

    poses = graph.node_pose
    node_R = rot3_from_rpy(graph.node_rp[:, 0], graph.node_rp[:, 1],
                           poses[:, 2])
    node_t = jnp.stack([poses[:, 0], poses[:, 1], poses[:, 3]], -1)
    return Se3Graph(node_t=node_t, node_R=node_R,
                    node_valid=graph.node_valid,
                    edge_ij=graph.edge_ij,
                    edge_t=graph.edge_rel6[:, :3],
                    edge_R=so3_exp(graph.edge_rel6[:, 3:]),
                    edge_info=graph.edge_info6,
                    edge_valid=graph.edge_valid)


def optimize_native(graph: PoseGraph, cfg) -> tuple[PoseGraph, jnp.ndarray]:
    """Product-path SE(3) optimization over MEASURED 6-DoF edges — the
    engine="se3" + edge_registration="3d" route (the reference's full
    optimizeGraph, graph_slam.cpp:322-390, with edges that genuinely
    observe z and attitude).

    Solves on the manifold, writes (x, y, yaw, z) AND node_rp back, and
    returns the newest node's (x, y, yaw, z) pre/post delta for the
    downstream map/EKF shifting (graph_slam.cpp:357-384 — the reference's
    pose_offset topic is itself planar + z)."""
    from slam_tpu.geometry import angle_wrap
    from slam_tpu.graph.pose_graph import newest_node

    last, _ = newest_node(graph)
    pre_last = graph.node_pose[last]

    se3 = from_native(graph)
    se3 = optimize_se3(se3, iterations=cfg.opt_iterations,
                       lm_lambda=cfg.lm_lambda,
                       min_delta=getattr(cfg, "opt_min_delta", 1e-5))

    yaw = jnp.arctan2(se3.node_R[:, 1, 0], se3.node_R[:, 0, 0])
    # ZYX Euler extraction, inverse of rot3_from_rpy: r20 = -sin(pitch),
    # r21 = cos(pitch) sin(roll), r22 = cos(pitch) cos(roll)
    pitch = -jnp.arcsin(jnp.clip(se3.node_R[:, 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(se3.node_R[:, 2, 1], se3.node_R[:, 2, 2])
    new_pose = jnp.stack([se3.node_t[:, 0], se3.node_t[:, 1], yaw,
                          se3.node_t[:, 2]], axis=-1)
    keep = graph.node_valid[:, None]
    new_pose = jnp.where(keep, new_pose, graph.node_pose)
    new_rp = jnp.where(keep, jnp.stack([roll, pitch], -1), graph.node_rp)
    delta = new_pose[last] - pre_last
    delta = delta.at[2].set(angle_wrap(delta[2]))
    return graph.replace(node_pose=new_pose, node_rp=new_rp), delta


def total_chi2(graph: Se3Graph) -> jnp.ndarray:
    """Sum of e^T Omega e over valid edges (g2o activeChi2)."""
    e = _edge_residuals_se3(graph.node_t, graph.node_R, graph)
    w = graph.edge_valid.astype(e.dtype)
    return jnp.einsum("ea,eab,eb,e->", e, graph.edge_info, e, w)
