"""Keyframe pose-graph SLAM — TPU-native rebuild of graph_slam/.

Replaces:
  - g2o VertexSE3/EdgeSE3 + BlockSolver/CSparse/Levenberg (graph_slam.cpp:43-49,
    322-390) with a fixed-capacity node/edge pytree and a batched dense
    Gauss-Newton/LM solve on SE(2) x z. At the reference's graph sizes
    (keyframes every 5 m, graphSlamTools.h:26) a dense 3N x 3N solve is faster
    on the MXU than any sparse factorization, and it vmaps across robots.
  - keyframe gating + KNN edge selection (graph_slam.cpp:494-519,
    graphSlamTools.cpp:43-106): brute-force masked distance ranking.
  - calcEdgeIcp (graphSlamTools.cpp:218-364): edge refinement via our
    class-constrained ICP between stored keyframe clouds, information from the
    2D Censi/LUM matrix, and the same >10 m / >0.2 rad rejection gates.
  - regenerateGlobalMap (graph_slam.cpp:260-280): re-scatter of all keyframe
    clouds under optimized poses into the map target.

Deviation (measured boundary): the default engine optimizes SE(2) x z with
edge z taken from the pose difference — fine where edges carry no attitude
signal, but a loop-closure edge's z then CONFIRMS accumulated drift rather
than correcting it. The reference's full chain (3D GICP edge refinement on
velodyne-frame keyframes -> 6x6 LUM -> VertexSE3/EdgeSE3,
graphSlamTools.cpp:241-298) is available as `engine="se3"` +
`edge_registration="3d"` (_edge_measurement_3d + pose_graph3d
.optimize_native); tests/test_graph_se3_edges.py measures the boundary: a
drifted-z loop collapses to <6 cm under 3D edges while the planar chain
keeps the full drift, and a biased-IMU ramp mission improves node-z 25%.
Use the planar default on benign terrain (same accuracy, cheaper edges).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tpu.config import GraphConfig, IcpConfig
from slam_tpu.geometry import angle_wrap, se2_apply, se2_relative
from slam_tpu.ops import linalg
from slam_tpu.ops.icp import edge_information_2d, icp_fit
from slam_tpu.ops.nn import nearest_neighbor
from slam_tpu.types import PoseGraph, PointCloud


def init_graph(cfg: GraphConfig, dtype=jnp.float32) -> PoseGraph:
    N, E, P = cfg.max_nodes, cfg.max_edges, cfg.keyframe_points
    full3d = cfg.edge_registration == "3d"
    if full3d and cfg.engine != "se3":
        raise ValueError(
            'edge_registration="3d" produces SE(3) measurements only the '
            '"se3" engine consumes; set GraphConfig.engine="se3"')
    return PoseGraph(
        node_pose=jnp.zeros((N, 4), dtype),
        node_valid=jnp.zeros((N,), bool),
        node_stamp=-jnp.ones((N,), jnp.int32),
        kf_xyz=jnp.zeros((N, P, 3), dtype),
        kf_valid=jnp.zeros((N, P), bool),
        kf_flags=jnp.zeros((N, P), jnp.int32),
        edge_ij=jnp.zeros((E, 2), jnp.int32),
        edge_rel=jnp.zeros((E, 4), dtype),
        edge_info=jnp.zeros((E, 4, 4), dtype),
        edge_valid=jnp.zeros((E,), bool),
        num_nodes=jnp.int32(0),
        num_edges=jnp.int32(0),
        edges_dropped=jnp.int32(0),
        node_rp=jnp.zeros((N, 2), dtype) if full3d else None,
        edge_rel6=jnp.zeros((E, 6), dtype) if full3d else None,
        edge_info6=jnp.zeros((E, 6, 6), dtype) if full3d else None,
    )


def nearest_kf_dist(graph: PoseGraph, pose_xy: jnp.ndarray) -> jnp.ndarray:
    """2D distance to the nearest keyframe (graphSlamGetNearestKF,
    graphSlamTools.cpp:43-65). inf when the graph is empty."""
    d = jnp.linalg.norm(graph.node_pose[:, :2] - pose_xy, axis=-1)
    d = jnp.where(graph.node_valid, d, jnp.inf)
    return jnp.min(d)


def knn_keyframes(graph: PoseGraph, pose_xy: jnp.ndarray, k: int,
                  exclude: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest keyframe indices by 2D distance (graphSlamGetKNN,
    graphSlamTools.cpp:72-106), excluding node `exclude` (the new node)."""
    d = jnp.linalg.norm(graph.node_pose[:, :2] - pose_xy, axis=-1)
    d = jnp.where(graph.node_valid, d, jnp.inf)
    d = jnp.where(jnp.arange(d.shape[0]) == exclude, jnp.inf, d)
    kk = min(k, d.shape[0])  # graphs smaller than k (tiny max_nodes configs)
    neg, idx = jax.lax.top_k(-d, kk)
    ok = jnp.isfinite(-neg)
    if kk < k:
        idx = jnp.concatenate([idx, jnp.zeros(k - kk, idx.dtype)])
        ok = jnp.concatenate([ok, jnp.zeros(k - kk, bool)])
    return idx, ok


def _edge_measurement(graph: PoseGraph, i: jnp.ndarray, j: jnp.ndarray,
                      icp_cfg: IcpConfig, gcfg: GraphConfig):
    """Edge i->j: ICP-refine the relative pose between keyframe clouds
    (calcEdgeIcp, graphSlamTools.cpp:218-364).

    Both clouds are expressed in their node frames. The scene (node j's cloud)
    is registered against the model (node i's cloud) with init = relative
    odometry pose (Mfrom^-1 * Mto, graphSlamTools.cpp:258).
    """
    import dataclasses as _dc

    pi = graph.node_pose[i]
    pj = graph.node_pose[j]
    init_rel = se2_relative(pi[:3], pj[:3])

    # the edge refinement runs on the GRAPH's ICP budget (edge_icp_max_iter,
    # the reference's GICP budget), not the scan matcher's 20; the 0.5 m
    # edge voxelization (edge_icp_voxel) is satisfied implicitly — keyframe
    # clouds are stored already voxel-downsampled at that leaf by the scene
    # builder (graphSlamTools.cpp:279-286 voxelizes for the same reason)
    icp_cfg = _dc.replace(icp_cfg, max_iterations=gcfg.edge_icp_max_iter)

    scene_xyz = graph.kf_xyz[j][:, :2]
    scene_valid = graph.kf_valid[j]
    scene_ga = (graph.kf_flags[j] & PointCloud.FLAG_GA) != 0
    model_xyz = graph.kf_xyz[i][:, :2]
    model_valid = graph.kf_valid[i]
    model_ga = (graph.kf_flags[i] & PointCloud.FLAG_GA) != 0

    if jax.default_backend() == "tpu":
        from slam_tpu.ops.icp_pallas import make_icp_fused
        res = make_icp_fused(icp_cfg)(scene_xyz, scene_valid, scene_ga,
                                      model_xyz, model_valid, model_ga,
                                      init_rel)
    else:
        res = icp_fit(scene_xyz, scene_valid, scene_ga,
                      model_xyz, model_valid, model_ga, init_rel, icp_cfg)

    # information from final correspondences (computeEdgeInformationLUM core,
    # graphSlamTools.cpp:108-214, restricted to the (x, y, yaw) block)
    from slam_tpu.geometry import rot2
    R = rot2(res.pose[2])
    q = scene_xyz @ R.T + res.pose[:2]
    idx, d2 = nearest_neighbor(q, model_xyz, model_valid)
    w = (scene_valid & (d2 < gcfg.edge_max_corr ** 2)).astype(q.dtype)
    info3 = edge_information_2d(q, model_xyz[idx], w)

    # rejection gates (graphSlamTools.cpp:333-358) + a minimum-overlap gate:
    # with no correspondences the LUM information degenerates to ~0 (the
    # reference would add a zero-weight edge); rejecting outright keeps the
    # graph free of meaningless edges (e.g. across a kidnap discontinuity)
    x_diff = jnp.abs(init_rel[0] - res.pose[0])
    y_diff = jnp.abs(init_rel[1] - res.pose[1])
    t_diff = jnp.abs(angle_wrap(init_rel[2] - res.pose[2]))
    ok = res.ok & (x_diff <= gcfg.dist_move_thresh) & \
        (y_diff <= gcfg.dist_move_thresh) & \
        (t_diff <= gcfg.rot_move_thresh) & (jnp.sum(w) >= gcfg.edge_min_corr)

    rel = jnp.concatenate([res.pose, (pj[3] - pi[3])[None]])
    info4 = jnp.zeros((4, 4), info3.dtype)
    info4 = info4.at[:3, :3].set(info3).at[3, 3].set(1.0)
    return rel, info4, ok


def _edge_measurement_3d(graph: PoseGraph, i: jnp.ndarray, j: jnp.ndarray,
                         icp_cfg: IcpConfig, gcfg: GraphConfig):
    """Edge i->j via FULL 3D registration — the reference's literal chain
    (calcEdgeIcp, graphSlamTools.cpp:241-298): both keyframe clouds are
    already voxel-downsampled (stored that way, like the 0.5 m leaf of
    graphSlamTools.cpp:279-286), the init is the SE(3) relative odometry
    Mfrom^-1 * Mto (graphSlamTools.cpp:258), the refinement is 3D
    point-to-point ICP (ops/icp3d.py, the gicp.align role), and the
    information is the 6x6 LUM matrix over the FINAL 3D correspondences
    (computeEdgeInformationLUM, graphSlamTools.cpp:108-214).

    Returns (rel4, info4, rel6, info6, ok): rel6 = [t; rotvec] and info6
    feed the SE(3) optimizer natively; rel4/info4 are the planar projection
    kept alongside for the 4-DoF consumers (map regeneration plumbing).
    """
    import dataclasses as _dc

    from slam_tpu.geometry import rot3_from_rpy
    from slam_tpu.graph.pose_graph3d import edge_information_lum6, so3_log
    from slam_tpu.ops.icp3d import icp3d_fit

    pi = graph.node_pose[i]
    pj = graph.node_pose[j]
    rpi = graph.node_rp[i]
    rpj = graph.node_rp[j]
    Ri = rot3_from_rpy(rpi[0], rpi[1], pi[2])
    Rj = rot3_from_rpy(rpj[0], rpj[1], pj[2])
    ti = jnp.stack([pi[0], pi[1], pi[3]])
    tj = jnp.stack([pj[0], pj[1], pj[3]])
    init_R = Ri.T @ Rj
    init_t = Ri.T @ (tj - ti)

    def point_class(flags):
        # 0 = non-GA obstacle, 1 = GA obstacle, 2 = ground — ground points
        # ride in the 6-DoF keyframes (like the reference's raw voxelized
        # keyframe clouds) and are what constrain z in the registration
        ga = (flags & PointCloud.FLAG_GA) != 0
        gnd = (flags & PointCloud.FLAG_GROUND) != 0
        return jnp.where(gnd, 2, jnp.where(ga, 1, 0)).astype(jnp.int32)

    scene_xyz = graph.kf_xyz[j]
    scene_valid = graph.kf_valid[j]
    scene_class = point_class(graph.kf_flags[j])
    model_xyz = graph.kf_xyz[i]
    model_valid = graph.kf_valid[i]
    model_class = point_class(graph.kf_flags[i])

    icp_cfg = _dc.replace(icp_cfg, max_iterations=gcfg.edge_icp_max_iter)
    res = icp3d_fit(scene_xyz, scene_valid, scene_class,
                    model_xyz, model_valid, model_class, init_t, init_R,
                    icp_cfg)

    # 6x6 LUM information over the final correspondences with the
    # reference's max-correspondence gate (graphSlamTools.cpp:302 0.75 m)
    from slam_tpu.ops.nn import nearest_neighbor
    q = scene_xyz @ res.R.T + res.t
    idx, d2 = nearest_neighbor(q, model_xyz, model_valid)
    w = (scene_valid & (d2 < gcfg.edge_max_corr ** 2)).astype(q.dtype)
    info6 = edge_information_lum6(q, model_xyz[idx], w)

    # rejection gates (graphSlamTools.cpp:333-358): per-axis translation
    # move vs the odometry prior + total rotation-angle move, plus the
    # minimum-overlap gate shared with the 2D path
    t_move = jnp.abs(res.t - init_t)
    w_move = so3_log(jnp.einsum("ba,bc->ac", init_R, res.R))
    ok = res.ok & jnp.all(t_move <= gcfg.dist_move_thresh) & \
        (jnp.linalg.norm(w_move) <= gcfg.rot_move_thresh) & \
        (jnp.sum(w) >= gcfg.edge_min_corr)

    rel6 = jnp.concatenate([res.t, so3_log(res.R)])
    # planar projection for the 4-DoF plumbing (regenerate_map reads
    # node_pose only, but edge_rel stays coherent for diagnostics/interop)
    yaw = jnp.arctan2(res.R[1, 0], res.R[0, 0])
    rel4 = jnp.stack([res.t[0], res.t[1], yaw, res.t[2]])
    emb = jnp.array([0, 1, 5, 2])        # x y yaw z -> tangent indices
    info4 = info6[emb[:, None], emb[None, :]]
    return rel4, info4, rel6, info6, ok


def newest_node(graph: PoseGraph) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(index, exists) of the most recently inserted valid node. Slots are
    reused by eviction, so this is a stamp lookup, not num_nodes - 1."""
    stamp = jnp.where(graph.node_valid, graph.node_stamp, -1)
    return jnp.argmax(stamp), jnp.max(stamp) >= 0


def _eviction_slot(graph: PoseGraph, degree_weight: float = 0.5,
                   protect_recent: int = 1):
    """Cheapest keyframe to evict: spatial redundancy (small distance to
    another keyframe) DISCOUNTED by graph connectivity, excluding node 0
    (the gauge/home anchor, graph_slam.cpp:102-146 HOME rebuilds from
    keyframe 0) and the newest node (trajectory continuity).

    Redundancy alone (round-1 policy) measured 7x the no-eviction ATE at 4x
    capacity overrun (docs/PERF.md eviction study): revisited areas are
    exactly where old keyframes accumulate loop-closure edges, and
    "closest to another node" preferentially deletes those anchors —
    removing the edges that pin the whole graph. Evictability here is

        dmin + degree_weight * edge_degree     (argmin = evict)

    so a spatially-redundant node is only evicted once enough equally-
    redundant LOW-degree nodes are gone; high-degree loop anchors survive.
    degree_weight is meters-per-edge (GraphConfig.evict_degree_weight).
    Returns (slot, evictable?)."""
    xy = graph.node_pose[:, :2]
    N = xy.shape[0]
    d = jnp.linalg.norm(xy[:, None, :] - xy[None, :, :], axis=-1)
    pair_ok = graph.node_valid[:, None] & graph.node_valid[None, :] & \
        ~jnp.eye(N, dtype=bool)
    dmin = jnp.min(jnp.where(pair_ok, d, jnp.inf), axis=1)
    ev = graph.edge_valid
    degree = (jnp.sum(jax.nn.one_hot(graph.edge_ij[:, 0], N) * ev[:, None], 0)
              + jnp.sum(jax.nn.one_hot(graph.edge_ij[:, 1], N)
                        * ev[:, None], 0))
    # protect the `protect_recent` newest nodes (trajectory continuity —
    # the local map around the robot is regenerated from exactly these;
    # protect_recent=1 is the newest-node exclusion alone)
    k = max(1, int(protect_recent))
    recent = graph.node_stamp > (jnp.max(graph.node_stamp) - k)
    score = jnp.where(
        graph.node_valid & (jnp.arange(N) != 0) & ~recent,
        dmin + degree_weight * degree, jnp.inf)
    return jnp.argmin(score), jnp.isfinite(jnp.min(score))


def add_keyframe(graph: PoseGraph, pose: jnp.ndarray, cloud: PointCloud,
                 icp_cfg: IcpConfig, cfg: GraphConfig,
                 min_points: int | None = None,
                 attitude: jnp.ndarray | None = None
                 ) -> tuple[PoseGraph, jnp.ndarray]:
    """Gate + insert a keyframe and its edges (graph_slam.cpp:479-519).

    pose: (4,) x, y, yaw, z. cloud: segmented scene in the robot frame (the
    reference stores velodyne-frame keyframes, graph_slam.cpp:503). Returns
    (graph, added?).

    attitude: (2,) measured IMU roll/pitch at capture — used only in 6-DoF
    mode (edge_registration="3d"), where the keyframe cloud is stored
    TILTED (rotated back into the capture body frame, matching the
    reference's velodyne-frame keyframes) so 3D edge registration observes
    relative attitude from the data, and node_rp is initialized from it.

    Capacity policy: when the fixed-capacity graph is full, the most
    redundant keyframe (smallest distance to another keyframe, never node 0
    or the newest) is EVICTED — its slot and edges are reclaimed — so
    mapping never silently degrades (round-1 behavior). The reference grows
    unboundedly and rebuilds the world map at O(N) per optimization
    (graph_slam.cpp:260-280); bounded memory without silent degradation
    beats that cliff.
    """
    if min_points is None:
        min_points = 0
    far_enough = nearest_kf_dist(graph, pose[:2]) > cfg.knn_dist_thresh
    first = graph.num_nodes == 0
    has_room = graph.num_nodes < cfg.max_nodes
    enough_pts = cloud.count() >= min_points
    want = (far_enough | first) & enough_pts

    evict_slot, evictable = _eviction_slot(
        graph, degree_weight=cfg.evict_degree_weight,
        protect_recent=cfg.evict_protect_recent)
    add = want & (has_room | evictable)
    evicting = add & ~has_room

    n = graph.num_nodes
    slot = jnp.where(has_room, jnp.minimum(n, cfg.max_nodes - 1), evict_slot)

    # drop edges touching the evicted node
    edge_dead = evicting & ((graph.edge_ij[:, 0] == slot) |
                            (graph.edge_ij[:, 1] == slot))
    edge_valid = graph.edge_valid & ~edge_dead

    from slam_tpu.ops.voxel import compact
    packed = compact(cloud, cfg.keyframe_points)
    kf_xyz = packed.xyz
    kf_valid = packed.valid
    kf_flags = packed.flags
    stamp = jnp.max(graph.node_stamp) + 1

    full3d = graph.node_rp is not None
    if attitude is None:
        attitude = jnp.zeros(2, pose.dtype)
    if full3d:
        # store the cloud in the capture BODY frame: p_body = R_rp^T p_up
        # (inverse of the pipeline's rp_compensate) — the tilt stays in the
        # data like the reference's velodyne-frame keyframes, so 3D edge
        # ICP can measure relative attitude between capture poses
        from slam_tpu.geometry import rot3_from_rpy
        R_rp = rot3_from_rpy(attitude[0], attitude[1],
                             jnp.zeros((), pose.dtype))
        kf_xyz = kf_xyz @ R_rp          # == (R_rp^T kf^T)^T

    new_graph = graph.replace(
        node_pose=graph.node_pose.at[slot].set(jnp.where(add, pose,
                                                         graph.node_pose[slot])),
        node_valid=graph.node_valid.at[slot].set(
            jnp.where(add, True, graph.node_valid[slot])),
        node_stamp=graph.node_stamp.at[slot].set(
            jnp.where(add, stamp, graph.node_stamp[slot])),
        kf_xyz=graph.kf_xyz.at[slot].set(
            jnp.where(add, kf_xyz, graph.kf_xyz[slot])),
        kf_valid=graph.kf_valid.at[slot].set(
            jnp.where(add, kf_valid, graph.kf_valid[slot])),
        kf_flags=graph.kf_flags.at[slot].set(
            jnp.where(add, kf_flags, graph.kf_flags[slot])),
        edge_valid=edge_valid,
        num_edges=jnp.sum(edge_valid).astype(graph.num_edges.dtype),
        num_nodes=jnp.where(add & has_room, n + 1, n),
    )
    if full3d:
        new_graph = new_graph.replace(
            node_rp=graph.node_rp.at[slot].set(
                jnp.where(add, attitude, graph.node_rp[slot])))

    # edges: previous (most recent other) node + KNN (graph_slam.cpp:508-519)
    def make_edges(g: PoseGraph) -> PoseGraph:
        other_stamp = jnp.where(
            g.node_valid & (jnp.arange(g.node_stamp.shape[0]) != slot),
            g.node_stamp, -1)
        prev = jnp.argmax(other_stamp).astype(jnp.int32)
        prev_ok = jnp.max(other_stamp) >= 0
        knn_idx, knn_ok = knn_keyframes(g, pose[:2], cfg.knn_edges, slot)
        cand = jnp.concatenate([prev[None], knn_idx])
        cand_ok = jnp.concatenate([prev_ok[None],
                                   knn_ok & (knn_idx != prev)])

        # all candidate edge ICPs in ONE batched call (the reference runs
        # them serially, graph_slam.cpp:508-519; vmap keeps the fused kernel
        # busy with 4 problems instead of dispatching it 4 times)
        if full3d:
            rels, infos, rel6s, info6s, icp_oks = jax.vmap(
                lambda src: _edge_measurement_3d(g, src, slot, icp_cfg,
                                                 cfg))(cand)
        else:
            rels, infos, icp_oks = jax.vmap(
                lambda src: _edge_measurement(g, src, slot, icp_cfg,
                                              cfg))(cand)
            rel6s = jnp.zeros((cand.shape[0], 6), rels.dtype)
            info6s = jnp.zeros((cand.shape[0], 6, 6), rels.dtype)

        def add_one(g: PoseGraph, args):
            src, ok_c, rel, info, rel6, info6, icp_ok = args
            # first free edge slot (eviction reclaims slots, so scan for one
            # rather than using a cursor)
            e = jnp.argmin(g.edge_valid).astype(jnp.int32)
            room = ~g.edge_valid[e]
            do = ok_c & icp_ok & room
            # an ACCEPTED measurement that found no slot is counted, never
            # silently lost (the keyframe would otherwise float edge-less
            # on the regularizer with no signal that max_edges is too small)
            dropped = ok_c & icp_ok & ~room
            new_valid = g.edge_valid.at[e].set(
                jnp.where(do, True, g.edge_valid[e]))
            g = g.replace(
                edge_ij=g.edge_ij.at[e].set(
                    jnp.where(do, jnp.stack([src, slot]), g.edge_ij[e])),
                edge_rel=g.edge_rel.at[e].set(jnp.where(do, rel, g.edge_rel[e])),
                edge_info=g.edge_info.at[e].set(
                    jnp.where(do, info, g.edge_info[e])),
                edge_valid=new_valid,
                num_edges=jnp.sum(new_valid).astype(g.num_edges.dtype),
                edges_dropped=g.edges_dropped + dropped.astype(jnp.int32),
            )
            if full3d:
                g = g.replace(
                    edge_rel6=g.edge_rel6.at[e].set(
                        jnp.where(do, rel6, g.edge_rel6[e])),
                    edge_info6=g.edge_info6.at[e].set(
                        jnp.where(do, info6, g.edge_info6[e])))
            return g, None

        g, _ = jax.lax.scan(add_one, g,
                            (cand, cand_ok, rels, infos, rel6s, info6s,
                             icp_oks))
        return g

    with_edges = jax.lax.cond(add & ~first, make_edges,
                              lambda g: g, new_graph)
    return with_edges, add


def _se2_edge_residuals(poses: jnp.ndarray, graph: PoseGraph):
    """Residuals + Jacobian blocks for all edges (vectorized).

    e_ij = [Rz^T (Ri^T (tj - ti) - z_t); wrap(thj - thi - z_th)]
    """
    i = graph.edge_ij[:, 0]
    j = graph.edge_ij[:, 1]
    pi = poses[i]
    pj = poses[j]
    z = graph.edge_rel

    ci, si = jnp.cos(pi[:, 2]), jnp.sin(pi[:, 2])
    dtx = pj[:, 0] - pi[:, 0]
    dty = pj[:, 1] - pi[:, 1]
    # Ri^T (tj - ti)
    lx = ci * dtx + si * dty
    ly = -si * dtx + ci * dty
    cz, sz = jnp.cos(z[:, 2]), jnp.sin(z[:, 2])
    ex = cz * (lx - z[:, 0]) + sz * (ly - z[:, 1])
    ey = -sz * (lx - z[:, 0]) + cz * (ly - z[:, 1])
    eth = angle_wrap(pj[:, 2] - pi[:, 2] - z[:, 2])
    e = jnp.stack([ex, ey, eth], axis=-1)                       # (E, 3)

    # d(Ri^T dt)/dth_i = dRi^T/dth dt = [-si ci; -ci -si] dt
    dlx = -si * dtx + ci * dty
    dly = -ci * dtx - si * dty
    Rz_T = jnp.stack([jnp.stack([cz, sz], -1),
                      jnp.stack([-sz, cz], -1)], -2)            # (E, 2, 2)
    RiT = jnp.stack([jnp.stack([ci, si], -1),
                     jnp.stack([-si, ci], -1)], -2)
    Zero = jnp.zeros_like(ci)
    One = jnp.ones_like(ci)

    # A = de/dxi (E, 3, 3)
    A_tt = -jnp.einsum("eab,ebc->eac", Rz_T, RiT)
    A_tth = jnp.einsum("eab,eb->ea", Rz_T, jnp.stack([dlx, dly], -1))
    A = jnp.concatenate([
        jnp.concatenate([A_tt, A_tth[..., None]], axis=-1),
        jnp.stack([Zero, Zero, -One], -1)[:, None, :],
    ], axis=-2)
    # B = de/dxj
    B_tt = jnp.einsum("eab,ebc->eac", Rz_T, RiT)
    B = jnp.concatenate([
        jnp.concatenate([B_tt, jnp.zeros_like(A_tth)[..., None]], axis=-1),
        jnp.stack([Zero, Zero, One], -1)[:, None, :],
    ], axis=-2)
    return e, A, B


def optimize(graph: PoseGraph, cfg: GraphConfig) -> tuple[PoseGraph, jnp.ndarray]:
    """Batched dense Gauss-Newton/LM over (x, y, yaw), then a linear z solve.

    Mirrors optimizeGraph (graph_slam.cpp:322-390): node 0 fixed, fixed
    iteration count, returns the pose-offset delta of the last node
    (pre - post, graph_slam.cpp:357-384) for downstream map/EKF shifting.
    """
    N = graph.node_pose.shape[0]
    info3 = graph.edge_info[:, :3, :3]
    w_edge = graph.edge_valid.astype(graph.node_pose.dtype)
    i_idx = graph.edge_ij[:, 0]
    j_idx = graph.edge_ij[:, 1]

    last, _ = newest_node(graph)
    pre_last = graph.node_pose[last]

    # incidence selectors: H/b assembly as (N,E)@(E,N) contractions on the
    # MXU instead of 4 indexed scatter-adds per iteration (TPU scatters were
    # the bulk of a 274 ms/256-robot optimize; the one-hot form is pure
    # matmul and fuses into the iteration). Scaling assumption: the blk()
    # einsum is O(E*N^2) FLOPs/iteration — cheap at the mission capacities
    # this graph is sized for (N<=64, E<=320: ~4 MFLOP), quadratic in N if
    # capacity is raised far beyond that; at N >~ 512 revisit with a
    # scatter-add fallback.
    Si = jax.nn.one_hot(i_idx, N, dtype=graph.node_pose.dtype)   # (E, N)
    Sj = jax.nn.one_hot(j_idx, N, dtype=graph.node_pose.dtype)

    # gauge fix: strong prior on node 0; identity regularizer on
    # invalid/disconnected nodes + LM damping. 1e5 (not 1e8): it only has
    # to dominate the largest edge information (relocalization edges inject
    # 1000, reloc_info_xy) by enough to pin node 0 below solver tolerance
    # (displacement <= E*info/gauge ~ 1e-2 m * 1e3/1e5 = 1e-4 m), while the
    # unpivoted f32 Cholesky below sees a diagonal span of 1e5..1e-4 =
    # 1e9 instead of 1e12 — comfortably inside f32 for a damped SPD system.
    diag = jnp.ones(3 * N, graph.node_pose.dtype) * cfg.lm_lambda
    diag = diag.at[:3].set(1e5)
    diag = diag + jnp.repeat(~graph.node_valid, 3) * 1.0

    def gn_step(poses):
        e, A, B = _se2_edge_residuals(poses, graph)
        Om = info3 * w_edge[:, None, None]

        AtO = jnp.einsum("eba,ebc->eac", A, Om)
        BtO = jnp.einsum("eba,ebc->eac", B, Om)
        # J^T Om J with J = Si (x) A + Sj (x) B, assembled blockwise:
        # H[m, a, n, b] = sum_e Sx[e,m] P[e,a,b] Sy[e,n]
        def blk(Sx, P, Sy):
            return jnp.einsum("em,eab,en->manb", Sx, P, Sy)
        H = (blk(Si, jnp.einsum("eab,ebc->eac", AtO, A), Si)
             + blk(Si, jnp.einsum("eab,ebc->eac", AtO, B), Sj)
             + blk(Sj, jnp.einsum("eab,ebc->eac", BtO, A), Si)
             + blk(Sj, jnp.einsum("eab,ebc->eac", BtO, B), Sj))
        b = (jnp.einsum("em,ea->ma", Si, jnp.einsum("eab,eb->ea", AtO, e))
             + jnp.einsum("em,ea->ma", Sj, jnp.einsum("eab,eb->ea", BtO, e)))

        Hd = H.reshape(3 * N, 3 * N) + jnp.diag(diag)
        bd = b.reshape(3 * N)
        # Hd is SPD (GN normal equations + positive damping): blocked
        # Cholesky + substitutions instead of jnp.linalg.solve — XLA's TPU
        # LU expander emits a serialized pivoting While loop that dominated
        # the whole graph tick (docs/PERF.md config-4 breakdown)
        L = linalg.cholesky_blocked(Hd)
        dx = linalg.back_substitute_blocked(
            L, linalg.forward_substitute_blocked(L, -bd[:, None]))[:, 0]
        poses = poses + dx.reshape(N, 3)
        poses = poses.at[:, 2].set(angle_wrap(poses[:, 2]))
        # convergence signal: the largest update applied to any VALID node
        # (invalid slots are regularized to ~0 motion and would understate)
        step = jnp.max(jnp.abs(dx.reshape(N, 3)) *
                       graph.node_valid[:, None])
        return poses, step

    if getattr(cfg, "opt_min_delta", 1e-5) > 0:
        # batch-early-exit while loop (the ICP fit loop's construct,
        # ops/icp.py): under vmap the predicate becomes "any robot still
        # moving", so a converged fleet skips the remaining assembly+solve
        # iterations — each skipped step would move poses < opt_min_delta,
        # i.e. results match the fixed-length scan to that tolerance.
        min_delta = getattr(cfg, "opt_min_delta", 1e-5)

        def cond(carry):
            _, it, step = carry
            return (it < cfg.opt_iterations) & (step >= min_delta)

        def body(carry):
            poses, it, _ = carry
            poses, step = gn_step(poses)
            return poses, it + 1, step

        big = jnp.asarray(jnp.inf, graph.node_pose.dtype)
        poses3, _, _ = jax.lax.while_loop(
            cond, body, (graph.node_pose[:, :3], jnp.int32(0), big))
    else:
        poses3, _ = jax.lax.scan(
            lambda p, _: gn_step(p), graph.node_pose[:, :3], None,
            length=cfg.opt_iterations)

    # z: linear chain/graph least squares with unit info (1 GN step, exact)
    def z_solve(zs):
        ez = zs[j_idx] - zs[i_idx] - graph.edge_rel[:, 3]
        wz = w_edge * graph.edge_info[:, 3, 3]
        # J = Sj - Si (de/dz_i = -1, de/dz_j = +1; the signs were flipped
        # here once, which drove z AWAY from the measurements: a +1 m edge
        # moved the target node to -1 m). Hz = J^T W J, bz = J^T W e —
        # one-hot contraction form, same rationale as gn_iter above.
        D = Sj - Si                                      # (E, N)
        Hz = jnp.einsum("em,e,en->mn", D, wz, D)
        bz = jnp.einsum("em,e->m", D, wz * ez)
        diagz = jnp.full((N,), cfg.lm_lambda, zs.dtype).at[0].set(1e5)
        diagz = diagz + (~graph.node_valid) * 1.0
        Hz = Hz + jnp.diag(diagz)
        Lz = linalg.cholesky_blocked(Hz)
        dz = linalg.back_substitute_blocked(
            Lz, linalg.forward_substitute_blocked(Lz, -bz[:, None]))[:, 0]
        return zs + dz

    zs = z_solve(graph.node_pose[:, 3])

    new_pose = jnp.concatenate([poses3, zs[:, None]], axis=-1)
    new_pose = jnp.where(graph.node_valid[:, None], new_pose, graph.node_pose)
    post_last = new_pose[last]
    delta = post_last - pre_last
    delta = delta.at[2].set(angle_wrap(delta[2]))
    return graph.replace(node_pose=new_pose), delta


def relocalization_edge(graph: PoseGraph, belief_pose4: jnp.ndarray,
                        match_pose3: jnp.ndarray, match_ok: jnp.ndarray,
                        cfg: GraphConfig) -> tuple[PoseGraph, jnp.ndarray]:
    """Inject an accepted global match as a loop-closure edge from node 0 to
    the newest keyframe (global_match.cpp:177-221 publishes
    Edge{from: 0, to: id} with covariance[0]=COV_XY=1000,
    covariance[8]=COV_YAW=100, global_match.cpp:40-41,193-195).

    The match fixes the ROBOT's pose in the map frame; the newest keyframe is
    placed by composing it with the belief-frame offset robot->keyframe
    (trusted: both live in the same drifted frame). The edge weight follows
    the reference's wiring: graph_slam's edge factory passes the message
    matrix straight through as the g2o information (`info = gE.edgeInf`,
    graph_slam.cpp:198-199; the covariance-inversion line above it is
    commented out), so COV_XY/COV_YAW act as information here too.

    Returns (graph, injected?). Call optimize() afterwards — the reference's
    handler forces re-optimization for from==0 edges (graph_slam.cpp:236-238).
    """
    from slam_tpu.geometry import se2_compose

    last, has_last = newest_node(graph)
    kf = graph.node_pose[last]
    rel_bk = se2_relative(belief_pose4[:3], kf[:3])      # belief frame
    kf_map3 = se2_compose(match_pose3, rel_bk)           # keyframe in map
    rel3 = se2_relative(graph.node_pose[0, :3], kf_map3)
    rel = jnp.concatenate([rel3, (kf[3] - graph.node_pose[0, 3])[None]])

    info4 = jnp.zeros((4, 4), graph.edge_info.dtype)
    info4 = info4.at[0, 0].set(cfg.reloc_info_xy)
    info4 = info4.at[1, 1].set(cfg.reloc_info_xy)
    info4 = info4.at[2, 2].set(cfg.reloc_info_yaw)
    info4 = info4.at[3, 3].set(1.0)

    e = jnp.argmin(graph.edge_valid).astype(jnp.int32)
    room = ~graph.edge_valid[e]
    do = match_ok & has_last & (last != 0) & room
    new_valid = graph.edge_valid.at[e].set(
        jnp.where(do, True, graph.edge_valid[e]))
    g = graph.replace(
        edge_ij=graph.edge_ij.at[e].set(
            jnp.where(do, jnp.stack([jnp.int32(0), last.astype(jnp.int32)]),
                      graph.edge_ij[e])),
        edge_rel=graph.edge_rel.at[e].set(
            jnp.where(do, rel, graph.edge_rel[e])),
        edge_info=graph.edge_info.at[e].set(
            jnp.where(do, info4, graph.edge_info[e])),
        edge_valid=new_valid,
        num_edges=jnp.sum(new_valid).astype(graph.num_edges.dtype),
        edges_dropped=graph.edges_dropped + (
            match_ok & has_last & (last != 0) & ~room).astype(jnp.int32),
    )
    if graph.node_rp is not None:
        # 6-DoF mode: the FFT match is planar — lift it exactly like
        # from_planar (yaw -> z-rotvec, 4x4 info embedded at (0,1,5,2),
        # roll/pitch rows pinned: the planar match measures them as 0)
        rel6 = jnp.concatenate([
            rel[:2], rel[3:4], jnp.zeros(2, rel.dtype), rel[2:3]])
        emb = jnp.array([0, 1, 5, 2])
        info6 = jnp.zeros((6, 6), info4.dtype)
        info6 = info6.at[emb[:, None], emb[None, :]].set(info4)
        info6 = info6.at[3, 3].set(1e4).at[4, 4].set(1e4)
        g = g.replace(
            edge_rel6=g.edge_rel6.at[e].set(
                jnp.where(do, rel6, g.edge_rel6[e])),
            edge_info6=g.edge_info6.at[e].set(
                jnp.where(do, info6, g.edge_info6[e])))
    return g, do


def regenerate_map_mls(graph: PoseGraph, mls_cfg, capacity: int):
    """Reference-faithful global map regeneration (regenerateGlobalMap,
    graph_slam.cpp:260-280): clear the global MLS and re-add every keyframe
    cloud under its optimized pose, then export cluster means as the
    obstacle/ground target clouds (getSegmentedClouds, mls.cpp:520-555).

    Returns (obstacle_cloud, ground_cloud, mls_grid). The MLS grid is
    non-rolling, centered at the origin (mls.h:191-206 global-map mode).
    """
    from slam_tpu.mapping.mls import (add_to_mls, get_segmented_clouds,
                                      init_mls)

    N = graph.kf_xyz.shape[0]
    grid0 = init_mls(mls_cfg)
    world_xyz = _kf_world_xyz(graph)

    def add_kf(grid, i):
        cloud = PointCloud(
            xyz=world_xyz[i],
            valid=graph.kf_valid[i] & graph.node_valid[i],
            flags=graph.kf_flags[i])
        return add_to_mls(grid, cloud, mls_cfg), None

    grid, _ = jax.lax.scan(add_kf, grid0, jnp.arange(N))
    obs, gnd = get_segmented_clouds(grid, mls_cfg, capacity)
    return obs, gnd, grid


"""Mission commands — the actionlib FSM server's role (graph_slam.cpp:80-152):
INIT acknowledges (the reference's INIT branch is empty), HOME rebuilds the
global map seeded from keyframe 0's cloud with a lowered cluster-initialization
threshold (setMinClusterPoints(3), graph_slam.cpp:105-111) so the returning
robot has a dense match target around home."""

FSM_INIT = 1   # graph_slam.cpp:81 FSMINIT
FSM_HOME = 2   # FSMHOME
FSM_FIX = 3    # FSMFIX (reference: falls through with a warning)


def home_command(graph: PoseGraph, mls_cfg, capacity: int):
    """HOME: global map re-seeded from keyframe 0 only (graph_slam.cpp:102-146).

    Returns (obstacle_cloud, ground_cloud, home_pose)."""
    import dataclasses

    from slam_tpu.mapping.mls import (add_to_mls, get_segmented_clouds,
                                      init_mls)

    cfg3 = dataclasses.replace(mls_cfg, min_cluster_points=3.0)
    pose0 = graph.node_pose[0]
    cloud = PointCloud(xyz=_kf_world_xyz(graph)[0],
                       valid=graph.kf_valid[0] & graph.node_valid[0],
                       flags=graph.kf_flags[0])
    grid = add_to_mls(init_mls(cfg3), cloud, cfg3)
    obs, gnd = get_segmented_clouds(grid, cfg3, capacity)
    return obs, gnd, pose0


def mission_command(command: int, graph: PoseGraph, mls_cfg, capacity: int):
    """Dispatch an FSM command (goalCallback, graph_slam.cpp:86-152)."""
    if command == FSM_HOME:
        return home_command(graph, mls_cfg, capacity)
    if command == FSM_INIT:
        return None  # reference INIT branch is empty (graph_slam.cpp:97-99)
    # unknown command (incl. FSM_FIX): warn and continue, matching the
    # reference's non-fatal handler (graph_slam.cpp:147 ROS_WARN fallthrough)
    import warnings
    warnings.warn(f"Unknown FSM command {command}; ignored "
                  "(graph_slam.cpp:147 semantics)", RuntimeWarning,
                  stacklevel=2)
    return None


def _kf_world_xyz(graph: PoseGraph) -> jnp.ndarray:
    """(N, P, 3) keyframe clouds in the world frame under current node poses.

    Planar mode: SE(2) x z (clouds are stored upright). 6-DoF mode: full
    SE(3) — clouds are stored in the capture body frame and nodes carry
    roll/pitch, so the whole rotation applies (regenerateGlobalMap under
    VertexSE3 poses, graph_slam.cpp:260-280)."""
    poses = graph.node_pose
    if graph.node_rp is not None:
        from slam_tpu.geometry import rot3_from_rpy
        R = rot3_from_rpy(graph.node_rp[:, 0], graph.node_rp[:, 1],
                          poses[:, 2])                       # (N, 3, 3)
        t = jnp.stack([poses[:, 0], poses[:, 1], poses[:, 3]], -1)
        return jnp.einsum("nab,npb->npa", R, graph.kf_xyz) + t[:, None, :]
    xy = jax.vmap(lambda p, pts: se2_apply(p[:3], pts))(
        poses, graph.kf_xyz[..., :2])
    z = graph.kf_xyz[..., 2] + poses[:, None, 3]
    return jnp.concatenate([xy, z[..., None]], axis=-1)


def regenerate_map(graph: PoseGraph, capacity: int,
                   voxel_leaf=(0.5, 0.5, 2.0)) -> PointCloud:
    """Re-scatter all keyframe clouds under optimized poses into one map cloud
    (regenerateGlobalMap, graph_slam.cpp:260-280), voxel-merged to capacity."""
    from slam_tpu.ops.voxel import voxel_downsample

    N, P, _ = graph.kf_xyz.shape
    xyz = _kf_world_xyz(graph).reshape(N * P, 3)
    valid = (graph.kf_valid & graph.node_valid[:, None]).reshape(N * P)
    flags = graph.kf_flags.reshape(N * P)
    merged = PointCloud(xyz=xyz, valid=valid, flags=flags)
    return voxel_downsample(merged, voxel_leaf, capacity)


def regenerate_map_grid(graph: PoseGraph, capacity: int,
                        resolution: float = 0.5, grid_bins: int = 384,
                        ga_threshold: int = 2,
                        recall: float = 1.0) -> PointCloud:
    """Sort-free regenerateGlobalMap: scatter all keyframe points into a
    2D centroid grid centered on the newest node and export occupied-cell
    centroids (the exact engine the incremental map uses,
    mapping/point_map.py — one one-hot matmul scatter + top-k export).

    Why: the voxel_downsample path argsorts the N*P merged cloud per robot
    (12,288 points at config-4 shapes) — measured 236 ms of a 361 ms
    graph tick at b256, the dominant config-4 sink after the round-4
    optimizer rewrite (docs/PERF.md round-5 section). The grid engine
    replaces sort+searchsorted with MXU contractions.

    Semantics vs regenerate_map: xy cells at `resolution` (= the voxel
    leaf's xy) with PER-CELL mean z, instead of 3D voxels with a 2 m z
    leaf — identical whenever a cell's points span < 2 m of z (flat-world
    2D pipelines: exactly identical cell set). Coverage is bounded to
    +-grid_bins*resolution/2 around the NEWEST node (default +-96 m) —
    wider than the matcher's own +-75 m crop window
    (icpTools.cpp:226-239), so no consumer sees the difference. GA flags
    are re-derived from grid occupancy (classifyPoints rule); graph-mode
    registration reclassifies GA around the robot anyway
    (register_scan(reclassify=True))."""
    from slam_tpu.mapping.point_map import (export_points, init_point_map,
                                            update_point_map_xy)

    N, P, _ = graph.kf_xyz.shape
    xyz = _kf_world_xyz(graph)
    x = xyz[..., 0].reshape(N * P)
    y = xyz[..., 1].reshape(N * P)
    z = xyz[..., 2].reshape(N * P)
    valid = (graph.kf_valid & graph.node_valid[:, None]).reshape(N * P)
    last, _ = newest_node(graph)
    center = jnp.round(graph.node_pose[last, :2] / resolution) * resolution
    grid = init_point_map(grid_bins, resolution)
    grid = grid.replace(center=center.astype(grid.center.dtype))
    grid = update_point_map_xy(grid, x, y, z, valid, resolution,
                               z_precision=jax.lax.Precision.HIGH)
    return export_points(grid, capacity, ga_threshold=ga_threshold,
                         recall=recall)
