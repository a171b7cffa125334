"""g2o text-format interop for the keyframe pose graph.

The reference optimizes its graph with g2o VertexSE3/EdgeSE3
(graph_slam/src/graph_slam.cpp:43-49, 179-186), whose standard on-disk
exchange format is the g2o text file (VERTEX_SE3:QUAT / EDGE_SE3:QUAT
lines). This module saves/loads our PoseGraph in that format so graphs can
be round-tripped through g2o tooling (g2o_viewer, the g2o CLI optimizer)
or compared against graphs the C++ stack produced:

  - mode="se3": the reference's own vertex/edge types. Our state is
    SE(2) x z (planar ICP + height, types.py PoseGraph docstring), so yaw
    becomes a z-axis quaternion and the 6x6 edge information embeds the
    4x4 (x, y, yaw, z) block at g2o's (x, y, z, qx, qy, qz) ordering —
    x->0, y->1, z->2, yaw->5 — with the unobserved roll/pitch rows pinned
    at `rp_info` (they are measured as exactly 0 by the planar model).
  - mode="se2": VERTEX_SE2/EDGE_SE2 — lossless for the planar block
    (z and its information rows are dropped).

Host-side text I/O over numpy; never traced. Fixed-capacity semantics
match checkpoint.py: load pads to the config's capacities and fails loudly
on overflow.
"""

from __future__ import annotations

import numpy as np

from slam_tpu.types import PoseGraph

# our (x, y, yaw, z) -> g2o SE3 (x, y, z, roll, pitch, yaw) index map
_SE3_IDX = np.array([0, 1, 5, 2])


def _yaw_to_quat(yaw):
    h = 0.5 * np.asarray(yaw, np.float64)
    return np.stack([np.zeros_like(h), np.zeros_like(h),
                     np.sin(h), np.cos(h)], -1)     # qx qy qz qw


def _quat_to_yaw(qx, qy, qz, qw):
    return np.arctan2(2.0 * (qw * qz + qx * qy),
                      1.0 - 2.0 * (qy * qy + qz * qz))


def save_g2o(path: str, graph: PoseGraph, mode: str = "se3",
             rp_info: float = 1e4) -> tuple[int, int]:
    """Write the valid nodes/edges of `graph`; returns (n_nodes, n_edges).

    Node ids are slot indices (eviction reuses slots, so ids are stable
    across a save but not globally consecutive). Node 0 is emitted as
    FIX 0 — the gauge the optimizer holds, matching optimize()'s anchoring
    of the oldest node.
    """
    if mode not in ("se3", "se2"):
        raise ValueError(f"mode must be 'se3' or 'se2', got {mode!r}")
    poses = np.asarray(graph.node_pose, np.float64)     # (N, 4) x y yaw z
    nv = np.asarray(graph.node_valid, bool)
    eij = np.asarray(graph.edge_ij, np.int64)
    erel = np.asarray(graph.edge_rel, np.float64)       # (E, 4)
    einfo = np.asarray(graph.edge_info, np.float64)     # (E, 4, 4)
    ev = np.asarray(graph.edge_valid, bool)

    lines = []
    valid_ids = np.flatnonzero(nv)
    for i in valid_ids:
        x, y, yaw, z = poses[i]
        if mode == "se2":
            lines.append(f"VERTEX_SE2 {i} {x:.9g} {y:.9g} {yaw:.9g}")
        else:
            qx, qy, qz, qw = _yaw_to_quat(yaw)
            lines.append(f"VERTEX_SE3:QUAT {i} {x:.9g} {y:.9g} {z:.9g} "
                         f"{qx:.9g} {qy:.9g} {qz:.9g} {qw:.9g}")
    if valid_ids.size:
        lines.append(f"FIX {valid_ids[0]}")

    for e in np.flatnonzero(ev):
        i, j = eij[e]
        dx, dy, dyaw, dz = erel[e]
        if mode == "se2":
            I = einfo[e][:3, :3]
            tri = [I[r, c] for r in range(3) for c in range(r, 3)]
            lines.append(f"EDGE_SE2 {i} {j} {dx:.9g} {dy:.9g} {dyaw:.9g} "
                         + " ".join(f"{v:.9g}" for v in tri))
        else:
            qx, qy, qz, qw = _yaw_to_quat(dyaw)
            I6 = np.zeros((6, 6))
            I6[np.ix_(_SE3_IDX, _SE3_IDX)] = einfo[e]
            I6[3, 3] = I6[4, 4] = rp_info
            tri = [I6[r, c] for r in range(6) for c in range(r, 6)]
            lines.append(
                f"EDGE_SE3:QUAT {i} {j} {dx:.9g} {dy:.9g} {dz:.9g} "
                f"{qx:.9g} {qy:.9g} {qz:.9g} {qw:.9g} "
                + " ".join(f"{v:.9g}" for v in tri))
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return int(nv.sum()), int(ev.sum())


def save_g2o_se3(path: str, graph) -> tuple[int, int]:
    """Lossless VERTEX_SE3:QUAT/EDGE_SE3:QUAT export of an Se3Graph
    (pose_graph3d) — full rotations, full 6x6 information (vs save_g2o's
    planar embedding). Returns (n_nodes, n_edges)."""
    from slam_tpu.graph.pose_graph3d import rot_to_quat

    t = np.asarray(graph.node_t, np.float64)
    q = np.asarray(rot_to_quat(graph.node_R), np.float64)   # [w x y z]
    nv = np.asarray(graph.node_valid, bool)
    eij = np.asarray(graph.edge_ij, np.int64)
    et = np.asarray(graph.edge_t, np.float64)
    eq = np.asarray(rot_to_quat(graph.edge_R), np.float64)
    einfo = np.asarray(graph.edge_info, np.float64)
    ev = np.asarray(graph.edge_valid, bool)

    lines = []
    valid_ids = np.flatnonzero(nv)
    for i in valid_ids:
        w, x, y, z = q[i]
        lines.append(
            f"VERTEX_SE3:QUAT {i} {t[i, 0]:.9g} {t[i, 1]:.9g} {t[i, 2]:.9g} "
            f"{x:.9g} {y:.9g} {z:.9g} {w:.9g}")
    if valid_ids.size:
        lines.append(f"FIX {valid_ids[0]}")
    for e in np.flatnonzero(ev):
        i, j = eij[e]
        w, x, y, z = eq[e]
        tri = [einfo[e][r, c] for r in range(6) for c in range(r, 6)]
        lines.append(
            f"EDGE_SE3:QUAT {i} {j} {et[e, 0]:.9g} {et[e, 1]:.9g} "
            f"{et[e, 2]:.9g} {x:.9g} {y:.9g} {z:.9g} {w:.9g} "
            + " ".join(f"{v:.9g}" for v in tri))
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return int(nv.sum()), int(ev.sum())


def load_g2o_se3(path: str, max_nodes: int, max_edges: int):
    """Parse VERTEX_SE3:QUAT/EDGE_SE3:QUAT lines into an Se3Graph (full
    6-DoF, no planar projection). Raises on capacity overflow."""
    import jax.numpy as jnp

    from slam_tpu.graph.pose_graph3d import init_se3_graph, quat_to_rot

    N, E = max_nodes, max_edges
    node_t = np.zeros((N, 3), np.float32)
    node_q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (N, 1))
    node_valid = np.zeros(N, bool)
    edge_ij = np.zeros((E, 2), np.int32)
    edge_t = np.zeros((E, 3), np.float32)
    edge_q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (E, 1))
    edge_info = np.zeros((E, 6, 6), np.float32)
    edge_valid = np.zeros(E, bool)
    n_edges = 0

    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok or tok[0] in ("FIX", "#"):
                continue
            if tok[0] == "VERTEX_SE3:QUAT":
                i = int(tok[1])
                if i >= N:
                    raise ValueError(f"vertex id {i} exceeds "
                                     f"max_nodes={N}")
                x, y, z, qx, qy, qz, qw = map(float, tok[2:9])
                node_t[i] = (x, y, z)
                node_q[i] = (qw, qx, qy, qz)
                node_valid[i] = True
            elif tok[0] == "EDGE_SE3:QUAT":
                if n_edges >= E:
                    raise ValueError(f"more than max_edges={E} edges")
                i, j = int(tok[1]), int(tok[2])
                x, y, z, qx, qy, qz, qw = map(float, tok[3:10])
                vals = [float(v) for v in tok[10:31]]
                M = np.zeros((6, 6))
                k = 0
                for r in range(6):
                    for c in range(r, 6):
                        M[r, c] = M[c, r] = vals[k]
                        k += 1
                edge_ij[n_edges] = (i, j)
                edge_t[n_edges] = (x, y, z)
                edge_q[n_edges] = (qw, qx, qy, qz)
                edge_info[n_edges] = M
                edge_valid[n_edges] = True
                n_edges += 1

    g = init_se3_graph(N, E)
    return g.replace(
        node_t=jnp.asarray(node_t),
        node_R=quat_to_rot(jnp.asarray(node_q)),
        node_valid=jnp.asarray(node_valid),
        edge_ij=jnp.asarray(edge_ij), edge_t=jnp.asarray(edge_t),
        edge_R=quat_to_rot(jnp.asarray(edge_q)),
        edge_info=jnp.asarray(edge_info),
        edge_valid=jnp.asarray(edge_valid))


def load_g2o(path: str, cfg) -> PoseGraph:
    """Parse a g2o text file (SE2 and/or SE3:QUAT lines) into a PoseGraph
    sized by `cfg` (GraphConfig). Keyframe clouds are empty (g2o files
    carry no point data); node stamps follow vertex order, so optimize()
    and add_keyframe() work on the result. Raises on capacity overflow or
    vertex ids beyond max_nodes."""
    import jax.numpy as jnp

    from slam_tpu.graph.pose_graph import init_graph

    g = init_graph(cfg)
    N, E = cfg.max_nodes, cfg.max_edges
    node_pose = np.zeros((N, 4), np.float32)
    node_valid = np.zeros(N, bool)
    node_stamp = -np.ones(N, np.int32)
    edge_ij = np.zeros((E, 2), np.int32)
    edge_rel = np.zeros((E, 4), np.float32)
    edge_info = np.zeros((E, 4, 4), np.float32)
    edge_valid = np.zeros(E, bool)
    n_seen = n_edges = 0
    max_id = -1

    def vertex(idx, pose4):
        # num_nodes must end up as max_id + 1, not the vertex count:
        # add_keyframe allocates its next slot AT index num_nodes
        # (pose_graph.py slot = min(num_nodes, ...)), so a count would make
        # the next insert overwrite an existing node when ids are 1-based
        # or gapped (gaps just waste slots)
        nonlocal n_seen, max_id
        if idx >= N:
            raise ValueError(f"vertex id {idx} exceeds max_nodes={N}")
        if node_valid[idx]:
            raise ValueError(f"duplicate vertex id {idx}: {path}")
        node_pose[idx], node_valid[idx] = pose4, True
        node_stamp[idx] = n_seen
        n_seen += 1
        max_id = max(max_id, idx)

    def edge(i, j, rel4, info44):
        nonlocal n_edges
        if n_edges >= E:
            raise ValueError(f"more than max_edges={E} edges in {path}")
        edge_ij[n_edges] = (i, j)
        edge_rel[n_edges] = rel4
        edge_info[n_edges] = info44
        edge_valid[n_edges] = True
        n_edges += 1

    def unpack_tri(vals, d):
        M = np.zeros((d, d))
        k = 0
        for r in range(d):
            for c in range(r, d):
                M[r, c] = M[c, r] = vals[k]
                k += 1
        return M

    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok or tok[0] in ("FIX", "#"):
                continue
            tag = tok[0]
            if tag == "VERTEX_SE2":
                i, x, y, th = int(tok[1]), *map(float, tok[2:5])
                vertex(i, (x, y, th, 0.0))
            elif tag == "VERTEX_SE3:QUAT":
                i = int(tok[1])
                x, y, z, qx, qy, qz, qw = map(float, tok[2:9])
                vertex(i, (x, y, _quat_to_yaw(qx, qy, qz, qw), z))
            elif tag == "EDGE_SE2":
                i, j = int(tok[1]), int(tok[2])
                dx, dy, dth = map(float, tok[3:6])
                I3 = unpack_tri([float(v) for v in tok[6:12]], 3)
                I4 = np.zeros((4, 4))
                I4[:3, :3] = I3
                I4[3, 3] = 1.0     # z unobserved in SE2 files
                edge(i, j, (dx, dy, dth, 0.0), I4)
            elif tag == "EDGE_SE3:QUAT":
                i, j = int(tok[1]), int(tok[2])
                dx, dy, dz, qx, qy, qz, qw = map(float, tok[3:10])
                I6 = unpack_tri([float(v) for v in tok[10:31]], 6)
                edge(i, j, (dx, dy, _quat_to_yaw(qx, qy, qz, qw), dz),
                     I6[np.ix_(_SE3_IDX, _SE3_IDX)])
            # unknown tags (parameters, other vertex types) are skipped

    return g.replace(
        node_pose=jnp.asarray(node_pose), node_valid=jnp.asarray(node_valid),
        node_stamp=jnp.asarray(node_stamp), edge_ij=jnp.asarray(edge_ij),
        edge_rel=jnp.asarray(edge_rel), edge_info=jnp.asarray(edge_info),
        edge_valid=jnp.asarray(edge_valid),
        num_nodes=jnp.int32(max_id + 1), num_edges=jnp.int32(n_edges))
