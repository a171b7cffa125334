"""Core pytree containers: masked fixed-capacity point clouds and SLAM state.

These replace the reference's dynamic PCL clouds (pcl::PointCloud<PointXYZGD>,
ground_segmentation/include/.../PointcloudXYZGD.h:8-31) and per-node mutable
globals with pure, fixed-shape pytrees that XLA can tile onto the MXU/VPU.
All leading batch (robot) dims broadcast: state is vmapped over robots.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PointCloud:
    """Fixed-capacity masked cloud.

    xyz:   (N, 3) float — coordinates (z unused/zero for 2D paths)
    valid: (N,)  bool   — capacity mask
    flags: (N,)  int32  — bit 0: ground, bit 1: ground-adjacent (GA),
                          bit 2: drivable-over (PointcloudXYZGD.h:8-31 analogue)
    """

    xyz: jnp.ndarray
    valid: jnp.ndarray
    flags: jnp.ndarray

    FLAG_GROUND = 1
    FLAG_GA = 2
    FLAG_DRIVABLE = 4

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid, axis=-1)

    def is_ground(self) -> jnp.ndarray:
        return (self.flags & PointCloud.FLAG_GROUND) != 0

    def is_ga(self) -> jnp.ndarray:
        return (self.flags & PointCloud.FLAG_GA) != 0


def make_cloud(capacity: int, dtype=jnp.float32, batch: tuple = ()) -> PointCloud:
    return PointCloud(
        xyz=jnp.zeros(batch + (capacity, 3), dtype),
        valid=jnp.zeros(batch + (capacity,), bool),
        flags=jnp.zeros(batch + (capacity,), jnp.int32),
    )


def cloud_from_xyz(xyz: jnp.ndarray, valid: Optional[jnp.ndarray] = None,
                   flags: Optional[jnp.ndarray] = None) -> PointCloud:
    if valid is None:
        valid = jnp.ones(xyz.shape[:-1], bool)
    if flags is None:
        flags = jnp.zeros(xyz.shape[:-1], jnp.int32)
    return PointCloud(xyz=xyz, valid=valid, flags=flags)


@struct.dataclass
class EkfState:
    """8-state EKF (nasa_ekf.cpp:185-234): mu = [x, y, vX, vY, vx, vy, yaw, omega]."""

    mu: jnp.ndarray      # (8,)
    sigma: jnp.ndarray   # (8, 8)
    gyro_bias: jnp.ndarray  # () estimated at init (nasa_ekf.cpp:292-335)


@struct.dataclass
class OccupancyGrid:
    """Rolling occupancy / drivability grid (mls.h:53-100 Grid + addToOccupancy).

    counts:  (H, W) float — cluster-0 point mass (occupancy_increment/decrement)
    drivable:(H, W) int8  — -1 unknown, 0 occupied, 1 drivable
    origin:  (2,) int32   — toroidal rolling origin in cells (mls.h:76-96)
    center:  (2,) float   — world xy of grid center cell (curPose discretized)
    """

    counts: jnp.ndarray
    drivable: jnp.ndarray
    origin: jnp.ndarray
    center: jnp.ndarray


@struct.dataclass
class MlsGrid:
    """Multi-level-surface grid: fixed-K Gaussian z-clusters per cell (mls.h:21-51).

    mean:    (H, W, K, 3)
    var_z:   (H, W, K)
    num_pts: (H, W, K) float (reference uses ints + caps; float for running stats)
    origin/center: rolling origin bookkeeping, same semantics as OccupancyGrid.
    """

    mean: jnp.ndarray
    var_z: jnp.ndarray
    num_pts: jnp.ndarray
    drivable: jnp.ndarray  # (H, W) int8
    origin: jnp.ndarray
    center: jnp.ndarray


@struct.dataclass
class PoseGraph:
    """Fixed-capacity keyframe pose graph (graph_slam.h:9-37 PoseGraph{nodes,edges}).

    node_pose: (N, 4) — x, y, yaw, z
    node_valid:(N,) bool
    kf_xyz:    (N, P, 3) keyframe clouds (voxelized, P = keyframe_points)
    kf_valid:  (N, P) bool
    kf_flags:  (N, P) int32
    edge_ij:   (E, 2) int32 — from, to node indices
    edge_rel:  (E, 4) — relative pose measurement (x, y, yaw, z) in from-frame
    edge_info: (E, 4, 4) — information matrix (x, y, yaw, z block)
    edge_valid:(E,) bool
    num_nodes, num_edges: () int32
    edges_dropped: () int32 — accepted measurements lost to a full edge
        table (never silently: loop closures / odometry edges that could
        not be stored; nonzero means max_edges is undersized)

    6-DoF extension (present iff GraphConfig.edge_registration == "3d" —
    the reference's full-3D GICP edge chain, graphSlamTools.cpp:241-298,
    feeding VertexSE3/EdgeSE3, graph_slam.cpp:43-49; None in planar mode):
    node_rp:   (N, 2) — node roll, pitch (yaw lives in node_pose[:, 2])
    edge_rel6: (E, 6) — measured SE(3) edge [t_x t_y t_z | rotvec], from-frame
    edge_info6:(E, 6, 6) — LUM 6x6 information, tangent order [t; w]
        (computeEdgeInformationLUM, graphSlamTools.cpp:152-176)
    """

    node_pose: jnp.ndarray
    node_valid: jnp.ndarray
    node_stamp: jnp.ndarray  # (N,) int32 insertion order; -1 = never used.
    #   Slots are reused by keyframe eviction (capacity policy), so "newest
    #   node" and "previous node" are stamp lookups, not index arithmetic.
    kf_xyz: jnp.ndarray
    kf_valid: jnp.ndarray
    kf_flags: jnp.ndarray
    edge_ij: jnp.ndarray
    edge_rel: jnp.ndarray
    edge_info: jnp.ndarray
    edge_valid: jnp.ndarray
    num_nodes: jnp.ndarray
    num_edges: jnp.ndarray
    edges_dropped: jnp.ndarray
    node_rp: object = None      # Optional[(N, 2)] — see 6-DoF extension above
    edge_rel6: object = None    # Optional[(E, 6)]
    edge_info6: object = None   # Optional[(E, 6, 6)]


@struct.dataclass
class SlamState:
    """Full per-robot SLAM state pytree — the fused equivalent of the five ROS
    nodes' mutable state (SURVEY.md §1). One jitted step advances all of it."""

    ekf: EkfState
    pose: jnp.ndarray            # (4,) fused pose: x, y, yaw, z (published pose)
    scan_reg_pose: jnp.ndarray   # (4,) last ICP-corrected pose (scan_reg/pose topic)
    scan_reg_ok: jnp.ndarray     # () bool — ICP failure sentinel (w==9999 analogue)
    local_map: OccupancyGrid
    prev_scene: PointCloud       # previous segmented scene (scan-to-scan target)
    map_cloud: PointCloud        # scan-to-map target (global obstacle+ground means)
    map_grid: object             # Optional[PointMapGrid] incremental map store
    graph: PoseGraph
    graph_full: jnp.ndarray      # () bool — keyframe capacity reached; new
    #   keyframes now EVICT the most redundant old one (never silent)
    step: jnp.ndarray            # () int32 sim/step counter
    true_pose: jnp.ndarray       # (4,) simulation ground truth (for ATE)
    rng: jnp.ndarray             # PRNG key
    metrics_ring: object = None  # Optional (buf, idx) device metrics ring
    #   (utils/metrics.py init_ring) — the on-TPU observability fallback
    #   where host callbacks are unsupported; drained post-block
    attitude: object = None      # Optional[(2,)] last measured IMU roll/pitch
    #   (3D pipeline only; feeds keyframe capture attitude for the 6-DoF
    #   graph — the reference's velodyne-frame keyframes carry the tilt in
    #   the data, graph_slam.cpp:503)
    prev_ground: object = None   # Optional[PointCloud] last tick's ground
    #   points (robot frame, strided) — merged into 6-DoF keyframes so 3D
    #   edge registration observes z/attitude the way the reference's
    #   raw voxelized keyframe clouds do (graphSlamTools.cpp:279-286);
    #   obstacle-only keyframes leave z nearly unconstrained (vertical
    #   cylinder walls slide in z)
