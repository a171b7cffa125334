"""Typed configuration tree for the TPU-native SLAM framework.

Every constant in the reference stack (servos/SLAM) becomes a field here with the
reference's default value, replacing its four config mechanisms (compile-time
#defines, runtime setters, YAML extrinsics, roslaunch params — see SURVEY.md §5).

Reference provenance is cited per field as file:line into /root/reference.
Configs are hashable frozen dataclasses so they can be closed over by jitted
functions as static arguments.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


def _fd(**kw):
    return dataclasses.field(**kw)


@dataclasses.dataclass(frozen=True)
class EkfConfig:
    """8-state EKF constants (ekf/src/nasa_ekf.h:13-21, nasa_ekf.cpp:358-360)."""

    loop_rate_hz: float = 100.0          # nasa_ekf.h:14 LOOPRATE
    path_publish_iters: int = 100        # nasa_ekf.h:15-16 PUBITER (1 Hz at 100 Hz loop)
    motion_noise: float = 0.05           # nasa_ekf.h:19 MOTNOISE (R = 0.05*I8)
    meas_noise_yaw: float = 0.01         # nasa_ekf.h:20 MEASNOISEYAW (gyro yaw-rate)
    meas_noise_slam: float = 10.0        # nasa_ekf.h:21 MEASNOISESLAM (Qslam = 10*I3)
    num_init_imu_samples: int = 200      # nasa_ekf.h gyro-bias init window
    init_sigma: float = 0.001            # nasa_ekf.cpp:383 initial covariance scale
    cmd_vel_max: float = 3.0             # nasa_ekf.cpp:358-359 linear clamp [m/s]
    cmd_omega_max: float = 0.75          # nasa_ekf.cpp:360 yaw-rate clamp [rad/s]


@dataclasses.dataclass(frozen=True)
class GroundSegConfig:
    """GP-INSAC ground segmentation (groundSegmentation.h:15-18, .cpp:36-50)."""

    num_sectors: int = 72                # groundSegmentation.h:17 NUMBINSA
    num_range_bins: int = 200            # groundSegmentation.h:18 NUMBINSL
    r_max: float = 100.0                 # groundSegmentation.cpp:36 RMAX
    num_seed_points: int = 10            # groundSegmentation.cpp:38
    gp_length_scale: float = 10.0        # groundSegmentation.cpp:40 P_L
    gp_signal_var: float = 1.0           # groundSegmentation.cpp:41 P_SF
    gp_noise: float = 0.3                # groundSegmentation.cpp:42 P_SN
    gp_model_confidence: float = 5.0     # groundSegmentation.cpp:43 P_TMODEL
    gp_data_confidence: float = 5.0      # groundSegmentation.cpp:44 P_TDATA
    ground_threshold: float = 0.3        # groundSegmentation.cpp:45 P_TG
    robot_height: float = 1.2            # groundSegmentation.cpp:47 ROBOT_HEIGHT
    seed_max_range: float = 50.0         # groundSegmentation.cpp:49 MAXSEEDRANGE
    seed_max_height: float = 15.0        # groundSegmentation.cpp:50 MAXSEEDHEIGHT
    min_bin_points: int = 5              # groundSegmentation.cpp:211 bin validity gate
    max_insac_sweeps: int = 10           # fixed-sweep INSAC reformulation (ours)
    # Fixed capacity of the per-sector signal set (valid prototypes). The
    # reference's is implicitly num_range_bins; smaller saves compute when the
    # scan geometry can't fill all bins.
    signal_capacity: int = 64


@dataclasses.dataclass(frozen=True)
class IcpConfig:
    """Class-constrained 2D ICP (ccicp2d: icp.cpp:27, icpTools.h:21-26, icpTools.cpp)."""

    max_points: int = 20000              # icpTools.h:21 ICP_MAX_PTS per class
    max_iterations: int = 20             # icp.cpp:27 max_iter
    # scan-to-map matching engine:
    #   "fused"    — whole ICP loop in one Pallas kernel vs the exported map
    #                cloud (fastest on TPU; falls back to "points" off-TPU)
    #   "points"   — XLA brute-force NN vs the exported map cloud
    #   "grid"     — jump-flooded nearest-centroid field over the map grid
    #   "particle" — particle-filter occupancy matching against the map grid
    #                (BASELINE config 5 fleet variant; cfg.pf parameters)
    matcher: str = "fused"
    # grid-matcher iteration loop: "scan" always pays max_iterations;
    # "while" exits when every robot in the (vmapped) batch converges —
    # measured live iterations at ref-scale are 3-11 of 20, so the early
    # exit roughly halves the fit loop. Outputs are identical: the scan
    # body already freezes converged lanes, and JAX's while batching rule
    # applies the same per-lane select.
    loop: str = "while"
    min_delta: float = 1e-6              # icp.cpp:27 min_delta convergence gate
    inlier_dist: float = 5.0             # icpTools.cpp:188 (fit(..., indist=5, ...))
    crop_dist: float = 75.0              # icpTools.cpp:230 target crop half-extent
    min_scene_points: int = 5            # icpTools.cpp:179; icp.cpp:38,100
    # ground-adjacency reclassification grid (icpTools.h:24-26)
    ga_num_bins: int = 1200              # icpTools.h NUMBINSGA
    ga_resolution: float = 0.5           # icpTools.h RESOLUTION [m]
    ga_threshold: int = 2                # icpTools.h GRD_ADJ_THRESH (>=2 empty nbrs)
    # scan-local voxelization grid for the scatter-based scene builder
    # (ops/scene_grid.py): span = scan_grid_bins * ga_resolution, must cover
    # the sensor range (ref RMAX 100 m, groundSegmentation.cpp:36 -> 512
    # bins x 0.5 m = +-128 m)
    scan_grid_bins: int = 512
    # voxel-downsample leaf sizes applied to the scene (icpTools.cpp:623,630)
    voxel_leaf_obs: Tuple[float, float, float] = (0.5, 0.5, 2.0)
    voxel_leaf_ground: Tuple[float, float, float] = (0.5, 0.5, 5.0)


@dataclasses.dataclass(frozen=True)
class HeightConfig:
    """Wheel-contact height interpolation (icpTools.cpp:301-419)."""

    robot_height: float = 1.45           # icpTools.cpp:303 ROBO_HEIGHT
    x_wheel_dist: float = 0.5            # icpTools.cpp:304
    y_wheel_dist: float = 0.5            # icpTools.cpp:305
    max_nn_dist_sq: float = 9.0          # icpTools.cpp:347 (<3 m squared)
    min_corr_points: int = 4             # icpTools.cpp:357
    # "cloud": NN into the exported ground cloud (reference dataflow);
    # "grid": NN into a local window of the persistent ground centroid grid
    # directly — same correspondences (every acceptable match is <3 m from a
    # wheel), no per-macro top-k export. ref_scale_config uses "grid".
    source: str = "cloud"


@dataclasses.dataclass(frozen=True)
class MlsConfig:
    """MLS / occupancy grid (mls/mls.h:182-206, local_mapper.cpp:29)."""

    size_x: int = 200                    # local_mapper.cpp:29 (local rolling map)
    size_y: int = 200
    resolution: float = 0.2              # local_mapper.cpp:29 [m/cell]
    rolling: bool = True
    max_clusters: int = 4                # mls.h max_clusters (fixed-K here)
    min_cluster_points: float = 3.0      # mls.h min_cluster_points
    max_cluster_points: float = 20.0     # mls.h max_cluster_points cap
    occupancy_increment: float = 1.0     # mls.h:188
    occupancy_decrement: float = 0.3     # mls.h:189
    cluster_sigma_factor: float = 3.0    # mls.h (sigma*3 association gate)
    cluster_dist_threshold: float = 0.5  # mls.h (+0.5 m association gate)
    cluster_combine_dist: float = 0.25   # mls.h cluster merge clearance
    drive_dist_threshold: float = 1.0    # mls.cpp:299 (<1 m gap => not drivable)
    height_threshold: float = 0.4        # mls.cpp:318 neighbor height diff
    normal_threshold: float = 0.15       # mls.cpp:332 z-variance drivability gate
    robot_height: float = 1.45           # mls.h:196 (seed disk depth)
    max_range: float = 30.0              # mls.h map insertion range gate
    update_dist: int = 100               # mls.h update window half-extent [cells]
    min_var_z: float = 0.001             # mls.cpp:234 variance floor


@dataclasses.dataclass(frozen=True)
class GraphConfig:
    """Pose-graph SLAM (graphSlamTools.h:26-36, graph_slam.cpp)."""

    max_nodes: int = 64                  # fixed capacity (reference: unbounded)
    # worst case is max_nodes * (knn_edges + 1 previous) = 256 plus
    # relocalization loop closures on top — headroom so accepted edges are
    # never dropped (PoseGraph.edges_dropped counts any that still are)
    max_edges: int = 320
    keyframe_points: int = 1024          # stored keyframe cloud capacity (voxelized)
    knn_dist_thresh: float = 5.0         # graphSlamTools.h:26 new-KF gate [m]
    knn_edges: int = 3                   # graphSlamTools.h:27 GSLAM_KNN
    # graph_slam.cpp:498 cloud size gate. Reference value: 20000 (HDL-32E
    # scans); default open like cloud.min_scan_points because sim scans are
    # ~512 points — ref_scale_config sets the reference's 20k.
    min_keyframe_points: int = 0
    opt_iterations: int = 10             # graph_slam.cpp:332 LM iterations
    # batch early exit for the GN loop (same construct as the ICP fit
    # loop's min_delta, icp.cpp:27): once EVERY robot's largest pose update
    # drops below this, the remaining iterations are no-ops to tolerance
    # (each skipped step would move poses < opt_min_delta) and are skipped.
    # 0 disables (fixed 10 iterations, the literal g2o call). Steady-state
    # graphs converge in 2-3 iterations, so this cuts the optimize tick
    # ~3x at b256 (docs/PERF.md config-4 round-5 follow-up).
    opt_min_delta: float = 1e-5
    # graphSlamTools.cpp:282 leaf size — satisfied implicitly: keyframe
    # clouds are stored already voxel-downsampled at this leaf by the scene
    # builder (see _edge_measurement)
    edge_icp_voxel: float = 0.5
    edge_max_corr: float = 0.75          # graphSlamTools.cpp:302 LUM max corr dist
    edge_min_corr: int = 5               # minimum-overlap edge gate (ours; the
                                         # reference would add a ~zero-info edge)
    edge_icp_max_iter: int = 50          # GICP budget (ref <=200, gicp default)
    dist_move_thresh: float = 10.0       # graphSlamTools.h:35 edge rejection [m]
    rot_move_thresh: float = 0.2         # graphSlamTools.h:36 edge rejection [rad]
    lm_lambda: float = 1e-4              # LM damping for our batched GN solver
    loop_rate_hz: float = 10.0           # graph_slam.cpp:418
    # anchor-aware eviction (pose_graph._eviction_slot): evictability =
    # dmin + evict_degree_weight * edge_degree [m/edge]. 0 recovers the
    # pure-redundancy policy that cost 7x ATE at 4x capacity overrun
    # (docs/PERF.md eviction study)
    evict_degree_weight: float = 0.5
    # eviction never touches the newest K keyframes; 1 = only the newest
    # (trajectory continuity). MEASURED: larger windows hurt — protecting
    # recents forces eviction of the mid-history nodes that anchor loop
    # closures (Q4 at 4x overrun: K=1 -> 41 cm, K=4/8 -> 73 cm,
    # tools/eviction_study.py)
    evict_protect_recent: int = 1
    # graph optimizer engine:
    #   "se2z" — SE(2) x z dense GN (pose_graph.optimize; the production
    #            default — the reference's edges are planar-ICP derived, so
    #            roll/pitch carry no measurement signal, pose_graph.py:17-21)
    #   "se3"  — the reference's literal g2o typing (VertexSE3/EdgeSE3,
    #            graph_slam.cpp:43-49): lift to the SE(3) manifold with the
    #            6x6 LUM information embedding and solve with the full 6-DoF
    #            optimizer (pose_graph3d.optimize_planar). On planar edges
    #            both engines land on the same optimum
    #            (tests/test_pose_graph3d.py::test_se3_matches_se2z_on_gs_fixture).
    engine: str = "se2z"
    # keyframe edge refinement (calcEdgeIcp, graphSlamTools.cpp:218-364):
    #   "2d" — class-constrained planar ICP between keyframe clouds + z from
    #          the pose difference (matches the planar scan matcher; the
    #          production default)
    #   "3d" — the reference's literal chain: full 3D point-to-point ICP
    #          between the (body-frame) keyframe clouds with SE(3) odometry
    #          init (graphSlamTools.cpp:241-298), 6x6 LUM information over
    #          the final 3D correspondences (graphSlamTools.cpp:108-214),
    #          consumed natively by the SE(3) optimizer — edges then carry
    #          MEASURED z/attitude. Requires engine="se3"; keyframe clouds
    #          are stored tilted (capture body frame) like the reference's
    #          velodyne-frame keyframes (graph_slam.cpp:503)
    edge_registration: str = "2d"
    # scan-to-map target regeneration after each optimization:
    #   "voxel" — keyframe clouds voxel-merged (regenerate_map; centroid
    #             semantics match the MLS means at one cluster/cell, ~6x
    #             cheaper — the default, justified in ARCHITECTURE.md)
    #   "mls"   — the reference's exact dataflow: rebuild the global MLS and
    #             export cluster means (graph_slam.cpp:260-280 ->
    #             mls.cpp:520-555 getSegmentedClouds)
    #   "grid"  — sort-free: scatter all keyframe points into a 2D centroid
    #             grid around the newest node + occupied-cell export
    #             (pose_graph.regenerate_map_grid — the fastest engine on
    #             TPU; xy semantics of "voxel" with per-cell mean z)
    map_regen: str = "voxel"
    # "grid" regeneration coverage: +-regen_grid_bins*voxel_leaf/2 around
    # the newest node (default +-96 m at 0.5 m — wider than the matcher's
    # +-75 m crop, icpTools.cpp:230)
    regen_grid_bins: int = 384
    # relocalization loop-closure edge weight (global_match.cpp:40-41,193-195
    # COV_XY/COV_YAW; passed through as g2o information per the edge
    # factory's wiring, graph_slam.cpp:198-199 `info = gE.edgeInf`)
    reloc_info_xy: float = 1000.0
    reloc_info_yaw: float = 100.0


@dataclasses.dataclass(frozen=True)
class GlobalMatchConfig:
    """Correlative relocalization (global_matching/src/global_match.cpp:24-41)."""

    # provenance-only: the exhaustive FFT search supersedes random restarts
    # (every rotation x translation is scored, so there is nothing to
    # restart) and its search radius is implicitly grid_size*resolution/2
    num_restarts: int = 20               # global_match.cpp:36 (random restarts)
    search_radius: float = 10.0          # global_match.cpp:105-122 (+-10 m)
    # MATCH-FRACTION lower bound in [0, 1] (fraction of occupied scene
    # raster cells landing on dilated map mass). NOT the reference's 0.002:
    # that (global_match.cpp:30,151) bounds fitness/N, an ERROR metric with
    # an unrelated scale — reusing it here would accept nearly any match.
    accept_score: float = 0.35
    # give-up gate: after this many consecutive rejections the prior belief
    # publishes as the match (relocalize_with_fallback, global_match.cpp:204)
    max_failures: int = 50
    # provenance-only: rasterization at grid_resolution is the FFT path's
    # own scene decimation (the reference voxelized before GICP)
    voxel_leaf: float = 1.5              # global_match.cpp:92-94
    # FFT correlative search parameters (ours; replaces random-restart GICP)
    num_rotations: int = 64              # rotation slices over 360 deg
    grid_size: int = 256                 # correlation grid cells
    grid_resolution: float = 0.5         # [m/cell]
    smooth_radius: int = 2               # map-raster dilation (likelihood field)
    rot_chunk: int = 8                   # rotations scored per lax.map step:
    # peak HBM holds (chunk, 2G, 2G) correlation planes instead of all
    # num_rotations at once (identical scores; batched reloc at fleet batch
    # sizes OOMs without it). Effective chunk is the largest divisor of
    # num_rotations <= rot_chunk.


@dataclasses.dataclass(frozen=True)
class PfConfig:
    """Particle-filter scan matching (BASELINE config 5's fleet matching
    variant; the reference itself has no PF — see ops/particle.py)."""

    num_particles: int = 128
    pos_sigma: float = 0.3               # proposal spread around pred [m]
    yaw_sigma: float = 0.05              # [rad]
    temperature: float = 0.1             # softmax temp on hit fractions
    min_score: float = 0.2               # acceptance gate (hit fraction)
    # beam-skip decimation for scoring (ops/particle.py PFConfig docs):
    # the hit fraction is an unbiased estimate at any stride, but a stride
    # adds sampling noise (std ~0.05 at stride 4 / 96 scored points) to the
    # fraction the min_score gate and softmax read — poses near the 0.2
    # acceptance threshold can flip ok/not-ok vs stride 1. Default is the
    # exact estimator; the config-5 fleet bench opts into 4 explicitly
    # (bench.py bench_fleet_pf_shared) where the throughput trade is wanted.
    score_stride: int = 1
    # scoring engine (ops/particle.py score_particles): "gather" | "dense" |
    # "pallas" | "auto" (= pallas on TPU, gather elsewhere). All engines
    # produce identical hit fractions; they differ only in how the
    # P x N occupancy lookups map to hardware (the gather path serializes
    # on TPU — it was 86% of the config-5 tick, docs/PERF.md).
    scorer: str = "auto"


@dataclasses.dataclass(frozen=True)
class SampleMapConfig:
    """Sample-probability grid (sample_mapping_node.cpp:19, sample_mapping.cpp)."""

    size_x: int = 400
    size_y: int = 400
    resolution: float = 0.5
    prob_min: float = 0.0                # clamp range [0, 5]
    prob_max: float = 5.0
    fov_cone: float = math.pi / 2        # camera FOV cone
    r_min: float = 1.0                   # cone decay inner radius
    r_max: float = 10.0                  # cone decay outer radius
    pixel_prob_threshold: float = 0.5    # sample_mapping.cpp:198 CV threshold


@dataclasses.dataclass(frozen=True)
class CloudConfig:
    """Fixed-capacity masked point-cloud containers (replaces PCL clouds)."""

    scan_capacity: int = 2048            # raw scan points per robot
    scene_capacity: int = 1024           # post-voxel obstacle scene points
    ground_capacity: int = 1024          # post-voxel ground points
    map_capacity: int = 4096             # scan-to-map target points
    min_scan_points: int = 0             # gates: ref 30k/20k; sim uses smaller scans
    # scene voxelization engine: "incidence" = same-cell (N, N) pairwise
    # matmuls (exact slot semantics, O(N^2) — sim scale); "grid" = scatter-
    # to-grid + raster export (O(N) — reference scale, ops/scene_grid.py);
    # "auto" picks grid beyond 4096-point scans
    scene_builder: str = "auto"
    # map-export top-k recall (point_map.export_point_planes): < 1.0 uses
    # the TPU-native approx_max_k partial reduction; per-export drops
    # random-walk ~2 cm ATE vs the f64 oracle over 40 steps (ground-truth
    # ATE unchanged). 1.0 = exact top_k (parity-grade; full sort, ~14x the
    # export cost at batch 1024)
    export_recall: float = 0.8


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Synthetic world + sensor simulation (the fixture the reference lacks)."""

    world_extent: float = 60.0           # half-extent of the world [m]
    num_obstacles: int = 48              # circular obstacles (2D) / cylinders (3D)
    obstacle_radius_min: float = 0.4
    obstacle_radius_max: float = 1.6
    num_beams: int = 360                 # 2D lidar beams
    beam_max_range: float = 50.0
    range_noise: float = 0.01            # [m] 1-sigma
    gyro_noise: float = 0.002            # [rad/s]
    gyro_bias: float = 0.01              # [rad/s] true bias, estimated at init
    # constant IMU attitude miscalibration added to the measured roll/pitch
    # (mounting error — a realistic failure the 6-DoF graph fixture uses:
    # tilt compensation then leans every scan by the same bias, which skews
    # the height-interpolated z odometry chain, while RELATIVE 3D edge
    # registrations between equally-leaned keyframe clouds stay unbiased)
    imu_pitch_bias: float = 0.0          # [rad]
    # 3D Velodyne HDL-32E-like model (drivers.launch:12-31)
    num_rings: int = 32
    ring_elevation_min: float = -0.535   # ~-30.67 deg
    ring_elevation_max: float = 0.186    # ~+10.67 deg
    num_azimuth: int = 64                # azimuth steps per ring (sim-scale)
    sensor_height: float = 1.45          # sensor z above ground
    dt: float = 0.1                      # sim step [s]


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    """Top-level config tree."""

    ekf: EkfConfig = _fd(default_factory=EkfConfig)
    ground: GroundSegConfig = _fd(default_factory=GroundSegConfig)
    icp: IcpConfig = _fd(default_factory=IcpConfig)
    height: HeightConfig = _fd(default_factory=HeightConfig)
    mls: MlsConfig = _fd(default_factory=MlsConfig)
    graph: GraphConfig = _fd(default_factory=GraphConfig)
    global_match: GlobalMatchConfig = _fd(default_factory=GlobalMatchConfig)
    sample_map: SampleMapConfig = _fd(default_factory=SampleMapConfig)
    pf: PfConfig = _fd(default_factory=PfConfig)
    cloud: CloudConfig = _fd(default_factory=CloudConfig)
    sim: SimConfig = _fd(default_factory=SimConfig)
    dtype: str = "float32"

    def replace(self, **kw) -> "SlamConfig":
        return dataclasses.replace(self, **kw)


def default_config() -> SlamConfig:
    return SlamConfig()


def sim2d_config() -> SlamConfig:
    """Config tuned for the 2D 360-beam simulation benchmark (BASELINE config 1).

    The 2D path has no ground segmentation; grids and capacities are sized for
    throughput benchmarking while keeping the reference's algorithmic budgets.
    """
    c = SlamConfig()
    return dataclasses.replace(
        c,
        icp=dataclasses.replace(c.icp, max_points=512, inlier_dist=1.0,
                                crop_dist=55.0, ga_num_bins=192),
        # capacities sized to the data (360-beam scans; ~300-600 occupied map
        # cells) and to lane multiples — ICP kernel cost scales with S x C
        cloud=dataclasses.replace(c.cloud, scan_capacity=512, scene_capacity=384,
                                  ground_capacity=8, map_capacity=512),
        mls=dataclasses.replace(c.mls, size_x=192, size_y=192, resolution=0.5,
                                max_range=50.0, update_dist=96),
    )


def ref_scale_config() -> SlamConfig:
    """3D Velodyne config at the REFERENCE'S OWN WORKING POINT — the scales
    the C++ stack actually gates on, not the sim-sized ones:

      - scan: 32 rings x 640 azimuths = 20,480 rays, matching the >=20k-point
        registration gate (scan_registration.cpp:122; the filter node wants
        >=30k of a ~70k-point HDL-32E scan, pointcloud_filter.cpp:290)
      - ground segmentation: the full 72 x 200 polar grid to 100 m
        (groundSegmentation.h:17-18, RMAX groundSegmentation.cpp:36)
      - ICP: up to 20k model points per class (ICP_MAX_PTS, icpTools.h:21),
        inlier dist 5 m (icpTools.cpp:188), +-75 m crop (icpTools.cpp:230)
      - maps: 0.5 m voxel leaves (icpTools.cpp:623), 384-cell grids covering
        the +-75 m crop window

    At these sizes the O(N^2)/incidence engines are off the table: the scene
    builder routes to ops/scene_grid.py (scatter + raster export), ground
    binning to the native-scatter engine (ops/ground.py INCIDENCE_LIMIT),
    grid scatters to scatter_add_2d_native, and the fused ICP kernel to the
    C-tiled streaming variant (ops/icp_pallas.py RESIDENT_TILE_LIMIT)."""
    c = SlamConfig()
    return dataclasses.replace(
        c,
        sim=dataclasses.replace(c.sim, num_azimuth=640, beam_max_range=100.0),
        ground=dataclasses.replace(c.ground, signal_capacity=64),
        height=dataclasses.replace(c.height, source="grid"),
        # edge_min_corr 30: at ref scale a mis-posed keyframe (kidnap /
        # registration outage) can form an edge from a handful of bogus
        # <0.75 m pairs that passes the default 5-pair gate, and ONE such
        # edge explodes the graph solve (docs/PERF.md long-mission
        # artifact). 30 pairs is ~half a healthy ref-scale keyframe
        # overlap — unreachable by accident, cheap insurance.
        graph=dataclasses.replace(c.graph, edge_min_corr=30),
        icp=dataclasses.replace(c.icp, inlier_dist=5.0, max_points=20000,
                                ga_num_bins=384),
        # min_scan_points: the reference's >=20k gates
        # (scan_registration.cpp:122, graph_slam.cpp:498) are RAW-scan
        # completeness gates on a ~70k-pt HDL-32E scan (~29%). Mapped
        # proportionally to this sim's 20,480 rays: 5,856 raw hits (typical
        # terrain scans hit ~73% = ~15k, so complete scans pass and
        # truncated ones reject). Enforced at the frame level
        # (process_frame* masks the whole scan); the keyframe gate
        # (graph.min_keyframe_points) stays in voxelized-keyframe units —
        # comparing 20000 against a <=4096-slot keyframe cloud would
        # silently reject every keyframe.
        cloud=dataclasses.replace(c.cloud, scan_capacity=20480,
                                  scene_capacity=4096,
                                  ground_capacity=20480,
                                  map_capacity=40960,
                                  min_scan_points=5856,
                                  scene_builder="grid"),
        mls=dataclasses.replace(c.mls, size_x=384, size_y=384, resolution=0.5,
                                max_range=100.0, update_dist=192),
    )


def sim3d_config() -> SlamConfig:
    """Config for the 3D Velodyne simulation (BASELINE config 2): GP-INSAC
    segmentation + scan registration + height interpolation + occupancy.

    The sim Velodyne (32 rings x 64 azimuths = 2048 rays) is sparser than the
    real HDL-32E (~70k pts), so bin-validity and sector counts scale down
    while keeping the reference's algorithmic structure.
    """
    c = SlamConfig()
    return dataclasses.replace(
        c,
        ground=dataclasses.replace(c.ground, num_sectors=16, num_range_bins=32,
                                   signal_capacity=32, min_bin_points=2,
                                   r_max=60.0, max_insac_sweeps=8),
        icp=dataclasses.replace(c.icp, max_points=512, inlier_dist=1.0,
                                crop_dist=55.0, ga_num_bins=192),
        # capacities sized to the data (like sim2d): a 2048-ray scan is
        # mostly ground — observed maxima are ~120 raw obstacle points,
        # ~1300 raw ground points, ~130 occupied obstacle-map cells; each
        # class is compacted into its container after segmentation
        cloud=dataclasses.replace(c.cloud, scan_capacity=2048,
                                  scene_capacity=256, ground_capacity=1536,
                                  map_capacity=512),
        mls=dataclasses.replace(c.mls, size_x=192, size_y=192, resolution=0.5,
                                max_range=50.0, update_dist=96),
    )


def apply_sweep_overrides(cfg: SlamConfig,
                          spec: str | None = None) -> SlamConfig:
    """Apply dotted-path overrides from a sweep spec onto the frozen config
    tree: "icp.loop=while;cloud.export_recall=1.0". `spec` defaults to the
    SLAM_TPU_SWEEP_SET environment variable (set per-subprocess by
    tools/sweep.py — sweeps must not share a process, see
    tests/test_jax_retrace_footgun.py). Values are coerced to the type of
    the field they replace; unknown paths raise."""
    import os
    if spec is None:
        spec = os.environ.get("SLAM_TPU_SWEEP_SET", "")
    for item in filter(None, (s.strip() for s in spec.split(";"))):
        path, _, raw = item.partition("=")
        parts = path.split(".")
        target = cfg
        for p in parts[:-1]:
            target = getattr(target, p)
        old = getattr(target, parts[-1])
        if isinstance(old, bool):
            val: object = raw.lower() in ("1", "true", "yes")
        elif isinstance(old, int):
            val = int(raw)
        elif isinstance(old, float):
            val = float(raw)
        else:
            val = raw
        new_leaf = dataclasses.replace(target, **{parts[-1]: val})
        node = new_leaf
        for p in reversed(parts[:-1]):
            # rebuild the chain up to the root (frozen dataclasses)
            parent = cfg
            for q in parts[:parts.index(p)]:
                parent = getattr(parent, q)
            node = dataclasses.replace(parent, **{p: node})
        cfg = node
    return cfg
