"""Fused 3D SLAM step — BASELINE config 2: Velodyne scans through GP-INSAC
ground segmentation + class-constrained scan registration + height
interpolation + local occupancy mapping.

Mirrors the reference nodes: pointcloud_filter/CCICP::setSceneCloud
(segmentation + voxel), scan_registration (ICP + doHeightInterpolate), ekf,
local_mapper (MLS occupancy path) — fused into one jitted step over SlamState
(SURVEY.md §3.1-3.4 call stacks).

Performance structure matches the 2D path: voxelization as same-cell pairwise
matmuls (no sorts), obstacle/ground maps as point-map centroid grids (one
matmul scatter per scan), exported targets refreshed once per macro (the
reference's 10 Hz target cadence), rolling shifts at macro boundaries.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tpu.config import SlamConfig
from slam_tpu.mapping.occupancy import shift_origin
from slam_tpu.mapping.point_map import (PointMapGrid, export_points,
                                        init_point_map, shift_point_map)
from slam_tpu.models import ekf as ekf_mod
from slam_tpu.ops.ground import segment_ground, split_ground_obstacle
from slam_tpu.ops.height import height_interpolate
from slam_tpu.ops.icp import icp_fit
from slam_tpu.ops.voxel import crop_box
from slam_tpu.pipeline.slam2d import init_state  # shared state init
from slam_tpu.sim import world2d, world3d
from slam_tpu.sim.world3d import World3D
from slam_tpu.types import PointCloud, SlamState, make_cloud


class GroundMap(NamedTuple):
    """World-frame ground store: centroid grid + its exported cloud (refreshed
    at macro boundaries, like the obstacle map target)."""
    grid: PointMapGrid
    cloud: PointCloud


def init_state_3d(key, cfg: SlamConfig, world: World3D,
                  with_graph: bool = False) -> SlamState:
    """init_state with the z anchored at the true initial sensor height (the
    reference's global frame is defined by the start pose; z drift is what's
    estimated, not the absolute start)."""
    s = init_state(key, cfg, with_graph=with_graph)
    if s.map_grid is None:
        s = s.replace(map_grid=init_point_map(cfg.mls.size_x, cfg.icp.voxel_leaf_obs[0]))
    z0 = world3d.terrain_height(world, jnp.zeros(2)) + cfg.sim.sensor_height
    s = s.replace(pose=s.pose.at[3].set(z0),
                  true_pose=s.true_pose.at[3].set(z0),
                  # measured IMU attitude carry (keyframe capture attitude
                  # for the 6-DoF graph; zeros until the first frame's IMU
                  # reading lands)
                  attitude=jnp.zeros(2, s.pose.dtype))
    if with_graph and cfg.graph.edge_registration == "3d":
        # ground-point carry for 6-DoF keyframes (see SlamState.prev_ground)
        s = s.replace(prev_ground=make_cloud(cfg.graph.keyframe_points))
    return s


def init_ground_map(cfg: SlamConfig) -> GroundMap:
    # with grid-direct height interpolation the exported ground cloud is
    # never read — keep a stub container (pytree shape compat) instead of
    # map_capacity dead slots riding every donated scan carry (~640 KB/robot
    # at reference scale)
    cap = 8 if cfg.height.source == "grid" else cfg.cloud.map_capacity
    return GroundMap(grid=init_point_map(cfg.mls.size_x, cfg.icp.voxel_leaf_obs[0]),
                     cloud=make_cloud(cap))


def build_scene_3d_planes(scan_xyz, hit, cfg: SlamConfig):
    """setSceneCloud (icpTools.cpp:611-634): GP-INSAC segment, compact each
    class into its right-sized container (one-hot matmul; a Velodyne scan is
    mostly ground, so the obstacle scene is tiny), classify ground adjacency
    and voxel-downsample the obstacle scene (pairwise same-cell matmuls at
    the compacted size). Planar form: returns obstacle planes
    (ox, oy, oz, oga, odrv, ovalid) and ground planes (gx, gy, gz, gvalid) —
    see geometry.se2_apply_xy for why planes.

    The ground class is deliberately NOT voxel-downsampled: its three
    consumers re-bin anyway (the ground point-map grid is a per-cell centroid
    store; the occupancy path decrements per raw point exactly like the
    reference's addToOccupancy, mls.cpp:73-142, which runs on the unfiltered
    cloud; height bootstrap is a masked NN where denser is better)."""
    from slam_tpu.ops.classify import classify_ga_planes
    from slam_tpu.ops.voxel import (compact_planes,
                                    voxel_downsample_pairwise_planes)
    from slam_tpu.types import cloud_from_xyz

    cloud = cloud_from_xyz(scan_xyz, valid=hit)
    seg = segment_ground(cloud, cfg.ground)
    obstacle, ground, _ = split_ground_obstacle(seg.cloud)
    x, y, z = scan_xyz[..., 0], scan_xyz[..., 1], scan_xyz[..., 2]
    drv = ((seg.cloud.flags & PointCloud.FLAG_DRIVABLE) != 0).astype(x.dtype)

    builder = cfg.cloud.scene_builder
    if builder == "auto":
        builder = "grid" if x.shape[0] > 4096 else "incidence"
    if builder == "grid":
        # reference-scale path: one O(N) scatter voxelization replaces the
        # compact -> GA-classify -> (n, n) pairwise voxel chain below
        from slam_tpu.ops.scene_grid import build_scene_grid_planes
        ox, oy, oz, oga, odrv_b, okeep = build_scene_grid_planes(
            x, y, z, obstacle, drv, cfg.cloud.scene_capacity,
            cfg.icp.ga_resolution, cfg.icp.scan_grid_bins,
            cfg.icp.ga_threshold, recall=cfg.cloud.export_recall)
        return (ox, oy, oz, oga, odrv_b, okeep), (x, y, z, ground)

    (ox, oy, oz, odrv), ovalid = compact_planes(
        (x, y, z, drv), obstacle, cfg.cloud.scene_capacity)
    oga = classify_ga_planes(ox, oy, ovalid, jnp.zeros(2),
                             cfg.icp.ga_num_bins, cfg.icp.ga_resolution,
                             cfg.icp.ga_threshold)
    (ox, oy, oz), okeep, (oga, odrv_b) = voxel_downsample_pairwise_planes(
        ox, oy, oz, ovalid, (oga.astype(x.dtype), odrv),
        cfg.icp.voxel_leaf_obs)
    # ground planes stay in scan slots (mask only, no compaction): every
    # consumer (height bootstrap, ground-map scatter, occupancy decrement)
    # is mask-driven, and ground_capacity (1536) is so close to the scan
    # size (2048) that packing is a ~1 ms/tick (cap, N) reduction for a
    # 25% shrink of already-cheap consumers
    return (ox, oy, oz, oga, odrv_b, okeep), (x, y, z, ground)


def _reclassified_target_planes(map_cloud: PointCloud, pred, cfg: SlamConfig):
    """(mpx, mpy, mga, mvalid) from a graph-regenerated target with ground
    adjacency re-evaluated around the current prediction (the keyframe
    capture-time flags go stale after optimization/merging — the class-
    constrained match would reject valid correspondences)."""
    from slam_tpu.ops.classify import classify_ga_planes

    mpx = map_cloud.xyz[..., 0]
    mpy = map_cloud.xyz[..., 1]
    mga = classify_ga_planes(mpx, mpy, map_cloud.valid, pred[:2],
                             cfg.icp.ga_num_bins, cfg.icp.ga_resolution,
                             cfg.icp.ga_threshold)
    return mpx, mpy, mga, map_cloud.valid


def _planes_to_cloud_3d(px, py, pz, ga, drv, valid) -> PointCloud:
    """Pack obstacle planes into the PointCloud container (state carry)."""
    xyz = jnp.stack([px, py, pz], axis=-1)
    flags = jnp.where(ga, PointCloud.FLAG_GA, 0) | \
        jnp.where(drv, PointCloud.FLAG_DRIVABLE, 0)
    return PointCloud(xyz=jnp.where(valid[:, None], xyz, 0.0), valid=valid,
                      flags=jnp.where(valid, flags, 0).astype(jnp.int32))


def build_scene_3d(scan_xyz, hit, cfg: SlamConfig):
    """Cloud-out wrapper over build_scene_3d_planes (compat API): packs the
    obstacle planes and compacts the ground planes to ground_capacity."""
    from slam_tpu.ops.voxel import compact_planes

    (ox, oy, oz, oga, odrv, ovalid), (gx, gy, gz, gvalid) = \
        build_scene_3d_planes(scan_xyz, hit, cfg)
    obs = _planes_to_cloud_3d(ox, oy, oz, oga, odrv, ovalid)
    (gx, gy, gz), gvalid = compact_planes((gx, gy, gz), gvalid,
                                          cfg.cloud.ground_capacity)
    gnd = PointCloud(
        xyz=jnp.where(gvalid[:, None], jnp.stack([gx, gy, gz], -1), 0.0),
        valid=gvalid,
        flags=jnp.where(gvalid, PointCloud.FLAG_GROUND, 0).astype(jnp.int32))
    return obs, gnd


def slam_step_3d(state: SlamState, world: World3D, ground_map: GroundMap,
                 cfg: SlamConfig, refresh_map: bool = True,
                 shift_maps: bool = True, target_planes=None, field=None,
                 incremental_map: bool = True):
    """One simulated 3D SLAM tick: drive on terrain, sense (the robot tilts
    with the surface), then process the frame. Returns (state, ground_map).
    """
    dt = cfg.sim.dt
    key, k_noise, k_gyro = jax.random.split(state.rng, 3)

    # --- sim: drive on terrain + sense (robot tilts with the surface) ---
    cmd = world2d.drive_cmd(state.step, dt)
    cmd = ekf_mod.clamp_cmd(cmd, cfg.ekf)
    true2 = world2d.unicycle_step(state.true_pose[:3], cmd, dt)
    true_z = world3d.terrain_height(world, true2[:2]) + cfg.sim.sensor_height
    roll, pitch = world3d.terrain_attitude(world, true2[:2])
    scan_tilted, hit = world3d.raycast(world, true2, cfg.sim,
                                       noise_key=k_noise, roll=roll,
                                       pitch=pitch)
    imu_noise = cfg.sim.gyro_noise * jax.random.normal(k_gyro, (3,))
    gyro = cmd[2] + cfg.sim.gyro_bias + imu_noise[2]

    new_state, gm = process_frame_3d(
        state, ground_map, scan_tilted, hit, roll + imu_noise[0],
        pitch + imu_noise[1] + cfg.sim.imu_pitch_bias,
        gyro, cmd, cfg, refresh_map=refresh_map,
        shift_maps=shift_maps, target_planes=target_planes, field=field,
        incremental_map=incremental_map)
    return new_state.replace(
        true_pose=jnp.concatenate([true2, true_z[None]]), rng=key), gm


def slam_step_3d_io(state: SlamState, ground_map: GroundMap, scan_tilted,
                    hit, roll, pitch, gyro, cmd, cfg: SlamConfig,
                    refresh_map: bool = True, shift_maps: bool = True):
    """3D SLAM tick driven by EXTERNAL sensor frames (live deployment /
    replay / oracle comparisons): tilted-sensor-frame Velodyne points, hit
    mask, measured IMU attitude, raw gyro z, commanded body velocity."""
    return process_frame_3d(state, ground_map, scan_tilted, hit, roll, pitch,
                            gyro, cmd, cfg, refresh_map=refresh_map,
                            shift_maps=shift_maps)


def process_frame_3d(state: SlamState, ground_map: GroundMap, scan_tilted,
                     hit, roll, pitch, gyro, cmd, cfg: SlamConfig,
                     refresh_map: bool = True, shift_maps: bool = True,
                     target_planes=None, field=None,
                     incremental_map: bool = True):
    """Sensor frame -> updated (state, ground_map): IMU tilt compensation ->
    EKF predict/gyro -> GP-INSAC scene -> registration -> height
    interpolation -> maps. Point data stays planar end to end (see
    geometry.se2_apply_xy); clouds are packed only for the state carry.

    ground_map: persistent world-frame ground store (the reference's
    graph_slam-published global ground cloud feeding height interpolation,
    scan_registration.cpp:185-186 + icpTools.cpp:292).

    target_planes: optional (mx, my, mga, mvalid) scan-to-map target planes
    refreshed by the rollout at macro boundaries; None slices state.map_cloud.

    incremental_map: as in the 2D pipeline — False in graph mode, where
    registration targets come ONLY from the graph-regenerated map_cloud
    (with GA reclassified around the prediction) and the incremental
    obstacle grid/cloud are left untouched, so loop-closure corrections
    actually reach the scan matcher. Ground map and occupancy always update
    (they are not graph-corrected in the reference either).
    """
    from slam_tpu.geometry import se2_apply_xy
    from slam_tpu.mapping.occupancy import add_to_occupancy_xy2
    from slam_tpu.mapping.point_map import update_point_map_xy
    from slam_tpu.ops.height import height_interpolate_planes

    dt = cfg.sim.dt

    # non-finite scan points (external dropouts encoded as NaN rather than
    # hit=False) are treated as misses — one bad point would otherwise
    # NaN-poison every grid it scatters into. NaN attitude likewise zeroes
    # the tilt compensation instead of rotating the whole scan to NaN.
    hit = hit & jnp.all(jnp.isfinite(scan_tilted), axis=-1)
    # raw-scan completeness gate (pointcloud_filter.cpp:290 rejects
    # incomplete HDL-32E scans): all points masked -> registration fails,
    # EKF dead-reckons, maps untouched — the reference's skip semantics
    if cfg.cloud.min_scan_points > 0:
        hit = hit & (jnp.sum(hit) >= cfg.cloud.min_scan_points)
    roll = jnp.where(jnp.isfinite(roll), roll, 0.0)
    pitch = jnp.where(jnp.isfinite(pitch), pitch, 0.0)

    # IMU roll/pitch compensation (pointcloud_filter.cpp:103-148): rotate the
    # tilted sensor frame upright using the measured attitude
    from slam_tpu.geometry import rp_compensate
    scan_xyz = rp_compensate(jnp.where(hit[:, None], scan_tilted, 0.0),
                             roll, pitch)

    # --- EKF predict + gyro ---
    ekf = ekf_mod.motion_update(state.ekf, cmd, dt, cfg.ekf)
    ekf = ekf_mod.yaw_rate_update(ekf, gyro, cfg.ekf)
    pred = jnp.stack([ekf.mu[0], ekf.mu[1], ekf.mu[6]])

    # --- segmentation + registration ---
    (ox, oy, oz, oga, odrv, ovalid), (gx, gy, gz, gvalid) = \
        build_scene_3d_planes(scan_xyz, hit, cfg)
    matcher = cfg.icp.matcher
    if matcher not in ("points", "grid", "fused"):
        raise ValueError(f"unknown 3D icp.matcher {matcher!r} "
                         "(points | grid | fused; particle is 2D-only)")
    if not incremental_map and matcher == "grid":
        # the nearest-centroid field reads the incremental grid, which graph
        # mode does not maintain — register against the graph target instead
        matcher = "points"
    if matcher == "grid":
        from slam_tpu.ops.grid_icp import icp_fit_grid, nearest_point_field
        if field is None:
            field = nearest_point_field(state.map_grid,
                                        cfg.icp.voxel_leaf_obs[0],
                                        cfg.icp.ga_threshold)
        icp = icp_fit_grid(jnp.stack([ox, oy], -1), ovalid, oga, field,
                           pred, cfg.icp)
    elif matcher == "fused" and jax.default_backend() == "tpu":
        from slam_tpu.ops.icp_pallas import fused_register
        tp = target_planes
        if not incremental_map:
            tp = _reclassified_target_planes(state.map_cloud, pred, cfg)
        icp = fused_register(ox, oy, ovalid, oga, tp,
                             state.map_cloud, pred, cfg.icp)
    else:
        target = crop_box(state.map_cloud, pred[:2], cfg.icp.crop_dist)
        if not incremental_map:
            # graph target carries keyframe capture-time GA flags; re-run
            # the classifyPoints stencil around the prediction like the 2D
            # register_scan(reclassify=True) path
            mpx, mpy, mga, mvalid = _reclassified_target_planes(
                state.map_cloud, pred, cfg)
            icp = icp_fit(jnp.stack([ox, oy], -1), ovalid, oga,
                          jnp.stack([mpx, mpy], -1), target.valid & mvalid,
                          mga, pred, cfg.icp)
        else:
            icp = icp_fit(jnp.stack([ox, oy], -1), ovalid, oga,
                          target.xyz[..., :2], target.valid, target.is_ga(),
                          pred, cfg.icp)

    # --- EKF fuse + height interpolation ---
    from slam_tpu.utils import metrics
    metrics.emit("slam_step_3d", icp_ok=icp.ok, num_corr=icp.num_corr,
                 mean_residual=icp.mean_residual,
                 scene_points=jnp.sum(ovalid))
    ring = metrics.ring_write(state.metrics_ring, site="slam_step_3d",
                              step=state.step,
                              icp_ok=icp.ok, num_corr=icp.num_corr,
                              mean_residual=icp.mean_residual,
                              scene_points=jnp.sum(ovalid))
    ekf = ekf_mod.slam_update(ekf, icp.pose, cfg.ekf, has_meas=icp.ok)
    fused = jnp.stack([ekf.mu[0], ekf.mu[1], ekf.mu[6]])
    pose4_pre = jnp.concatenate([fused, state.pose[3:4]])
    map_pose = jnp.concatenate([jnp.where(icp.ok, icp.pose, pred),
                                state.pose[3:4]])
    if cfg.height.source == "grid":
        from slam_tpu.ops.height import height_interpolate_grid
        new_z = height_interpolate_grid(ground_map.grid, pose4_pre,
                                        cfg.height)
        have_map = jnp.sum(ground_map.grid.count >= 1.0) >= \
            cfg.height.min_corr_points
    else:
        new_z = height_interpolate(ground_map.cloud, pose4_pre, cfg.height)
        have_map = ground_map.cloud.count() >= cfg.height.min_corr_points
    # bootstrap: empty ground map -> current scan's ground points at the pose
    gwx, gwy = se2_apply_xy(map_pose[:3], gx, gy)
    z_scan = height_interpolate_planes(gwx, gwy, gz + map_pose[3], gvalid,
                                       pose4_pre, cfg.height)
    pose4 = pose4_pre.at[3].set(jnp.where(have_map, new_z, z_scan))
    map_pose = map_pose.at[3].set(pose4[3])
    # ground z anchors use the UPDATED height like the obstacle points below
    # — anchoring at the pre-interpolation z made the ground grid (the sole
    # height reference for the next tick) lag one tick's climb on slopes,
    # biasing estimated z downhill
    gwz = gz + map_pose[3]

    # --- maps: centroid grids, one matmul scatter each ---
    res = cfg.icp.voxel_leaf_obs[0]
    if incremental_map:
        owx, owy = se2_apply_xy(map_pose[:3], ox, oy)
        owz = oz + map_pose[3]
        mg = shift_point_map(state.map_grid, fused[:2], res) \
            if shift_maps else state.map_grid
        mg = update_point_map_xy(mg, owx, owy, owz, ovalid, res,
                                 z_precision=jax.lax.Precision.HIGH)
    else:
        mg = state.map_grid  # graph mode: the target is graph-regenerated
    gg = shift_point_map(ground_map.grid, fused[:2], res) \
        if shift_maps else ground_map.grid
    gg = update_point_map_xy(gg, gwx, gwy, gwz, gvalid, res,
                             z_precision=jax.lax.Precision.HIGH)
    if refresh_map and incremental_map:
        map_cloud = export_points(mg, state.map_cloud.capacity,
                                  ga_threshold=cfg.icp.ga_threshold,
                                  recall=cfg.cloud.export_recall)
        gnd_cloud = ground_map.cloud if cfg.height.source == "grid" else \
            export_points(gg, ground_map.cloud.capacity,
                          recall=cfg.cloud.export_recall)
    else:
        map_cloud = state.map_cloud
        gnd_cloud = ground_map.cloud

    # --- occupancy (MLS occupancy path, robot-centered world-oriented) ---
    grid = shift_origin(state.local_map, fused[:2], cfg.mls) \
        if shift_maps else state.local_map
    rel = jnp.stack([fused[0] - grid.center[0], fused[1] - grid.center[1],
                     fused[2]])
    olx, oly = se2_apply_xy(rel, ox, oy)
    glx, gly = se2_apply_xy(rel, gx, gy)
    grid = add_to_occupancy_xy2(grid, olx, oly, ovalid & ~odrv,
                                glx, gly, gvalid, cfg.mls)

    prev_scene = _fit_capacity(
        _planes_to_cloud_3d(ox, oy, oz, oga, odrv, ovalid),
        state.prev_scene.capacity)
    prev_ground = state.prev_ground
    if prev_ground is not None:
        # strided ground sample (beam order -> uniform angular/ring
        # coverage) for the 6-DoF keyframe merge; robot frame like
        # prev_scene — add_keyframe tilts the merged cloud to body frame
        from slam_tpu.ops.voxel import compact_planes
        cap = prev_ground.capacity
        stride = max(1, gx.shape[0] // cap)
        (pgx, pgy, pgz), pgv = compact_planes(
            (gx[::stride], gy[::stride], gz[::stride]),
            gvalid[::stride], cap)
        prev_ground = PointCloud(
            xyz=jnp.where(pgv[:, None], jnp.stack([pgx, pgy, pgz], -1), 0.0),
            valid=pgv,
            flags=jnp.where(pgv, PointCloud.FLAG_GROUND, 0).astype(jnp.int32))
    new_state = state.replace(
        ekf=ekf,
        pose=pose4,
        scan_reg_pose=map_pose,
        scan_reg_ok=icp.ok,
        local_map=grid,
        prev_scene=prev_scene,
        map_cloud=map_cloud,
        map_grid=mg,
        step=state.step + 1,
        metrics_ring=ring,
        # measured IMU attitude of THIS frame (sanitized above) — consumed
        # as the keyframe capture attitude by the 6-DoF graph path
        attitude=(jnp.stack([roll, pitch])
                  if state.attitude is not None else None),
        prev_ground=prev_ground,
    )
    return new_state, GroundMap(grid=gg, cloud=gnd_cloud)


def _fit_capacity(cloud: PointCloud, cap: int) -> PointCloud:
    n = cloud.capacity
    if n == cap:
        return cloud
    if n > cap:
        return PointCloud(xyz=cloud.xyz[:cap], valid=cloud.valid[:cap],
                          flags=cloud.flags[:cap])
    pad = cap - n
    return PointCloud(xyz=jnp.pad(cloud.xyz, ((0, pad), (0, 0))),
                      valid=jnp.pad(cloud.valid, (0, pad)),
                      flags=jnp.pad(cloud.flags, (0, pad)))


@partial(jax.jit, static_argnames=("cfg", "num_steps", "field_every"))
def rollout_3d(state: SlamState, world: World3D, ground_map, cfg: SlamConfig,
               num_steps: int, field_every: int = 4):
    """num_steps ticks (rounded up to field_every multiples): map targets
    refresh and rolling maps re-center once per macro."""
    if isinstance(ground_map, PointCloud):  # legacy call shape
        ground_map = GroundMap(grid=init_point_map(cfg.mls.size_x, cfg.icp.voxel_leaf_obs[0]),
                               cloud=ground_map)
    num_macro = -(-num_steps // field_every)

    use_grid_matcher = cfg.icp.matcher == "grid"

    def macro(carry, _):
        from slam_tpu.mapping.point_map import export_point_planes
        from slam_tpu.pipeline.slam2d import planes_to_cloud

        s, gm = carry
        s = s.replace(
            map_grid=shift_point_map(s.map_grid, s.pose[:2]),
            local_map=shift_origin(s.local_map, s.pose[:2], cfg.mls))
        gm = GroundMap(grid=shift_point_map(gm.grid, s.pose[:2]),
                       cloud=gm.cloud)
        field = None
        if use_grid_matcher:
            from slam_tpu.ops.grid_icp import nearest_point_field
            field = nearest_point_field(s.map_grid,
                                        cfg.icp.voxel_leaf_obs[0],
                                        cfg.icp.ga_threshold)
            planes = None
        else:
            ex, ey, ez, ega, evalid = export_point_planes(
                s.map_grid, s.map_cloud.capacity,
                ga_threshold=cfg.icp.ga_threshold,
                recall=cfg.cloud.export_recall)
            planes = (ex, ey, ega, evalid)
            s = s.replace(map_cloud=planes_to_cloud(ex, ey, ega, evalid, ez))
        if cfg.height.source != "grid":
            gm = GroundMap(grid=gm.grid,
                           cloud=export_points(gm.grid, gm.cloud.capacity,
                                               recall=cfg.cloud.export_recall))

        def tick(c, _):
            ss, g = c
            ss, g = slam_step_3d(ss, world, g, cfg, refresh_map=False,
                                 shift_maps=False, target_planes=planes,
                                 field=field)
            return (ss, g), (ss.pose, ss.true_pose)

        (s, gm), traj = jax.lax.scan(tick, (s, gm), None, length=field_every)
        return (s, gm), traj

    (final, gm), traj = jax.lax.scan(macro, (state, ground_map), None,
                                     length=num_macro)
    est, true = traj
    return final, gm, (est.reshape(-1, 4)[:num_steps],
                       true.reshape(-1, 4)[:num_steps])


def apply_graph_offset(gm: GroundMap, delta: jnp.ndarray) -> GroundMap:
    """MLS::offsetMap applied to the ground store (mls.cpp:481-505 via
    local_mapper.cpp:48-51): shift the grid's z content by the graph
    pose-offset's z so the next height interpolation reads the corrected
    surface. The exported cloud shadows the grid between macro refreshes, so
    its z shifts too (the reference's global_cloud branch, mls.cpp:493-502).
    Only delta z is applied — the reference's offsetMap ignores x/y/yaw."""
    from slam_tpu.mapping.point_map import offset_point_map_z

    dz = delta[3]
    return GroundMap(
        grid=offset_point_map_z(gm.grid, dz),
        cloud=gm.cloud.replace(
            xyz=gm.cloud.xyz.at[:, 2].add(
                jnp.where(gm.cloud.valid, dz, 0.0))))


@partial(jax.jit, static_argnames=("cfg", "num_macro", "graph_every"))
def rollout_3d_with_graph(state: SlamState, world: World3D,
                          ground_map, cfg: SlamConfig,
                          num_macro: int, graph_every: int = 8):
    """Full 3D stack with pose-graph SLAM in the loop: `graph_every` fused
    scan ticks per graph tick (the reference's 10 Hz graph_slam loop under
    the per-scan registration loop). Reuses the 2D graph_update — keyframes
    are the segmented obstacle scenes; edges come from the same planar ICP
    the reference uses (its graph edges are planar-ICP derived too).

    The optimizer's pose-offset delta z is applied to the ground map
    (MLS::offsetMap dataflow: graph_slam.cpp:357-384 publishes the newest
    node's delta, local_mapper.cpp:48-51 shifts its map's z content by it,
    mls.cpp:481-505) — so a loop closure's z correction reaches the next
    tick's wheel-contact height interpolation, which reads this map."""
    from slam_tpu.pipeline.slam2d import graph_update_delta

    if isinstance(ground_map, PointCloud):
        ground_map = GroundMap(grid=init_point_map(cfg.mls.size_x, cfg.icp.voxel_leaf_obs[0]),
                               cloud=ground_map)
    if state.map_grid is None:
        state = state.replace(map_grid=init_point_map(cfg.mls.size_x, cfg.icp.voxel_leaf_obs[0]))

    def macro(carry, _):
        s, gm = carry
        if cfg.height.source != "grid":
            gm = GroundMap(grid=gm.grid,
                           cloud=export_points(gm.grid, gm.cloud.capacity,
                                               recall=cfg.cloud.export_recall))
        # re-center rolling maps once per macro (same hoist as rollout_3d:
        # three dynamic rolls per tick otherwise); the obstacle point-map
        # grid is not maintained in graph mode, so only ground + occupancy
        gm = GroundMap(grid=shift_point_map(gm.grid, s.pose[:2]),
                       cloud=gm.cloud)
        s = s.replace(local_map=shift_origin(s.local_map, s.pose[:2],
                                             cfg.mls))

        def tick(c, _):
            ss, g = c
            # incremental_map=False: registration targets come ONLY from
            # the graph-regenerated map_cloud (loop-closure corrections
            # reach the matcher), with GA reclassified around the pose
            ss, g = slam_step_3d(ss, world, g, cfg, refresh_map=False,
                                 shift_maps=False, incremental_map=False)
            return (ss, g), (ss.pose, ss.true_pose)

        (s, gm), traj = jax.lax.scan(tick, (s, gm), None, length=graph_every)
        s, delta = graph_update_delta(s, cfg)
        gm = apply_graph_offset(gm, delta)
        return (s, gm), traj

    (final, gm), traj = jax.lax.scan(macro, (state, ground_map), None,
                                     length=num_macro)
    est, true = traj
    return final, gm, (est.reshape(-1, 4), true.reshape(-1, 4))
