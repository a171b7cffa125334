"""Fused 3D SLAM step — BASELINE config 2: Velodyne scans through GP-INSAC
ground segmentation + class-constrained scan registration + height
interpolation + local occupancy mapping.

Mirrors the reference nodes: pointcloud_filter/CCICP::setSceneCloud
(segmentation + voxel), scan_registration (ICP + doHeightInterpolate), ekf,
local_mapper (MLS occupancy path) — fused into one jitted step over SlamState
(SURVEY.md §3.1-3.4 call stacks).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from slam_tpu.config import SlamConfig
from slam_tpu.geometry import se2_apply
from slam_tpu.mapping.occupancy import add_to_occupancy, shift_origin
from slam_tpu.models import ekf as ekf_mod
from slam_tpu.ops.classify import classify_ground_adjacent
from slam_tpu.ops.ground import segment_ground, split_ground_obstacle
from slam_tpu.ops.height import height_interpolate
from slam_tpu.ops.icp import icp_fit
from slam_tpu.ops.voxel import crop_box, voxel_downsample
from slam_tpu.pipeline.slam2d import init_state  # shared state init
from slam_tpu.sim import world2d, world3d
from slam_tpu.sim.world3d import World3D
from slam_tpu.types import PointCloud, SlamState


def init_state_3d(key, cfg: SlamConfig, world: World3D,
                  with_graph: bool = False) -> SlamState:
    """init_state with the z anchored at the true initial sensor height (the
    reference's global frame is defined by the start pose; z drift is what's
    estimated, not the absolute start)."""
    s = init_state(key, cfg, with_graph=with_graph)
    z0 = world3d.terrain_height(world, jnp.zeros(2)) + cfg.sim.sensor_height
    return s.replace(pose=s.pose.at[3].set(z0),
                     true_pose=s.true_pose.at[3].set(z0))


def build_scene_3d(scan_xyz, hit, cfg: SlamConfig):
    """setSceneCloud (icpTools.cpp:611-634): GP-INSAC segment, classify ground
    adjacency on obstacles, voxel downsample obs and ground separately."""
    from slam_tpu.types import cloud_from_xyz

    cloud = cloud_from_xyz(scan_xyz, valid=hit)
    seg = segment_ground(cloud, cfg.ground)
    obstacle, ground, _ = split_ground_obstacle(seg.cloud)

    obs_cloud = seg.cloud.replace(valid=obstacle)
    obs_cloud = classify_ground_adjacent(
        obs_cloud, jnp.zeros(2), cfg.icp.ga_num_bins, cfg.icp.ga_resolution,
        cfg.icp.ga_threshold)
    obs_ds = voxel_downsample(obs_cloud, cfg.icp.voxel_leaf_obs,
                              cfg.cloud.scene_capacity)
    gnd_cloud = seg.cloud.replace(valid=ground)
    gnd_ds = voxel_downsample(gnd_cloud, cfg.icp.voxel_leaf_ground,
                              cfg.cloud.ground_capacity)
    return obs_ds, gnd_ds


def update_world_cloud(map_cloud: PointCloud, scene: PointCloud,
                       pose: jnp.ndarray, leaf, capacity: int) -> PointCloud:
    """Merge a robot-frame cloud into a world-frame map cloud at pose
    (x, y, yaw, z), voxel-merged to capacity."""
    xy = se2_apply(pose[:3], scene.xyz[..., :2])
    z = scene.xyz[..., 2] + pose[3]
    xyz = jnp.concatenate([xy, z[..., None]], axis=-1)
    merged = PointCloud(
        xyz=jnp.concatenate([map_cloud.xyz, xyz], axis=0),
        valid=jnp.concatenate([map_cloud.valid, scene.valid], axis=0),
        flags=jnp.concatenate([map_cloud.flags, scene.flags], axis=0),
    )
    return voxel_downsample(merged, leaf, capacity)


def slam_step_3d(state: SlamState, world: World3D, ground_map: PointCloud,
                 cfg: SlamConfig):
    """One 3D SLAM tick. Returns (state, ground_map).

    ground_map: persistent world-frame ground cloud (the reference's
    graph_slam-published global ground cloud feeding height interpolation,
    scan_registration.cpp:185-186 + icpTools.cpp:292).
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
    # IMU roll/pitch compensation (pointcloud_filter.cpp:103-148): rotate the
    # tilted sensor frame upright using the measured attitude
    from slam_tpu.geometry import rp_compensate
    imu_noise = cfg.sim.gyro_noise * jax.random.normal(k_gyro, (3,))
    scan_xyz = rp_compensate(scan_tilted, roll + imu_noise[0],
                             pitch + imu_noise[1])
    gyro = cmd[2] + cfg.sim.gyro_bias + imu_noise[2]

    # --- EKF predict + gyro ---
    ekf = ekf_mod.motion_update(state.ekf, cmd, dt, cfg.ekf)
    ekf = ekf_mod.yaw_rate_update(ekf, gyro, cfg.ekf)
    pred = jnp.stack([ekf.mu[0], ekf.mu[1], ekf.mu[6]])

    # --- segmentation + registration ---
    obs_scene, gnd_scene = build_scene_3d(scan_xyz, hit, cfg)
    target = crop_box(state.map_cloud, pred[:2], cfg.icp.crop_dist)
    target = classify_ground_adjacent(
        target, pred[:2], cfg.icp.ga_num_bins, cfg.icp.ga_resolution,
        cfg.icp.ga_threshold)
    if cfg.icp.matcher == "fused" and jax.default_backend() == "tpu":
        from slam_tpu.ops.icp_pallas import make_icp_fused
        icp = make_icp_fused(cfg.icp)(
            obs_scene.xyz[..., :2], obs_scene.valid, obs_scene.is_ga(),
            target.xyz[..., :2], target.valid, target.is_ga(), pred)
    else:
        icp = icp_fit(obs_scene.xyz[..., :2], obs_scene.valid,
                      obs_scene.is_ga(), target.xyz[..., :2], target.valid,
                      target.is_ga(), pred, cfg.icp)

    # --- EKF fuse + height interpolation ---
    ekf = ekf_mod.slam_update(ekf, icp.pose, cfg.ekf, has_meas=icp.ok)
    fused = jnp.stack([ekf.mu[0], ekf.mu[1], ekf.mu[6]])
    pose4_pre = jnp.concatenate([fused, state.pose[3:4]])
    new_z = height_interpolate(ground_map, pose4_pre, cfg.height)
    # bootstrap: empty ground map -> fall back to current scan's ground points
    # placed at the predicted pose
    boot_pose = jnp.concatenate([jnp.where(icp.ok, icp.pose, pred),
                                 state.pose[3:4]])
    gnd_world_xy = se2_apply(boot_pose[:3], gnd_scene.xyz[..., :2])
    gnd_world = gnd_scene.replace(xyz=jnp.concatenate(
        [gnd_world_xy, gnd_scene.xyz[..., 2:] + boot_pose[3]], axis=-1))
    have_map = ground_map.count() >= cfg.height.min_corr_points
    z_scan = height_interpolate(gnd_world, pose4_pre, cfg.height)
    pose4 = pose4_pre.at[3].set(jnp.where(have_map, new_z, z_scan))

    # --- map + occupancy ---
    map_pose = jnp.concatenate([jnp.where(icp.ok, icp.pose, pred),
                                pose4[3:4]])
    map_cloud = update_world_cloud(state.map_cloud, obs_scene, map_pose,
                                   cfg.icp.voxel_leaf_obs,
                                   cfg.cloud.map_capacity)
    ground_map = update_world_cloud(ground_map, gnd_scene, map_pose,
                                    cfg.icp.voxel_leaf_ground,
                                    cfg.cloud.map_capacity)

    grid = shift_origin(state.local_map, fused[:2], cfg.mls)
    rel = jnp.stack([fused[0] - grid.center[0], fused[1] - grid.center[1],
                     fused[2]])
    _, _, non_drv = split_ground_obstacle(obs_scene)
    obs_local = obs_scene.replace(
        xyz=jnp.concatenate([se2_apply(rel, obs_scene.xyz[..., :2]),
                             obs_scene.xyz[..., 2:]], axis=-1),
        valid=obs_scene.valid & ~((obs_scene.flags & PointCloud.FLAG_DRIVABLE) != 0))
    gnd_local = gnd_scene.replace(
        xyz=jnp.concatenate([se2_apply(rel, gnd_scene.xyz[..., :2]),
                             gnd_scene.xyz[..., 2:]], axis=-1))
    grid = add_to_occupancy(grid, obs_local, gnd_local, cfg.mls)

    new_state = state.replace(
        ekf=ekf,
        pose=pose4,
        scan_reg_pose=map_pose,
        scan_reg_ok=icp.ok,
        local_map=grid,
        prev_scene=obs_scene,
        map_cloud=map_cloud,
        step=state.step + 1,
        true_pose=jnp.concatenate([true2, true_z[None]]),
        rng=key,
    )
    return new_state, ground_map


@partial(jax.jit, static_argnames=("cfg", "num_macro", "graph_every"))
def rollout_3d_with_graph(state: SlamState, world: World3D,
                          ground_map: PointCloud, cfg: SlamConfig,
                          num_macro: int, graph_every: int = 8):
    """Full 3D stack with pose-graph SLAM in the loop: `graph_every` fused
    scan ticks per graph tick (the reference's 10 Hz graph_slam loop under
    the per-scan registration loop). Reuses the 2D graph_update — keyframes
    are the segmented obstacle scenes; edges come from the same planar ICP
    the reference uses (its graph edges are planar-ICP derived too)."""
    from slam_tpu.pipeline.slam2d import graph_update

    def macro(carry, _):
        s, gm = carry

        def tick(c, _):
            ss, g = c
            ss, g = slam_step_3d(ss, world, g, cfg)
            return (ss, g), (ss.pose, ss.true_pose)

        (s, gm), traj = jax.lax.scan(tick, (s, gm), None, length=graph_every)
        s = graph_update(s, cfg)
        return (s, gm), traj

    (final, gm), traj = jax.lax.scan(macro, (state, ground_map), None,
                                     length=num_macro)
    est, true = traj
    return final, gm, (est.reshape(-1, 4), true.reshape(-1, 4))


@partial(jax.jit, static_argnames=("cfg", "num_steps"))
def rollout_3d(state: SlamState, world: World3D, ground_map: PointCloud,
               cfg: SlamConfig, num_steps: int):
    def body(carry, _):
        s, gm = carry
        s, gm = slam_step_3d(s, world, gm, cfg)
        return (s, gm), (s.pose, s.true_pose)

    (final, gm), traj = jax.lax.scan(body, (state, ground_map), None,
                                     length=num_steps)
    return final, gm, traj
