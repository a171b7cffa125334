"""Fused 2D SLAM step — the minimum end-to-end slice (SURVEY.md §7 steps 1-6).

One pure jitted function replaces the reference's cooperating ROS nodes
(nasa_mapping/launch/nasa_mapping.launch:10-14): sensor -> scene build
(classify + voxel) -> CCICP scan-to-map -> EKF fuse -> occupancy grid, with
the EKF->ICP->map feedback loop of SURVEY.md §1 preserved inside a single XLA
program. vmap over robots gives the fleet; pjit/shard_map scales over devices.

Deterministic interleaving (the reference runs nodes at 100/ per-scan /50 Hz
asynchronously): every sim tick runs motion-update + gyro update; a scan is
taken every tick, registered, fused, and mapped. This matches the reference
loop at its scan rate with the EKF sub-cycled via `ekf_substeps`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from slam_tpu.config import SlamConfig
from slam_tpu.geometry import se2_apply
from slam_tpu.mapping.occupancy import (add_to_occupancy_xy, init_occupancy,
                                        shift_origin)
from slam_tpu.models import ekf as ekf_mod
from slam_tpu.ops.classify import classify_ground_adjacent
from slam_tpu.ops.icp import icp_fit
from slam_tpu.ops.voxel import crop_box, voxel_downsample
from slam_tpu.types import PointCloud, SlamState, make_cloud
from slam_tpu.sim import world2d
from slam_tpu.sim.world2d import World2D
from slam_tpu.utils import metrics as metrics_mod


def init_state(key: jnp.ndarray, cfg: SlamConfig,
               with_graph: bool = False,
               calibrate_gyro: bool = True,
               with_metrics_ring: bool = False,
               metrics_ring_capacity: int = 256) -> SlamState:
    graph = None
    map_grid = None
    if with_graph:
        from slam_tpu.graph.pose_graph import init_graph
        graph = init_graph(cfg.graph)
    else:
        from slam_tpu.mapping.point_map import init_point_map
        map_grid = init_point_map(cfg.mls.size_x, cfg.icp.voxel_leaf_obs[0])
    # gyro-bias calibration: average stationary samples before driving
    # (initialize_ekf, nasa_ekf.cpp:292-335 — 'DO NOT MOVE ROBOT')
    key, k_cal = jax.random.split(key)
    bias = 0.0
    if calibrate_gyro:
        samples = cfg.sim.gyro_bias + cfg.sim.gyro_noise * jax.random.normal(
            k_cal, (cfg.ekf.num_init_imu_samples,))
        bias = ekf_mod.estimate_gyro_bias(samples)
    return SlamState(
        ekf=ekf_mod.init_ekf(cfg.ekf, gyro_bias=bias),
        pose=jnp.zeros(4),
        scan_reg_pose=jnp.zeros(4),
        scan_reg_ok=jnp.asarray(False),
        local_map=init_occupancy(cfg.mls),
        prev_scene=make_cloud(cfg.cloud.scene_capacity),
        map_cloud=make_cloud(cfg.cloud.map_capacity),
        map_grid=map_grid,
        graph=graph,
        graph_full=jnp.asarray(False),
        step=jnp.int32(0),
        true_pose=jnp.zeros(4),
        rng=key,
        metrics_ring=(metrics_mod.init_ring(metrics_ring_capacity)
                      if with_metrics_ring else None),
    )


def build_scene_planes(px: jnp.ndarray, py: jnp.ndarray, hit: jnp.ndarray,
                       cfg: SlamConfig):
    """CCICP::setSceneCloud for the 2D path (icpTools.cpp:611-634): voxel
    downsample at the GA grid's 0.5 m resolution + ground-adjacency flags
    (classifyPoints stencil). Planar form: x/y planes in, (sx, sy, ga, keep)
    planes out, padded to scene_capacity — no (N, small) stacks anywhere
    (see geometry.se2_apply_xy for why).

    A scan has <= scan_capacity points, so voxelization is a same-cell
    pairwise (N, N) matmul — exact per-cell centroids with first-point-keeps
    dedupe, no sort/top-k (grid export cost ~12 ms/step at batch 1024).
    GA flags come from a count raster + banded stencil + one matmul-gather.

    Reference-scale scans (>=20k points, scan_registration.cpp:122) route to
    the O(N) scatter-to-grid builder instead (cfg.cloud.scene_builder)."""
    from slam_tpu.ops.scatter2d import gather_cells_2d, scatter_add_2d_multi
    from slam_tpu.ops.stencil import neighbor_sum_2d

    builder = cfg.cloud.scene_builder
    if builder == "auto":
        builder = "grid" if px.shape[0] > 4096 else "incidence"
    if builder == "grid":
        from slam_tpu.ops.scene_grid import build_scene_grid_planes
        sx, sy, _, ga, _, keep = build_scene_grid_planes(
            px, py, None, hit, None, cfg.cloud.scene_capacity,
            cfg.icp.ga_resolution, cfg.icp.scan_grid_bins,
            cfg.icp.ga_threshold, recall=cfg.cloud.export_recall)
        return sx, sy, ga, keep

    res = cfg.icp.ga_resolution
    G = cfg.icp.ga_num_bins
    ci = jnp.floor(px / res).astype(jnp.int32) + G // 2
    cj = jnp.floor(py / res).astype(jnp.int32) + G // 2
    inb = hit & (ci >= 0) & (cj >= 0) & (ci < G) & (cj < G)
    cell = jnp.where(inb, ci * G + cj, -1)

    # same-cell incidence: M[n, m] = both valid and in the same cell
    same = (cell[:, None] == cell[None, :]) & inb[:, None] & inb[None, :]
    Mf = same.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(Mf, axis=1), 1.0)
    # first-in-cell keeps the slot (dedupe); the rest are masked out
    n_idx = jnp.arange(cell.shape[0], dtype=jnp.int32)
    first_m = jnp.min(jnp.where(same, n_idx[None, :], cell.shape[0]), axis=1)
    keep = inb & (first_m == n_idx)

    # exact per-cell centroid: cell center + mean of cell-relative offsets
    ccx = (ci.astype(px.dtype) - G // 2 + 0.5) * res
    ccy = (cj.astype(py.dtype) - G // 2 + 0.5) * res
    relx = jnp.where(inb, px - ccx, 0.0)
    rely = jnp.where(inb, py - ccy, 0.0)
    # DEFAULT (bf16) precision is exact enough here: offsets are cell-relative
    # (bounded +-res/2), matching the stacked implementation's choice
    prec = jax.lax.Precision.DEFAULT
    sx = ccx + jnp.einsum("nm,m->n", Mf, relx, precision=prec) / count
    sy = ccy + jnp.einsum("nm,m->n", Mf, rely, precision=prec) / count

    # GA classification on the occupancy raster (classifyPoints rule)
    (counts,) = scatter_add_2d_multi(ci, cj, (None,), inb, (G, G),
                                     precision=prec)
    occ = counts > 0
    # 0/1 indicator raster: DEFAULT bf16 is exact (f32 accumulation)
    box = neighbor_sum_2d((~occ).astype(jnp.float32),
                          precision=jax.lax.Precision.DEFAULT)
    ii = jnp.arange(G)
    interior = ((ii > 0) & (ii < G - 1))[:, None] & \
        ((ii > 0) & (ii < G - 1))[None, :]
    ga_grid = (occ & interior & (box >= cfg.icp.ga_threshold))
    ga = gather_cells_2d(ga_grid.astype(jnp.float32)[..., None],
                         ci, cj)[:, 0] > 0.5

    ga = ga & keep
    # pad/compact to the configured scene capacity (static shape contract)
    cap = cfg.cloud.scene_capacity
    n = px.shape[0]
    if n < cap:
        pad = cap - n
        sx, sy = jnp.pad(sx, (0, pad)), jnp.pad(sy, (0, pad))
        keep, ga = jnp.pad(keep, (0, pad)), jnp.pad(ga, (0, pad))
    elif n > cap:
        # compact kept centroids to the front, THEN truncate: slot order
        # tracks scan bearing, so cropping raw slots would discard the back
        # half of the field of view even when few voxel centroids survived
        # — overflow must drop only excess VALID voxels (the ICP_MAX_PTS
        # truncation, icpTools.cpp:255-259)
        from slam_tpu.ops.voxel import compact_planes
        (sx, sy, gaf), keep = compact_planes(
            (sx, sy, ga.astype(sx.dtype)), keep, cap)
        ga = gaf > 0.5
    sx = jnp.where(keep, sx, 0.0)
    sy = jnp.where(keep, sy, 0.0)
    return sx, sy, ga, keep


def planes_to_cloud(sx, sy, ga, keep, sz=None) -> PointCloud:
    """Pack planes into the PointCloud container (state carry / cloud APIs)."""
    z = jnp.zeros_like(sx) if sz is None else sz
    xyz = jnp.stack([sx, sy, z], axis=-1)
    flags = jnp.where(ga, PointCloud.FLAG_GA, 0).astype(jnp.int32)
    return PointCloud(xyz=xyz, valid=keep, flags=flags)


def build_scene(scan_xyz: jnp.ndarray, hit: jnp.ndarray,
                cfg: SlamConfig) -> PointCloud:
    """Cloud-in/cloud-out wrapper over build_scene_planes (compat API)."""
    sx, sy, ga, keep = build_scene_planes(
        scan_xyz[..., 0], scan_xyz[..., 1], hit, cfg)
    return planes_to_cloud(sx, sy, ga, keep)


def register_scan(scene: PointCloud, map_cloud: PointCloud,
                  init_pose_xyyaw: jnp.ndarray, cfg: SlamConfig,
                  reclassify: bool = True):
    """scan_registration node (scan_registration.cpp:109-176): crop the map
    target around the pose, re-classify it, run class-constrained ICP.

    reclassify=False when the target already carries GA flags (the point-map
    grid computes them on export with the same stencil)."""
    target = crop_box(map_cloud, init_pose_xyyaw[:2], cfg.icp.crop_dist)
    if reclassify:
        target = classify_ground_adjacent(
            target, init_pose_xyyaw[:2], cfg.icp.ga_num_bins,
            cfg.icp.ga_resolution, cfg.icp.ga_threshold)
    return icp_fit(
        scene.xyz[..., :2], scene.valid, scene.is_ga(),
        target.xyz[..., :2], target.valid, target.is_ga(),
        init_pose_xyyaw, cfg.icp)


def register_scan_to_scan(scene: PointCloud, prev_scene: PointCloud,
                          prev_pose: jnp.ndarray, init_pose: jnp.ndarray,
                          cfg: SlamConfig):
    """SCAN_TO_SCAN registration (CCICP type SCAN_TO_SCAN,
    icpTools.cpp:592-607): the previous segmented scan, placed at its
    registered pose, is the model. Returns the scene's absolute pose."""
    from slam_tpu.geometry import se2_apply

    target_xy = se2_apply(prev_pose[:3], prev_scene.xyz[..., :2])
    target = prev_scene.replace(
        xyz=jnp.concatenate([target_xy, prev_scene.xyz[..., 2:]], axis=-1))
    if cfg.icp.matcher == "fused" and jax.default_backend() == "tpu":
        from slam_tpu.ops.icp_pallas import make_icp_fused
        return make_icp_fused(cfg.icp)(
            scene.xyz[..., :2], scene.valid, scene.is_ga(),
            target.xyz[..., :2], target.valid, target.is_ga(), init_pose)
    return icp_fit(scene.xyz[..., :2], scene.valid, scene.is_ga(),
                   target.xyz[..., :2], target.valid, target.is_ga(),
                   init_pose, cfg.icp)


def update_map_cloud(map_cloud: PointCloud, scene: PointCloud,
                     pose_xyyaw: jnp.ndarray, cfg: SlamConfig) -> PointCloud:
    """Concat + voxel-merge map maintenance (kept as the cloud-level API;
    the hot path uses the point-map grid in mapping/point_map.py instead —
    sort-free and ~20x cheaper on TPU)."""
    world_xy = se2_apply(pose_xyyaw, scene.xyz[..., :2])
    world_xyz = jnp.concatenate([world_xy, scene.xyz[..., 2:]], axis=-1)
    merged = PointCloud(
        xyz=jnp.concatenate([map_cloud.xyz, world_xyz], axis=0),
        valid=jnp.concatenate([map_cloud.valid, scene.valid], axis=0),
        flags=jnp.concatenate([map_cloud.flags, scene.flags], axis=0),
    )
    return voxel_downsample(merged, cfg.icp.voxel_leaf_obs,
                            cfg.cloud.map_capacity)


def slam_step(state: SlamState, world: World2D, cfg: SlamConfig,
              incremental_map: bool = True, field=None,
              refresh_map: bool = True, shift_maps: bool = True,
              target_planes=None, pf_target=None) -> SlamState:
    """One full SLAM tick. Pure; jit/vmap/shard_map friendly.

    incremental_map: fold each registered scene into the map target (the
    standalone scan-to-map mode). Graph mode passes False — there the target
    is regenerated from optimized keyframes only (reference dataflow:
    scan_registration targets come solely from graph_slam's published clouds,
    scan_registration.cpp:185-186).

    field: precomputed nearest-centroid field for the grid matcher. The
    rollout recomputes it every `field_every` ticks — the reference's own
    cadence (scan-reg targets refresh at graph_slam's 10 Hz, not per scan).
    None => compute fresh this step."""
    dt = cfg.sim.dt
    key, k_noise, k_gyro = jax.random.split(state.rng, 3)

    # --- simulation: drive + sense (ground truth) ---
    cmd = world2d.drive_cmd(state.step, dt)
    cmd = ekf_mod.clamp_cmd(cmd, cfg.ekf)
    true2 = world2d.unicycle_step(state.true_pose[:3], cmd, dt)
    ranges, hit = world2d.raycast(world, true2, cfg.sim, noise_key=k_noise)
    scan_x, scan_y, hit = world2d.scan_to_planes(ranges, hit)
    gyro = cmd[2] + cfg.sim.gyro_bias + cfg.sim.gyro_noise * \
        jax.random.normal(k_gyro)

    state = process_frame_planes(
        state, scan_x, scan_y, hit, gyro, cmd, cfg,
        incremental_map=incremental_map, field=field,
        refresh_map=refresh_map, shift_maps=shift_maps,
        target_planes=target_planes, pf_target=pf_target)
    return state.replace(true_pose=jnp.concatenate([true2, jnp.zeros(1)]),
                         rng=key)


def slam_step_io(state: SlamState, scan_xyz, hit, gyro, cmd,
                 cfg: SlamConfig, field=None,
                 incremental_map: bool = True,
                 refresh_map: bool = True) -> SlamState:
    """SLAM tick driven by EXTERNAL sensor frames (live deployment / replay
    through the native transport, or oracle comparisons): scan points in the
    robot frame, raw gyro z, commanded body velocity."""
    return process_frame(state, scan_xyz, hit, gyro, cmd, cfg, field=field,
                         incremental_map=incremental_map,
                         refresh_map=refresh_map)


def process_frame(state: SlamState, scan_xyz, hit, gyro, cmd,
                  cfg: SlamConfig, incremental_map: bool = True, field=None,
                  refresh_map: bool = True,
                  shift_maps: bool = True) -> SlamState:
    """Sensor frame -> updated SLAM state (the fused node graph minus the
    simulator): EKF predict/gyro -> scene -> registration -> fuse -> maps."""
    return process_frame_planes(
        state, scan_xyz[..., 0], scan_xyz[..., 1], hit, gyro, cmd, cfg,
        incremental_map=incremental_map, field=field,
        refresh_map=refresh_map, shift_maps=shift_maps)


def process_frame_planes(state: SlamState, scan_x, scan_y, hit, gyro, cmd,
                         cfg: SlamConfig, incremental_map: bool = True,
                         field=None, refresh_map: bool = True,
                         shift_maps: bool = True,
                         target_planes=None, pf_target=None) -> SlamState:
    """process_frame on x/y scan planes — the hot-path form. Point data stays
    planar (rank-2 under vmap) through scene build, transform, and grid
    updates; (N, small)-stacked arrays lane-pad their minor dim to 128 on TPU
    and were ~10 ms/tick of pure padding traffic at batch 1024.

    target_planes: optional (mx, my, mga, mvalid) scan-to-map target planes
    (export_point_planes) — the rollout refreshes them at macro boundaries;
    None falls back to slicing state.map_cloud.

    pf_target: optional PointMapGrid the particle matcher scores against
    INSTEAD of state.map_grid — the fleet-shared map path
    (parallel.shared_map.fleet_rollout_shared): one replicated grid closed
    over the vmapped step, so no per-robot copy is ever materialized. With
    pf_target set, pass incremental_map=False — per-robot map maintenance
    is the shared scatter's job (done once per macro for the whole fleet)."""
    from slam_tpu.geometry import se2_apply_xy

    dt = cfg.sim.dt

    # non-finite scan points (external dropouts encoded as NaN rather than
    # hit=False) are treated as misses — and their coordinates zeroed, since
    # even a masked NaN poisons one-hot scatters (0 * NaN = NaN)
    hit = hit & jnp.isfinite(scan_x) & jnp.isfinite(scan_y)
    # raw-scan completeness gate (scan_registration.cpp:122 rejects <20k-pt
    # scans outright): an incomplete scan masks ALL points — registration
    # fails ok=False and the EKF dead-reckons through the frame, exactly
    # the reference's skip-scan recovery. Units: RAW scan hits (the
    # keyframe gate below is in voxelized-keyframe-cloud units instead)
    if cfg.cloud.min_scan_points > 0:
        hit = hit & (jnp.sum(hit) >= cfg.cloud.min_scan_points)
    scan_x = jnp.where(hit, scan_x, 0.0)
    scan_y = jnp.where(hit, scan_y, 0.0)

    # --- EKF predict + gyro update (nasa_ekf.cpp:421-446 order) ---
    ekf = ekf_mod.motion_update(state.ekf, cmd, dt, cfg.ekf)
    ekf = ekf_mod.yaw_rate_update(ekf, gyro, cfg.ekf)
    pred = jnp.stack([ekf.mu[0], ekf.mu[1], ekf.mu[6]])

    # --- scene build + scan registration ---
    sx, sy, sga, skeep = build_scene_planes(scan_x, scan_y, hit, cfg)
    scene = planes_to_cloud(sx, sy, sga, skeep)
    matcher = cfg.icp.matcher
    if matcher not in ("points", "grid", "fused", "particle"):
        raise ValueError(f"unknown icp.matcher {matcher!r} "
                         "(points | grid | fused | particle)")
    if matcher == "fused" and jax.default_backend() != "tpu":
        matcher = "points"
    if not incremental_map and matcher in ("grid", "particle") and \
            pf_target is None:
        # these matchers score against the incrementally-maintained map
        # grid, which graph mode deliberately does not update (targets come
        # from optimized keyframes only, scan_registration.cpp:185-186) —
        # register against the graph target instead of silently reading a
        # stale grid. An explicit pf_target (the fleet-shared map) is a
        # live target, so the particle matcher keeps it.
        matcher = "points"
    if incremental_map and matcher == "grid":
        from slam_tpu.ops.grid_icp import icp_fit_grid, nearest_point_field
        if field is None:
            field = nearest_point_field(state.map_grid,
                                        cfg.icp.voxel_leaf_obs[0],
                                        cfg.icp.ga_threshold)
        icp = icp_fit_grid(scene.xyz[..., :2], scene.valid, scene.is_ga(),
                           field, pred, cfg.icp)
    elif matcher == "particle" and (incremental_map or pf_target is not None):
        from slam_tpu.ops.icp import IcpResult
        from slam_tpu.ops.particle import pf_match
        # fold the step index in so external-frame replay (whose state.rng
        # is never advanced by a simulator) still gets fresh proposals
        pf_key = jax.random.fold_in(state.rng, state.step)
        r = pf_match(pf_key,
                     state.map_grid if pf_target is None else pf_target,
                     scene, pred, cfg.icp.voxel_leaf_obs[0], cfg.pf)
        n_valid = jnp.sum(skeep)
        icp = IcpResult(
            pose=r.pose, ok=r.ok,
            num_corr=jnp.round(r.score * n_valid).astype(jnp.int32),
            delta=jnp.float32(0.0), mean_residual=1.0 - r.score)
    elif matcher == "fused":
        from slam_tpu.ops.icp_pallas import fused_register
        tp = target_planes
        if not incremental_map:
            # graph-regenerated target: keyframe capture-time GA flags are
            # stale — re-run the classifyPoints stencil around the current
            # prediction, exactly as register_scan(reclassify=True) does
            # (previously graph mode silently downgraded fused to points,
            # so 2D and 3D graph rollouts ran different matchers for the
            # same config)
            from slam_tpu.ops.classify import classify_ga_planes
            mc = state.map_cloud
            mpx, mpy = mc.xyz[..., 0], mc.xyz[..., 1]
            mga = classify_ga_planes(mpx, mpy, mc.valid, pred[:2],
                                     cfg.icp.ga_num_bins,
                                     cfg.icp.ga_resolution,
                                     cfg.icp.ga_threshold)
            tp = (mpx, mpy, mga, mc.valid)
        icp = fused_register(sx, sy, skeep, sga, tp,
                             state.map_cloud, pred, cfg.icp)
    else:
        icp = register_scan(scene, state.map_cloud, pred, cfg,
                            reclassify=not incremental_map)

    # --- EKF SLAM update (scan_registration.cpp:161-175 failure gating) ---
    from slam_tpu.utils import metrics
    metrics.emit("slam_step", icp_ok=icp.ok, num_corr=icp.num_corr,
                 mean_residual=icp.mean_residual)
    ring = metrics.ring_write(state.metrics_ring, site="slam_step",
                              step=state.step,
                              icp_ok=icp.ok, num_corr=icp.num_corr,
                              mean_residual=icp.mean_residual,
                              scene_points=jnp.sum(skeep))
    ekf = ekf_mod.slam_update(ekf, icp.pose, cfg.ekf, has_meas=icp.ok)
    fused = jnp.stack([ekf.mu[0], ekf.mu[1], ekf.mu[6]])

    # --- map + occupancy updates ---
    # bootstrap: before the map exists, seed it from the prediction
    if incremental_map:
        from slam_tpu.mapping.point_map import (export_points,
                                                shift_point_map,
                                                update_point_map_xy)
        res = cfg.icp.voxel_leaf_obs[0]
        map_pose = jnp.where(icp.ok, icp.pose, pred)
        qx, qy = se2_apply_xy(map_pose, sx, sy)
        # rolling shifts are dynamic rolls (~15 ms/tick at batch 1024); the
        # robot moves <1 cell per tick, so the rollout shifts once per macro
        mg = shift_point_map(state.map_grid, fused[:2], res) \
            if shift_maps else state.map_grid
        # z plane is None: the 2D scene is planar, so the sum_z accumulator
        # passes through untouched (saves a grid RMW per tick)
        mg = update_point_map_xy(mg, qx, qy, None, skeep, res)
        if refresh_map:
            map_cloud = export_points(mg, state.map_cloud.capacity,
                                      ga_threshold=cfg.icp.ga_threshold,
                                      recall=cfg.cloud.export_recall)
        else:
            # rollout refreshes the exported target at macro boundaries —
            # the reference's own cadence (scan-reg targets update at
            # graph_slam's 10 Hz, scan_registration.cpp:185-186)
            map_cloud = state.map_cloud
    else:
        mg = state.map_grid
        map_cloud = state.map_cloud

    grid = shift_origin(state.local_map, fused[:2], cfg.mls) \
        if shift_maps else state.local_map
    yaw_only = jnp.stack([fused[0] - grid.center[0],
                          fused[1] - grid.center[1], fused[2]])
    lx, ly = se2_apply_xy(yaw_only, sx, sy)
    # the 2D path has no ground cloud, so the planar obstacle-only form
    # applies (the stacked path concatenated an empty dummy ground cloud)
    grid = add_to_occupancy_xy(grid, lx, ly, skeep, cfg.mls)

    return state.replace(
        ekf=ekf,
        pose=jnp.concatenate([fused, jnp.zeros(1)]),
        scan_reg_pose=jnp.concatenate([icp.pose, jnp.zeros(1)]),
        scan_reg_ok=icp.ok,
        local_map=grid,
        prev_scene=scene,
        map_cloud=map_cloud,
        map_grid=mg,
        step=state.step + 1,
        metrics_ring=ring,
    )


@partial(jax.jit, static_argnames=("cfg", "num_steps", "field_every"))
def rollout(state: SlamState, world: World2D, cfg: SlamConfig, num_steps: int,
            field_every: int = 4):
    """Run num_steps ticks; returns (final_state, (est_traj, true_traj)).

    Derived map targets (exported cloud / nearest-centroid field) refresh
    every `field_every` ticks — the reference's cadence (scan-reg targets
    update at graph_slam's 10 Hz, not per scan). num_steps rounds up to a
    multiple."""
    num_macro = -(-num_steps // field_every)
    use_grid = cfg.icp.matcher == "grid"
    use_pf = cfg.icp.matcher == "particle"
    if use_grid:
        from slam_tpu.ops.grid_icp import nearest_point_field

    def macro(s, _):
        field = None
        planes = None
        if use_grid:
            field = nearest_point_field(s.map_grid, cfg.icp.voxel_leaf_obs[0],
                                        cfg.icp.ga_threshold)
        elif not use_pf:  # particle matching scores the grid directly
            from slam_tpu.mapping.point_map import export_point_planes
            ex, ey, ez, ega, evalid = export_point_planes(
                s.map_grid, s.map_cloud.capacity,
                ga_threshold=cfg.icp.ga_threshold,
                recall=cfg.cloud.export_recall)
            planes = (ex, ey, ega, evalid)
            s = s.replace(map_cloud=planes_to_cloud(ex, ey, ega, evalid, ez))

        # re-center rolling maps once per macro (robot motion per macro is
        # ~1 cell); ticks then skip the dynamic rolls
        from slam_tpu.mapping.point_map import shift_point_map as _spm
        s = s.replace(
            map_grid=_spm(s.map_grid, s.pose[:2]),
            local_map=shift_origin(s.local_map, s.pose[:2], cfg.mls))

        def tick(ss, _):
            ss = slam_step(ss, world, cfg, field=field, refresh_map=False,
                           shift_maps=False, target_planes=planes)
            return ss, (ss.pose[:3], ss.true_pose[:3])

        return jax.lax.scan(tick, s, None, length=field_every)

    final, traj = jax.lax.scan(macro, state, None, length=num_macro)
    est, true = traj
    return final, (est.reshape(-1, 3)[:num_steps],
                   true.reshape(-1, 3)[:num_steps])


def graph_update(state: SlamState, cfg: SlamConfig) -> SlamState:
    """graph_slam node tick, discarding the pose-offset delta — for 2D
    pipelines, whose maps carry no z content (the only state the reference's
    offset feedback mutates, mls.cpp:481-505). 3D/height consumers use
    graph_update_delta and apply the z offset to their ground maps."""
    state, _delta = graph_update_delta(state, cfg)
    return state


def graph_update_delta(state: SlamState,
                       cfg: SlamConfig) -> tuple[SlamState, jnp.ndarray]:
    """graph_slam node tick (graph_slam.cpp:479-585): gate/insert a keyframe
    with edges, optimize, regenerate the scan-to-map target from keyframes.
    Returns (state, delta): delta is the (x, y, yaw, z) pose offset of the
    newest node across the optimization (graph_slam.cpp:357-384, the
    /mapping/graph_slam/pose_offset topic; zeros when no optimization ran).

    Run at a slower cadence than slam_step (the reference caps it at 10 Hz and
    gates keyframes at 5 m spacing) — see rollout_with_graph.

    The optimized pose offset shifts only MAPS, not the EKF: the reference's
    EKF subscription to /mapping/graph_slam/pose_offset is commented out
    (nasa_ekf.cpp:396-397), and local_mapper applies only the z offset via
    MLS::offsetMap (local_mapper.cpp:48-51, mls.cpp:481-505) — callers with
    z-bearing maps apply delta[3] via mapping.point_map.offset_point_map_z /
    mapping.mls.offset_mls_z (see slam3d.rollout_3d_with_graph). The
    occupancy grid holds log-odds only (no z), so it has nothing to shift —
    the reference's occupancy-mode cells likewise have no clusters for
    offsetMap's loop to touch.
    """
    from slam_tpu.graph import pose_graph as pg

    kf_cloud = state.prev_scene
    if state.prev_ground is not None:
        # 6-DoF keyframes carry ground points like the reference's raw
        # voxelized keyframe clouds (graphSlamTools.cpp:279-286) — without
        # them 3D edge registration can't observe z (obstacle walls are
        # vertical). Obstacles first so compact() never truncates them.
        kf_cloud = PointCloud(
            xyz=jnp.concatenate([state.prev_scene.xyz,
                                 state.prev_ground.xyz]),
            valid=jnp.concatenate([state.prev_scene.valid,
                                   state.prev_ground.valid]),
            flags=jnp.concatenate([state.prev_scene.flags,
                                   state.prev_ground.flags]))
    graph, added = pg.add_keyframe(
        state.graph, state.pose, kf_cloud, cfg.icp, cfg.graph,
        min_points=cfg.graph.min_keyframe_points,
        attitude=state.attitude)

    def do_opt(g):
        if cfg.graph.engine == "se3":
            if cfg.graph.edge_registration == "3d":
                # full 6-DoF chain: 3D edge ICP measurements + LUM6
                # information consumed natively on the SE(3) manifold
                # (graphSlamTools.cpp:241-298 -> graph_slam.cpp:322-390)
                from slam_tpu.graph.pose_graph3d import optimize_native
                g, delta = optimize_native(g, cfg.graph)
            else:
                # the reference's literal g2o typing (VertexSE3/EdgeSE3,
                # graph_slam.cpp:43-49) over planar-ICP edges: lift with
                # the 6x6 LUM embedding and solve on the manifold
                from slam_tpu.graph.pose_graph3d import optimize_planar
                g, delta = optimize_planar(g, cfg.graph)
        else:
            g, delta = pg.optimize(g, cfg.graph)
        return g, delta

    graph, delta = jax.lax.cond(
        added & (graph.num_edges > 0), do_opt,
        lambda g: (g, jnp.zeros(4, state.pose.dtype)), graph)

    if cfg.graph.map_regen == "grid":
        # sort-free regeneration via the point-map scatter engine (the
        # config-4 throughput path; see pose_graph.regenerate_map_grid)
        def regen(g):
            return pg.regenerate_map_grid(
                g, state.map_cloud.capacity,
                resolution=cfg.icp.voxel_leaf_obs[0],
                grid_bins=cfg.graph.regen_grid_bins,
                ga_threshold=cfg.icp.ga_threshold,
                recall=cfg.cloud.export_recall)
    elif cfg.graph.map_regen == "mls":
        # reference dataflow: global MLS rebuild -> cluster means as the
        # registration target (graph_slam.cpp:260-280, mls.cpp:520-555);
        # the 2D path has no ground class, so the obstacle export is the
        # whole target
        def regen(g):
            obs, _gnd, _grid = pg.regenerate_map_mls(
                g, cfg.mls, state.map_cloud.capacity)
            return obs
    else:
        def regen(g):
            return pg.regenerate_map(g, state.map_cloud.capacity,
                                     cfg.icp.voxel_leaf_obs)

    map_cloud = jax.lax.cond(
        added, regen, lambda g: state.map_cloud, graph)

    from slam_tpu.utils import metrics
    metrics.emit("graph_update", added=added, num_nodes=graph.num_nodes,
                 num_edges=graph.num_edges,
                 graph_full=graph.num_nodes >= cfg.graph.max_nodes)
    ring = metrics.ring_write(state.metrics_ring, site="graph_update",
                              step=state.step,
                              graph_nodes=graph.num_nodes,
                              graph_edges=graph.num_edges)
    return state.replace(graph=graph, map_cloud=map_cloud,
                         graph_full=graph.num_nodes >= cfg.graph.max_nodes,
                         metrics_ring=ring), delta


@partial(jax.jit, static_argnames=("cfg", "num_macro", "graph_every"))
def rollout_with_graph(state: SlamState, world: World2D, cfg: SlamConfig,
                       num_macro: int, graph_every: int = 8):
    """Full-stack rollout (BASELINE config 4): `graph_every` fused scan ticks
    per graph-SLAM tick, mirroring the reference's 10 Hz graph loop under a
    faster scan/EKF loop."""

    def macro(s, _):
        # re-center the rolling occupancy once per macro (same hoist as
        # rollout: a dynamic roll per tick was ~15 ms/tick at batch 1024);
        # the point-map grid is not maintained in graph mode, so only the
        # local map needs the shift
        s = s.replace(local_map=shift_origin(s.local_map, s.pose[:2],
                                             cfg.mls))

        def tick(ss, _):
            ss = slam_step(ss, world, cfg, incremental_map=False,
                           shift_maps=False)
            return ss, (ss.pose[:3], ss.true_pose[:3])
        s, traj = jax.lax.scan(tick, s, None, length=graph_every)
        s = graph_update(s, cfg)
        return s, traj

    final, traj = jax.lax.scan(macro, state, None, length=num_macro)
    est, true = traj
    return final, (est.reshape(-1, 3), true.reshape(-1, 3))


def ate(est: jnp.ndarray, true: jnp.ndarray) -> jnp.ndarray:
    """Absolute trajectory error (RMSE of xy) — BASELINE.md accuracy metric."""
    d = est[..., :2] - true[..., :2]
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=-1)))


def ate_aligned(est: jnp.ndarray, true: jnp.ndarray) -> jnp.ndarray:
    """ATE after SE(2) trajectory alignment (Horn/Umeyama closed form, no
    scale) — the standard ATE definition (Sturm et al., TUM benchmark).

    SLAM defines its world frame by the start pose; any error frozen into
    the early map anchor appears as a STATIC rigid offset of the whole
    trajectory that raw RMSE charges at every step. Measured at the
    reference working point: raw 6.03 cm of which 5+ cm is exactly such an
    offset (the reference EKF's one-tick predict-correct yaw lag baked into
    the first scans' map — docs/PERF.md round-4 note); aligned ATE is
    0.96 cm. Both are reported; raw stays the conservative headline.
    """
    a = est[..., :2].reshape(-1, 2)
    b = true[..., :2].reshape(-1, 2)
    ma, mb = a.mean(0), b.mean(0)
    H = (a - ma).T @ (b - mb)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    R = Vt.T @ jnp.diag(jnp.stack([jnp.float32(1.0), d])) @ U.T
    al = (a - ma) @ R.T + mb
    e = al - b
    return jnp.sqrt(jnp.mean(jnp.sum(e * e, axis=-1)))
