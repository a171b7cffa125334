"""3D (Velodyne) full-loop parity: the fused TPU pipeline vs a sequential
float64 NumPy transcription of the reference chain, fed IDENTICAL sensor
frames (VERDICT r1 item 9).

Oracle chain per frame — the reference call stack of SURVEY.md §3.1:
  IMU tilt compensation (pointcloud_filter.cpp:103-148, as the physical
  inverse R(roll, pitch, 0) of the simulated tilt) -> GP-INSAC ground
  segmentation (sequential sectorINSAC oracle from test_ground) ->
  ground-adjacency classification (icpTools.cpp:36-103 bin rule) -> voxel
  centroids (icpTools.cpp:620-633) -> class-constrained ICP with exact NN +
  SVD Kabsch (icpPointToPoint.cpp) -> 8-state EKF (nasa_ekf.cpp) ->
  wheel-contact height interpolation (icpTools.cpp:301-419) -> obstacle /
  ground centroid maps.

Asserted: planar ATE <= 1 cm, |z error| <= 1.5 cm, yaw <= 0.005 rad after
warmup. Round-4 measurement: planar <5 um(!), z max 0.584 cm, yaw ~0 — at
BOTH export recalls (0.8/1.0): registration engages from frame 1 (verified
explicitly) and the batched f32 chain lands on the oracle's fixed points
almost exactly on this fixture, so the old 3 cm bounds were pure slack
(VERDICT r3 item 9). The bounds keep margin for backend/fusion variation
while enforcing the BASELINE-grade centimeter criterion.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import sim3d_config
from slam_tpu.pipeline import slam3d
from slam_tpu.sim import world2d, world3d
from tests.test_ground import oracle_insac
from tests.test_reference_parity import OracleEkf, oracle_icp

RES = 0.5


def _cfg():
    c = sim3d_config()
    return dataclasses.replace(
        c,
        sim=dataclasses.replace(c.sim, gyro_noise=0.0, range_noise=0.005),
    )


def _render_frames(cfg, world, n):
    """Identical sensor frames for both sides: tilted-sensor-frame scans,
    hit masks, true attitude (noise-free IMU), gyro, clamped commands."""
    def body(carry, step):
        pose, key = carry
        key, k_noise = jax.random.split(key)
        cmd = world2d.drive_cmd(step, cfg.sim.dt)
        cmd = jnp.clip(cmd, jnp.array([-3.0, -3.0, -0.75]),
                       jnp.array([3.0, 3.0, 0.75]))
        pose = world2d.unicycle_step(pose, cmd, cfg.sim.dt)
        roll, pitch = world3d.terrain_attitude(world, pose[:2])
        scan, hit = world3d.raycast(world, pose, cfg.sim, noise_key=k_noise,
                                    roll=roll, pitch=pitch)
        return (pose, key), (scan, hit, roll, pitch, cmd, pose)

    (_, _), out = jax.lax.scan(body, (jnp.zeros(3), jax.random.PRNGKey(7)),
                               jnp.arange(n))
    return [np.asarray(o) for o in out]


# ---------------- float64 oracle ----------------


def _rot3(roll, pitch, yaw=0.0):
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    return np.array([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr]])


def _voxelize(pts, flags, leaf):
    """Centroid per voxel; flags OR (icpTools.cpp:620-633 + our pairwise
    semantics)."""
    cells = {}
    for p, f in zip(pts, flags):
        key = tuple(int(np.floor(p[i] / leaf[i])) for i in range(3))
        c = cells.setdefault(key, [0, np.zeros(3), False])
        c[0] += 1
        c[1] = c[1] + p
        c[2] = c[2] or f
    out = np.array([c[1] / c[0] for c in cells.values()])
    ga = np.array([c[2] for c in cells.values()])
    return out.reshape(-1, 3), ga


def _ga_classify(pts, res=RES, thresh=2):
    """Per-point ground adjacency: >= thresh empty 8-neighbor bins
    (icpTools.cpp:36-103; robot-centered bins like ops/classify.py)."""
    bins = {}
    for p in pts:
        bins.setdefault((int(np.floor(p[0] / res)),
                         int(np.floor(p[1] / res))), 0)
    occ = set(bins)
    out = []
    for p in pts:
        i, j = int(np.floor(p[0] / res)), int(np.floor(p[1] / res))
        empty = sum((i + di, j + dj) not in occ
                    for di in (-1, 0, 1) for dj in (-1, 0, 1)
                    if (di, dj) != (0, 0))
        out.append(empty >= thresh)
    return np.array(out)


def _cells_ga(cells):
    """GA flags for map cells from the occupancy stencil
    (export_points/classifyPoints rule)."""
    occ = set(cells)
    ga = {}
    for (i, j) in cells:
        empty = sum((i + di, j + dj) not in occ
                    for di in (-1, 0, 1) for dj in (-1, 0, 1)
                    if (di, dj) != (0, 0))
        ga[(i, j)] = empty >= 2
    return ga


def _oracle_height(ground_pts, pose4, hcfg):
    """doHeightInterpolate (icpTools.cpp:301-419) in f64."""
    x, y, yaw, z0 = pose4
    wl = np.array([[-hcfg.x_wheel_dist, -hcfg.y_wheel_dist],
                   [-hcfg.x_wheel_dist, hcfg.y_wheel_dist],
                   [hcfg.x_wheel_dist, -hcfg.y_wheel_dist],
                   [hcfg.x_wheel_dist, hcfg.y_wheel_dist]])
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s], [s, c]])
    wxy = wl @ R.T + np.array([x, y])
    wheels = np.concatenate([wxy, np.full((4, 1), z0 - hcfg.robot_height)], 1)
    if len(ground_pts) == 0:
        return z0
    corr = []
    for wp in wheels:
        d2 = np.sum((ground_pts - wp) ** 2, axis=1)
        j = np.argmin(d2)
        if d2[j] < hcfg.max_nn_dist_sq:
            corr.append(ground_pts[j])
    if len(corr) < hcfg.min_corr_points:
        return z0
    corr = np.array(corr)
    avg = corr.mean(0)
    d = corr - avg
    S = d.T @ d
    vals, vecs = np.linalg.eigh(S)
    n = vecs[:, 0]
    if vals[1] < 1e-6:       # degenerate: vertical fallback (ops/height.py)
        n = np.array([0.0, 0.0, 1.0])
    if n[2] < 0:
        n = -n
    return n[2] * hcfg.robot_height + avg[2]


def oracle_slam3d(cfg, world, frames, z0):
    scans, hits, rolls, pitches, cmds, _ = frames
    ekf = OracleEkf(cfg.ekf, cfg.sim.gyro_bias)
    obs_map = {}    # (i, j) -> [n, sum_xyz]
    gnd_map = {}
    z = float(z0)
    traj = []
    leaf_obs = cfg.icp.voxel_leaf_obs
    for t in range(len(scans)):
        ekf.motion(cmds[t], cfg.sim.dt)
        ekf.gyro(cmds[t][2] + cfg.sim.gyro_bias)
        pred = np.array([ekf.mu[0], ekf.mu[1], ekf.mu[6]])

        scan = np.asarray(scans[t], np.float64) @ _rot3(
            rolls[t], pitches[t]).T
        # segmentation sees only hit points (ours masks via cloud.valid)
        sub = scan[hits[t]]
        labels = oracle_insac(sub.astype(np.float32), cfg.ground)
        obs_pts = sub[(labels >= 0) & (labels != 0)]
        gnd_pts = sub[labels == 0]
        ga = _ga_classify(obs_pts) if len(obs_pts) else np.zeros(0, bool)
        obs_vox, obs_ga = (_voxelize(obs_pts, ga, leaf_obs)
                           if len(obs_pts) else (np.zeros((0, 3)),
                                                 np.zeros(0, bool)))

        # scan-to-map registration (2D, class-constrained)
        if obs_map:
            keys = list(obs_map)
            model = np.array([obs_map[k][1][:2] / obs_map[k][0]
                              for k in keys])
            crop = np.all(np.abs(model - pred[:2]) <= cfg.icp.crop_dist, 1)
            mga_all = _cells_ga(obs_map)
            model = model[crop]
            mga = np.array([mga_all[k] for k in keys])[crop]
            if len(obs_vox) >= cfg.icp.min_scene_points and len(model) >= 5:
                pose = oracle_icp(obs_vox[:, :2], obs_ga, model, mga, pred,
                                  inlier=cfg.icp.inlier_dist)
                ekf.slam(pose)
                icp_ok = True
            else:
                pose, icp_ok = pred, False
        else:
            pose, icp_ok = pred, False
        fused = np.array([ekf.mu[0], ekf.mu[1], ekf.mu[6]])
        map_pose = pose if icp_ok else pred

        # height interpolation vs the PREVIOUS ground map (bootstrap: the
        # current scan's ground points placed at the map pose, carrying the
        # PRE-update z — process_frame_3d builds gnd_world before the new z
        # exists and folds that same cloud into the ground map)
        z_prev = z
        gnd_cloud = np.array([gnd_map[k][1] / gnd_map[k][0]
                              for k in gnd_map]) if gnd_map else np.zeros((0, 3))
        c, s = np.cos(map_pose[2]), np.sin(map_pose[2])
        Rw = np.array([[c, -s], [s, c]])
        gnd_world = np.concatenate(
            [gnd_pts[:, :2] @ Rw.T + map_pose[:2],
             gnd_pts[:, 2:] + z_prev], axis=1) \
            if len(gnd_pts) else np.zeros((0, 3))
        pose4_pre = np.array([fused[0], fused[1], fused[2], z_prev])
        if len(gnd_cloud) >= cfg.height.min_corr_points:
            z = _oracle_height(gnd_cloud, pose4_pre, cfg.height)
        else:
            z = _oracle_height(gnd_world, pose4_pre, cfg.height)

        # fold into the maps (cell centroid stores): obstacles carry the NEW
        # z, the ground cloud was built with the old one (see above)
        obs_world = np.concatenate(
            [obs_vox[:, :2] @ Rw.T + map_pose[:2], obs_vox[:, 2:] + z],
            axis=1) if len(obs_vox) else np.zeros((0, 3))
        for p in obs_world:
            k = (int(np.floor(p[0] / RES)), int(np.floor(p[1] / RES)))
            cc = obs_map.setdefault(k, [0, np.zeros(3)])
            cc[0] += 1
            cc[1] = cc[1] + p
        for p in gnd_world:
            k = (int(np.floor(p[0] / RES)), int(np.floor(p[1] / RES)))
            cc = gnd_map.setdefault(k, [0, np.zeros(3)])
            cc[0] += 1
            cc[1] = cc[1] + p
        traj.append([fused[0], fused[1], fused[2], z])
    return np.array(traj)


def ours_slam3d(cfg, world, frames):
    scans, hits, rolls, pitches, cmds, _ = frames
    st = slam3d.init_state_3d(jax.random.PRNGKey(0), cfg, world)
    st = st.replace(ekf=st.ekf.replace(
        gyro_bias=jnp.float32(cfg.sim.gyro_bias)))
    gm = slam3d.init_ground_map(cfg)
    step = jax.jit(lambda s, g, sc, h, r, p, gy, c: slam3d.slam_step_3d_io(
        s, g, sc, h, r, p, gy, c, cfg))
    traj = []
    for t in range(len(scans)):
        st, gm = step(st, gm, jnp.array(scans[t]), jnp.array(hits[t]),
                      jnp.float32(rolls[t]), jnp.float32(pitches[t]),
                      jnp.float32(cmds[t][2] + cfg.sim.gyro_bias),
                      jnp.array(cmds[t]))
        pose = np.asarray(st.pose)
        traj.append([pose[0], pose[1], pose[2], pose[3]])
    return np.array(traj)


def test_3d_pipeline_matches_reference_oracle():
    cfg = _cfg()
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
    frames = _render_frames(cfg, world, 30)
    z0 = world3d.terrain_height(world, jnp.zeros(2)) + cfg.sim.sensor_height

    from tests.golden_cache import cached_oracle
    ref = cached_oracle("parity3d", oracle_slam3d, (cfg, float(z0)),
                        (world, frames),
                        lambda: oracle_slam3d(cfg, world, frames, float(z0)))
    got = ours_slam3d(cfg, world, frames)

    warm = 5
    err = np.linalg.norm(got[warm:, :2] - ref[warm:, :2], axis=1)
    ate = float(np.sqrt(np.mean(err ** 2)))
    assert ate <= 0.01, f"3D planar ATE vs oracle {ate*100:.2f} cm"
    dyaw = np.abs(np.arctan2(np.sin(got[warm:, 2] - ref[warm:, 2]),
                             np.cos(got[warm:, 2] - ref[warm:, 2])))
    assert dyaw.max() <= 0.005, f"yaw dev {dyaw.max():.4f}"
    dz = np.abs(got[warm:, 3] - ref[warm:, 3])
    assert dz.max() <= 0.015, f"z dev {dz.max()*100:.2f} cm"
