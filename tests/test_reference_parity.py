"""Full-loop parity: our fused TPU pipeline vs a sequential NumPy transcription
of the reference algorithms, fed IDENTICAL sensor frames.

This is the BASELINE.md accuracy criterion ("trajectory ATE <= 1 cm vs the C
reference") made testable: the oracle runs the reference pipeline exactly as
SURVEY.md §3.1-3.2 describes — voxelized scene + ground-adjacency classify
(classifyPoints), class-constrained ICP with exact first-hit NN and SVD
Kabsch (icpPointToPoint.cpp), the 8-state EKF (nasa_ekf.cpp) — in float64,
while our pipeline runs the batched f32 XLA path. Trajectories must agree to
centimeter level.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import sim2d_config
from slam_tpu.models import ekf as ekf_mod
from slam_tpu.pipeline import slam2d
from slam_tpu.sim import world2d

RES = 0.5
GA_THRESH = 2


def _render_frames(cfg, world, n, seed=0):
    def body(pose, step):
        cmd = world2d.drive_cmd(step, cfg.sim.dt)
        pose = world2d.unicycle_step(pose, cmd, cfg.sim.dt)
        r, h = world2d.raycast(world, pose, cfg.sim)
        return pose, (r, h, cmd, pose)
    _, (rs, hs, cmds, poses) = jax.lax.scan(body, jnp.zeros(3), jnp.arange(n))
    rng = np.random.default_rng(seed)
    ranges = np.asarray(rs) + rng.normal(0, cfg.sim.range_noise,
                                         np.asarray(rs).shape)
    return (ranges.astype(np.float32), np.asarray(hs), np.asarray(cmds),
            np.asarray(poses))


# ---------------- NumPy oracle (reference transcription, float64) ----------


def oracle_scene(scan_xy, hit):
    """Voxel centroid + GA classify (setSceneCloud/classifyPoints)."""
    cells = {}
    for p, ok in zip(scan_xy, hit):
        if not ok:
            continue
        key = (int(np.floor(p[0] / RES)), int(np.floor(p[1] / RES)))
        c = cells.setdefault(key, [0, 0.0, 0.0])
        c[0] += 1
        c[1] += p[0]
        c[2] += p[1]
    occupied = set(cells)
    pts, ga = [], []
    for (i, j), (n, sx, sy) in cells.items():
        empty = sum((i + di, j + dj) not in occupied
                    for di in (-1, 0, 1) for dj in (-1, 0, 1)
                    if (di, dj) != (0, 0))
        pts.append([sx / n, sy / n])
        ga.append(empty >= GA_THRESH)
    return np.array(pts), np.array(ga)


def oracle_icp(scene, sga, model, mga, init, max_iter=20, inlier=1.0,
               min_delta=1e-6):
    """Class-constrained ICP, exact NN, SVD Kabsch (icpPointToPoint.cpp)."""
    th, t = init[2], init[:2].copy()
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    n_ga = int(mga.sum())
    n_nga = int((~mga).sum())
    for _ in range(max_iter):
        q = scene @ R.T + t
        pm, pt = [], []
        for k, qq in enumerate(q):
            use_ga = sga[k]
            if (use_ga and n_ga <= 3) or (not use_ga and n_nga <= 3):
                continue
            cand = model[mga] if use_ga else model[~mga]
            d2 = np.sum((cand - qq) ** 2, axis=1)
            j = np.argmin(d2)
            if d2[j] < inlier:
                pm.append(cand[j])
                pt.append(qq)
        if not pm:
            break
        pm, pt = np.array(pm), np.array(pt)
        mu_m, mu_t = pm.mean(0), pt.mean(0)
        H = (pt - mu_t).T @ (pm - mu_m)
        U, _, Vt = np.linalg.svd(H)
        R_ = Vt.T @ U.T
        t_ = mu_m - R_ @ mu_t
        R = R_ @ R
        t = R_ @ t + t_
        d = max(np.linalg.norm(R_ - np.eye(2)), np.linalg.norm(t_))
        if d < min_delta:
            break
    return np.array([t[0], t[1], np.arctan2(R[1, 0], R[0, 0])])


class OracleEkf:
    def __init__(self, cfg, bias):
        self.mu = np.zeros(8)
        self.sig = np.eye(8) * cfg.init_sigma
        self.cfg = cfg
        self.bias = bias

    def motion(self, cmd, dt):
        from tests.test_ekf import oracle_motion
        self.mu, self.sig = oracle_motion(self.mu, self.sig, cmd, dt, self.cfg)

    def gyro(self, gz):
        from tests.test_ekf import oracle_yaw_update
        self.mu, self.sig = oracle_yaw_update(self.mu, self.sig,
                                              gz - self.bias, self.cfg)

    def slam(self, meas):
        from tests.test_ekf import oracle_slam_update
        self.mu, self.sig = oracle_slam_update(self.mu, self.sig, meas,
                                               self.cfg)


def oracle_slam(cfg, frames):
    ranges, hits, cmds, _ = frames
    B = cfg.sim.num_beams
    ang0 = np.arange(B) * (2 * np.pi / B)
    ekf = OracleEkf(cfg.ekf, cfg.sim.gyro_bias)
    map_cells = {}
    traj = []
    for t in range(len(ranges)):
        cmd = np.clip(cmds[t], [-3, -3, -0.75], [3, 3, 0.75])
        ekf.motion(cmd, cfg.sim.dt)
        ekf.gyro(cmd[2] + cfg.sim.gyro_bias)
        pred = np.array([ekf.mu[0], ekf.mu[1], ekf.mu[6]])

        r = np.where(hits[t], ranges[t], cfg.sim.beam_max_range)
        scan = np.stack([r * np.cos(ang0), r * np.sin(ang0)], -1)
        scene, sga = oracle_scene(scan, hits[t])

        if map_cells:
            model, mcnt = [], []
            for (i, j), (n, sx, sy) in map_cells.items():
                model.append([sx / n, sy / n, i, j])
            model = np.array(model)
            occ = set(map_cells)
            mga = np.array([
                sum((i + di, j + dj) not in occ
                    for di in (-1, 0, 1) for dj in (-1, 0, 1)
                    if (di, dj) != (0, 0)) >= GA_THRESH
                for (_, _, i, j) in model.tolist()])
            pose = oracle_icp(scene, sga, model[:, :2], mga, pred)
            ekf.slam(pose)
        else:
            pose = pred
        fused = np.array([ekf.mu[0], ekf.mu[1], ekf.mu[6]])

        # fold the registered scene into the map (running cell centroids)
        c, s = np.cos(pose[2]), np.sin(pose[2])
        Rw = np.array([[c, -s], [s, c]])
        world = scene @ Rw.T + pose[:2]
        for p in world:
            key = (int(np.floor(p[0] / RES)), int(np.floor(p[1] / RES)))
            cell = map_cells.setdefault(key, [0, 0.0, 0.0])
            cell[0] += 1
            cell[1] += p[0]
            cell[2] += p[1]
        traj.append(fused)
    return np.array(traj)


def ours_slam(cfg, frames):
    ranges, hits, cmds, _ = frames
    st = slam2d.init_state(jax.random.PRNGKey(0), cfg, calibrate_gyro=False)
    st = st.replace(ekf=st.ekf.replace(
        gyro_bias=jnp.float32(cfg.sim.gyro_bias)))
    step = jax.jit(lambda s, sc, h, g, c: slam2d.slam_step_io(
        s, sc, h, g, c, cfg))
    B = cfg.sim.num_beams
    ang0 = np.arange(B) * (2 * np.pi / B)
    traj = []
    for t in range(len(ranges)):
        r = np.where(hits[t], ranges[t], cfg.sim.beam_max_range)
        scan = np.stack([r * np.cos(ang0), r * np.sin(ang0),
                         np.zeros_like(r)], -1).astype(np.float32)
        st = step(st, jnp.array(scan), jnp.array(hits[t]),
                  jnp.float32(cmds[t][2] + cfg.sim.gyro_bias),
                  jnp.array(cmds[t]))
        traj.append(np.asarray(st.pose[:3]))
    return np.array(traj)


def parity_cfg():
    """The parity configuration — shared with bench.py's on-chip parity
    measurement (bench_parity_onchip), so the test and the driver artifact
    measure the identical setup.

    beam range kept inside the scene/map grid extent (+-48 m): beams beyond
    it are masked by our fixed grids but kept by the unbounded oracle.

    export_recall=1.0 (exact top_k map export): the round-2 "2.2 cm TPU
    gap" was ISOLATED in round 3 to approx_max_k's recall-0.8 export drops
    randomizing the ICP target per refresh — NOT fp correspondence flips
    (an oracle ensemble under 1e-6 input jitter self-diffuses ~0, and a
    CPU emulation of the approximate export reproduces 2.18 cm vs the
    TPU's measured 2.17 cm, while exact export measures 0.36 cm). With
    the exact export this parity test holds the centimeter bound on both
    backends; the throughput default stays recall 0.8 (docs/PERF.md)."""
    c = sim2d_config()
    return dataclasses.replace(
        c,
        icp=dataclasses.replace(c.icp, matcher="points"),
        cloud=dataclasses.replace(c.cloud, export_recall=1.0),
        sim=dataclasses.replace(c.sim, gyro_noise=0.0, range_noise=0.005,
                                beam_max_range=45.0),
    )


def test_pipeline_matches_reference_oracle():
    cfg = parity_cfg()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    frames = _render_frames(cfg, world, 40)
    from tests.golden_cache import cached_oracle
    ref = cached_oracle("parity2d", oracle_slam, (cfg,), frames,
                        lambda: oracle_slam(cfg, frames))
    got = ours_slam(cfg, frames)
    err = np.linalg.norm(got[:, :2] - ref[:, :2], axis=1)
    ate = float(np.sqrt(np.mean(err[5:] ** 2)))
    # BASELINE.md's <=1 cm bound holds on BOTH backends with the exact
    # export: CPU measures 0.36 cm; the real chip measures 0.072 cm
    # (bench_parity_onchip, identical setup, measured 2026-08-19 — the
    # round-2 "TPU gap" was entirely the approx_max_k export drops, and
    # with recall 1.0 nothing TPU-specific remains above noise)
    limit = 0.01
    assert ate <= limit, f"ATE vs reference oracle {ate*100:.2f} cm"
    dyaw = np.abs(np.arctan2(np.sin(got[:, 2] - ref[:, 2]),
                             np.cos(got[:, 2] - ref[:, 2])))
    # yaw gets its OWN bound (ADVICE r2): measured max yaw dev is 0.0017 rad
    # (CPU, exact export) / 0.0013 rad (TPU) — the old translation-limit
    # reuse was a unit-mixing loosening
    assert dyaw[5:].max() < 0.01, f"yaw dev {dyaw[5:].max()}"


def test_approx_export_explains_tpu_gap():
    """Mechanism regression for the round-3 parity finding: emulating the
    TPU's approximate top-k export on CPU (per-bin maxima at the recall-0.8
    bin budget) must reproduce a centimeter-scale ATE gap vs the oracle,
    while the exact export stays well under 1 cm. Guards against silently
    re-attributing the gap to fp noise."""
    from unittest import mock

    c = sim2d_config()
    cfg = dataclasses.replace(
        c,
        icp=dataclasses.replace(c.icp, matcher="points"),
        sim=dataclasses.replace(c.sim, gyro_noise=0.0, range_noise=0.005,
                                beam_max_range=45.0),
    )
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    frames = _render_frames(cfg, world, 30)
    from tests.golden_cache import cached_oracle
    ref = cached_oracle("parity2d", oracle_slam, (cfg,), frames,
                        lambda: oracle_slam(cfg, frames))

    def approx_emul(x, k, recall_target=0.95, **kw):
        import jax.numpy as jnp
        n = x.shape[-1]
        nb = int(np.ceil(k / 0.8))
        pad = (-n) % nb
        xp = jnp.pad(x, (0, pad), constant_values=-jnp.inf)
        xb = xp.reshape(nb, -1)
        bmax = jnp.max(xb, axis=1)
        barg = jnp.argmax(xb, axis=1) + jnp.arange(nb) * xb.shape[1]
        v, i = jax.lax.top_k(bmax, k)
        return v, barg[i]

    cfg_exact = dataclasses.replace(
        cfg, cloud=dataclasses.replace(cfg.cloud, export_recall=1.0))
    got_exact = ours_slam(cfg_exact, frames)
    with mock.patch.object(jax.lax, "approx_max_k", approx_emul):
        jax.clear_caches()
        got_approx = ours_slam(cfg, frames)
    jax.clear_caches()

    def ate(got):
        err = np.linalg.norm(got[:, :2] - ref[:, :2], axis=1)
        return float(np.sqrt(np.mean(err[5:] ** 2)))

    a_exact, a_approx = ate(got_exact), ate(got_approx)
    assert a_exact < 0.01, f"exact-export ATE {a_exact*100:.2f} cm"
    assert a_approx > 2.0 * a_exact, (
        f"approx-export emulation no longer dominates: {a_approx*100:.2f} "
        f"vs {a_exact*100:.2f} cm — the parity story may have changed")
