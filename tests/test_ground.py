"""GP-INSAC ground segmentation vs a NumPy oracle transcribing the reference's
sequential algorithm (groundSegmentation.cpp:110-468)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slam_tpu.config import GroundSegConfig
from slam_tpu.ops.ground import segment_ground, split_ground_obstacle
from slam_tpu.types import PointCloud, cloud_from_xyz


def make_scene(seed=0, n=4000):
    """Velodyne-ish samples: gently sloped ground + boxes + an overhang."""
    rng = np.random.default_rng(seed)
    r = rng.uniform(2, 60, n)
    a = rng.uniform(0, 2 * np.pi, n)
    x, y = r * np.cos(a), r * np.sin(a)
    gz = 0.02 * x + 0.5 * np.sin(0.05 * y) - 1.45  # sensor 1.45 m above ground
    z = gz + rng.normal(0, 0.03, n)
    label = np.zeros(n, np.int32)  # 0 ground
    # boxes: obstacles 1-2 m tall
    for cx, cy in [(10, 5), (-15, -8), (5, -20), (-25, 18)]:
        m = (np.abs(x - cx) < 2.0) & (np.abs(y - cy) < 2.0)
        z[m] = gz[m] + rng.uniform(0.35, 2.0, m.sum())
        label[m] = 1
    # overhang: 3 m above ground (drivable-over)
    m = (np.abs(x - 20) < 3) & (np.abs(y + 2) < 3)
    z[m] = gz[m] + 3.0
    label[m] = 2
    return np.stack([x, y, z], -1).astype(np.float32), label


def oracle_insac(xyz, cfg: GroundSegConfig):
    """Sequential transcription of sectorINSAC for ground/obstacle labels.

    Returns per-point: 0 ground, 1 obstacle, 2 drivable-over, -1 dropped.
    """
    S, L = cfg.num_sectors, cfg.num_range_bins
    n = len(xyz)
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    r3 = np.sqrt(x * x + y * y + z * z)
    r2 = np.sqrt(x * x + y * y)
    phi = np.degrees(np.arctan2(y, x))
    phi[phi < 0] += 360
    sec = np.clip((phi / (360.0 / S)).astype(int), 0, S - 1)
    lb = (r2 / (cfg.r_max / L)).astype(int)
    ok = (r3 < cfg.r_max) & (lb < L)
    out = np.full(n, -1, np.int32)

    for s in range(S):
        bins = {}
        for i in np.where(ok & (sec == s))[0]:
            bins.setdefault(lb[i], []).append(i)
        sig = []
        for b, idxs in bins.items():
            if len(idxs) <= cfg.min_bin_points:
                continue
            i0 = idxs[int(np.argmin(z[idxs]))]
            sig.append([r2[i0], z[i0], b])
        if not sig:
            continue
        sig.sort(key=lambda t: t[1])
        sig = sig[: cfg.signal_capacity]
        npt = min(cfg.num_seed_points, len(sig))
        model, rest = [], []
        cnt = 0
        for sp in sig:
            if cnt < npt and sp[0] < cfg.seed_max_range and \
                    abs(sp[1]) < cfg.seed_max_height:
                model.append(sp); cnt += 1
            else:
                rest.append(sp)
        sufficient = len(model) >= 2
        f_s = np.zeros(len(rest))
        if sufficient and rest:
            def K(a, b):
                d = np.subtract.outer([p[0] for p in a], [p[0] for p in b])
                return cfg.gp_signal_var * np.exp(
                    -d * d / (2 * cfg.gp_length_scale**2))
            while True:
                Cxx = K(model, model) + cfg.gp_noise * np.eye(len(model))
                Csx = K(rest, model)
                Css = K(rest, rest)
                T = Csx @ np.linalg.inv(Cxx)
                f_s = T @ np.array([p[1] for p in model])
                V = Css - T @ Csx.T
                adopted = False
                k = 0
                while k < len(rest):
                    vf = V[k, k]
                    met = (rest[k][1] - f_s[k]) / np.sqrt(cfg.gp_noise + vf**2)
                    if vf < cfg.gp_model_confidence and \
                            abs(met) < cfg.gp_data_confidence:
                        model.append(rest.pop(k))
                        f_s = np.delete(f_s, k)
                        V = np.delete(np.delete(V, k, 0), k, 1)
                        adopted = True
                    else:
                        k += 1
                if not adopted or not rest:
                    break
        for sp in model:
            for i in bins[sp[2]]:
                h = abs(sp[1] - z[i])
                if h < cfg.ground_threshold:
                    out[i] = 0
                elif h > cfg.robot_height:
                    out[i] = 2
                else:
                    out[i] = 1
        if sufficient:
            for k, sp in enumerate(rest):
                for i in bins[sp[2]]:
                    h = abs(z[i] - f_s[k])
                    out[i] = 2 if h > cfg.robot_height else 1
    return out


@pytest.fixture
def cfg():
    return GroundSegConfig(num_sectors=24, num_range_bins=64,
                           signal_capacity=32, max_insac_sweeps=12)


def test_matches_sequential_oracle(cfg):
    xyz, _ = make_scene()
    res = segment_ground(cloud_from_xyz(jnp.array(xyz)), cfg)
    oracle = oracle_insac(xyz, cfg)

    got = np.full(len(xyz), -1, np.int32)
    v = np.asarray(res.cloud.valid)
    fl = np.asarray(res.cloud.flags)
    got[v & ((fl & PointCloud.FLAG_GROUND) != 0)] = 0
    got[v & ((fl & PointCloud.FLAG_GROUND) == 0) &
        ((fl & PointCloud.FLAG_DRIVABLE) == 0)] = 1
    got[v & ((fl & PointCloud.FLAG_DRIVABLE) != 0)] = 2

    agree = (got == oracle).mean()
    assert agree > 0.97, f"only {agree:.3f} agreement with oracle"


def test_detects_obstacles_and_ground(cfg):
    xyz, label = make_scene(seed=1)
    res = segment_ground(cloud_from_xyz(jnp.array(xyz)), cfg)
    obstacle, ground, non_drv = split_ground_obstacle(res.cloud)
    obstacle, ground = np.asarray(obstacle), np.asarray(ground)
    cls = obstacle | ground
    # among classified points, ground/obstacle recall should be high
    g = ground[cls & (label == 0)].size and \
        (ground & cls & (label == 0)).sum() / (cls & (label == 0)).sum()
    o = (obstacle & cls & (label == 1)).sum() / max((cls & (label == 1)).sum(), 1)
    assert g > 0.9, f"ground recall {g}"
    assert o > 0.9, f"obstacle recall {o}"
    # overhang points are drivable-over -> excluded from non_drv
    non_drv = np.asarray(non_drv)
    ov = (non_drv & cls & (label == 2)).sum() / max((cls & (label == 2)).sum(), 1)
    assert ov < 0.1, f"overhang wrongly non-drivable: {ov}"


def test_empty_and_tiny_clouds(cfg):
    empty = cloud_from_xyz(jnp.zeros((64, 3)), valid=jnp.zeros(64, bool))
    res = segment_ground(empty, cfg)
    assert not bool(res.cloud.valid.any())
    tiny = cloud_from_xyz(jnp.array([[1.0, 0, -1.4]] * 3))
    res = segment_ground(tiny, cfg)  # <=5 pts per bin -> dropped, no crash
    assert not bool(res.cloud.valid.any())
