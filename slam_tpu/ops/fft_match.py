"""Correlative global matching / relocalization — TPU-native replacement for
global_matching/src/global_match.cpp.

The reference relocalizes with up to 20 random-restart GICP attempts, guesses
uniform over +-10 m x 360 deg (global_match.cpp:105-138), accepting fitness/N
< 0.002. On TPU we search *exhaustively*: rasterize the scene at K rotation
slices and cross-correlate against the map raster via batched 2D FFTs — every
translation at every rotation is scored in O(K G^2 log G), a strictly stronger
search than 20 random seeds, and it vmaps over robots. The best cell is then
polished with the class-constrained ICP (the reference refines with GICP,
global_match.cpp:151-172).

Acceptance: normalized correlation — the matched fraction of OCCUPIED SCENE
RASTER CELLS, in [0, 1] (1.0 = every rasterized scene cell lands on dilated
map mass). NOTE the scale is unrelated to the reference's acceptance: its
fitness/N < 0.002 is an ERROR metric (small = good, global_match.cpp:151);
ours is a match fraction (large = good) — GlobalMatchConfig.accept_score
defaults to 0.35 accordingly and must NOT be set to the reference's 0.002
(which would accept nearly anything).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tpu.config import GlobalMatchConfig, IcpConfig
from slam_tpu.geometry import rot2
from slam_tpu.ops.icp import icp_fit
from slam_tpu.types import PointCloud


class MatchResult(NamedTuple):
    pose: jnp.ndarray    # (3,) scene->map x, y, yaw (wrapped to [-pi, pi])
    score: jnp.ndarray   # () matched fraction of occupied scene cells [0, 1]
    ok: jnp.ndarray      # () accepted?


def rasterize(xy: jnp.ndarray, valid: jnp.ndarray, center: jnp.ndarray,
              cfg: GlobalMatchConfig) -> jnp.ndarray:
    """Binary occupancy raster (G, G) of points around `center`."""
    G = cfg.grid_size
    q = jnp.floor((xy - center) / cfg.grid_resolution).astype(jnp.int32) + G // 2
    inb = valid & jnp.all((q >= 0) & (q < G), axis=-1)
    flat = jnp.where(inb, q[..., 0] * G + q[..., 1], G * G)
    img = jnp.zeros((G * G + 1,), jnp.float32).at[flat].max(
        jnp.where(inb, 1.0, 0.0))
    return img[: G * G].reshape(G, G)


def dilate(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Iterated 3x3 max-pool — the likelihood-field smoothing of correlative
    scan matching (tolerates rotation-slice discretization at long range)."""
    for _ in range(radius):
        p = jnp.pad(img, 1)
        img = jnp.max(jnp.stack([
            p[i:i + img.shape[0], j:j + img.shape[1]]
            for i in range(3) for j in range(3)]), axis=0)
    return img


def fft_correlate(map_img: jnp.ndarray, scene_imgs: jnp.ndarray,
                  map_spectrum: jnp.ndarray | None = None) -> jnp.ndarray:
    """Linear cross-correlation scores (K, 2G, 2G) of each rotated scene
    raster against the map raster, via zero-padded rFFT.

    Zero-padding to 2G makes the correlation linear, not circular: scene mass
    near the raster edge cannot wrap around and spuriously match map mass on
    the opposite side (the aliasing regime a kidnapped robot far from its
    prior lives in). Lag (i, j) of the output decodes to the signed shift
    (i if i < G else i - 2G, j if j < G else j - 2G); lags with |shift| >= G
    have zero support overlap and score exactly 0.

    map_spectrum: optional precomputed rfft2(map_img, s=(2G, 2G)) so callers
    scoring many rotation chunks against one map pay the map FFT once.
    """
    G = map_img.shape[-1]
    pad = (2 * G, 2 * G)
    F_map = jnp.fft.rfft2(map_img, s=pad) if map_spectrum is None \
        else map_spectrum
    F_scn = jnp.fft.rfft2(scene_imgs, s=pad)
    return jnp.fft.irfft2(F_map[None] * jnp.conj(F_scn), s=pad)


def global_match(scene: PointCloud, map_cloud: PointCloud,
                 prior_xy: jnp.ndarray, cfg: GlobalMatchConfig,
                 icp_cfg: IcpConfig | None = None) -> MatchResult:
    """Find the scene pose in the map near prior_xy (the reference searches
    +-10 m around the current pose; our raster covers grid_size*resolution).

    scene: robot-frame cloud. map_cloud: world-frame cloud.
    """
    K = cfg.num_rotations
    angles = jnp.arange(K) * (2 * jnp.pi / K)
    # largest divisor of K within the configured chunk budget
    chunk = max(c for c in range(1, max(1, cfg.rot_chunk) + 1) if K % c == 0)

    map_img = rasterize(map_cloud.xyz[..., :2], map_cloud.valid, prior_xy, cfg)
    map_img = dilate(map_img, cfg.smooth_radius)
    G = cfg.grid_size
    P = 2 * G
    F_map = jnp.fft.rfft2(map_img, s=(P, P))

    def scene_raster(theta):
        R = rot2(theta)
        xy = scene.xyz[..., :2] @ R.T
        return rasterize(xy, scene.valid, jnp.zeros(2), cfg)

    def score_chunk(th):
        # (chunk, 2G, 2G) correlation planes live at once — not all K; the
        # full stack at fleet batch sizes is multi-GB of HLO temps (OOM)
        imgs = jax.vmap(scene_raster)(th)                        # (c, G, G)
        corr = fft_correlate(map_img, imgs, map_spectrum=F_map)
        flat = corr.reshape(th.shape[0], -1)
        idx = jnp.argmax(flat, axis=-1)
        return (idx, jnp.take_along_axis(flat, idx[:, None], -1)[:, 0],
                jnp.sum(imgs, axis=(1, 2)))

    idxs, bests, cells = jax.lax.map(score_chunk,
                                     angles.reshape(K // chunk, chunk))
    flat_idx = idxs.reshape(K)
    best_per_rot = bests.reshape(K)
    cells_per_rot = cells.reshape(K)
    # score normalizes by occupied scene RASTER cells (the correlation's own
    # support), not valid points: several points can share one raster cell
    # (scene voxel finer than grid_resolution), which deflated a perfect
    # alignment to ~voxel/raster area ratio and pushed correct matches
    # under the acceptance threshold
    frac_per_rot = best_per_rot / jnp.maximum(cells_per_rot, 1.0)
    k = jnp.argmax(frac_per_rot)
    ij = flat_idx[k]
    si, sj = ij // P, ij % P
    # linear (zero-padded) lag -> signed translation in cells
    dx = jnp.where(si >= G, si - P, si).astype(jnp.float32)
    dy = jnp.where(sj >= G, sj - P, sj).astype(jnp.float32)
    trans = jnp.stack([dx, dy]) * cfg.grid_resolution + prior_xy
    from slam_tpu.geometry import angle_wrap
    coarse = jnp.concatenate([trans, angle_wrap(angles[k])[None]])

    score = frac_per_rot[k]

    pose = coarse
    if icp_cfg is not None:
        res = icp_fit(scene.xyz[..., :2], scene.valid,
                      jnp.zeros_like(scene.valid),
                      map_cloud.xyz[..., :2], map_cloud.valid,
                      jnp.zeros_like(map_cloud.valid),
                      coarse, icp_cfg)
        pose = jnp.where(res.ok, res.pose, coarse)

    return MatchResult(pose=pose, score=score, ok=score > cfg.accept_score)
