"""Sample-probability grid — TPU-native rebuild of
sample_mapping/src/sample_mapping.cpp.

  - addSampleToMap (:92-127): additive Gaussian evidence blob, clamped to
    [prob_min, prob_max] — a full-grid masked Gaussian evaluation here (the
    reference's 3-sigma window loop is a scalar-era optimization; the whole
    400x400 grid is one VPU op).
  - removeConeFromMap (:129-186): camera-FOV cone evidence decay as the robot
    looks around — full-grid polar mask.
  - processMapCV (:188-239): OpenCV contour centroids -> candidate sample
    locations. Replaced by thresholded local-maxima extraction with top-k
    ranking: for the additive Gaussian blobs this grid holds, blob centroids
    and probability peaks coincide (documented deviation from contour
    centroids for non-convex blobs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tpu.config import SampleMapConfig


class SampleMap(NamedTuple):
    prob: jnp.ndarray   # (H, W) evidence in [prob_min, prob_max]


def init_sample_map(cfg: SampleMapConfig) -> SampleMap:
    # initialize AT the evidence floor (prob is documented in
    # [prob_min, prob_max]): zeros under a positive prob_min would let the
    # first add_sample's clip snap the whole untouched grid up to prob_min
    return SampleMap(prob=jnp.full((cfg.size_x, cfg.size_y), cfg.prob_min,
                                   jnp.float32))


def _cell_centers(cfg: SampleMapConfig):
    H, W = cfg.size_x, cfg.size_y
    xs = (jnp.arange(H) - H // 2 + 0.5) * cfg.resolution
    ys = (jnp.arange(W) - W // 2 + 0.5) * cfg.resolution
    return xs[:, None], ys[None, :]


def add_sample(m: SampleMap, xy: jnp.ndarray, amplitude: jnp.ndarray,
               sigma: jnp.ndarray, cfg: SampleMapConfig) -> SampleMap:
    """Gaussian evidence blob at global xy (SampleMap::addSampleToMap)."""
    xs, ys = _cell_centers(cfg)
    d2 = (xs - xy[0]) ** 2 + (ys - xy[1]) ** 2
    blob = amplitude * jnp.exp(-d2 / (2.0 * sigma * sigma))
    bound = (3.0 * sigma) ** 2
    blob = jnp.where(d2 <= bound, blob, 0.0)   # 3-sigma window (:96)
    prob = jnp.clip(m.prob + blob, cfg.prob_min, cfg.prob_max)
    return SampleMap(prob=prob)


def remove_cone(m: SampleMap, xy: jnp.ndarray, theta: jnp.ndarray,
                dec_value: jnp.ndarray, cfg: SampleMapConfig) -> SampleMap:
    """Decay evidence in the camera FOV cone (SampleMap::removeConeFromMap):
    cells with r in [r_min, r_max] and |angle - theta| < fov/2 lose
    dec_value."""
    xs, ys = _cell_centers(cfg)
    qx = xs - xy[0]
    qy = ys - xy[1]
    r = jnp.sqrt(qx * qx + qy * qy)
    ang = jnp.arctan2(qy, qx)
    dang = jnp.arctan2(jnp.sin(ang - theta), jnp.cos(ang - theta))
    in_cone = (r > cfg.r_min) & (r < cfg.r_max) & \
        (jnp.abs(dang) < cfg.fov_cone / 2.0)
    prob = jnp.clip(m.prob - jnp.where(in_cone, dec_value, 0.0),
                    cfg.prob_min, cfg.prob_max)
    return SampleMap(prob=prob)


class SamplePeaks(NamedTuple):
    xy: jnp.ndarray     # (K, 2) global candidate locations
    value: jnp.ndarray  # (K,) normalized probability
    valid: jnp.ndarray  # (K,)


def extract_samples(m: SampleMap, cfg: SampleMapConfig,
                    max_samples: int = 16) -> SamplePeaks:
    """Candidate sample locations: thresholded local maxima of the normalized
    probability (processMapCV analogue; threshold sample_mapping.cpp:198)."""
    H, W = m.prob.shape
    norm = m.prob / cfg.prob_max
    p = jnp.pad(norm, 1, constant_values=-1.0)
    neigh = jnp.stack([p[i:i + H, j:j + W]
                       for i in range(3) for j in range(3)
                       if not (i == 1 and j == 1)])
    cand = (norm > cfg.pixel_prob_threshold) & (norm >= neigh.max(axis=0))
    # plateau dedup: evidence saturates at prob_max for a repeatedly-
    # observed sample (add_sample clips), making every plateau cell a
    # local max under >= — up to max_samples slots then fill with
    # duplicates of ONE sample, crowding real ones out. Keep only
    # candidates with no equal-valued candidate at a smaller flat index
    # among their up-left/up/up-right/left neighbors: one peak per
    # (convex) plateau, the reference's one-centroid-per-contour
    # behavior (processMapCV, sample_mapping.cpp:188-239).
    pc = jnp.pad(cand, 1)
    shifts = ((0, 0), (0, 1), (0, 2), (1, 0))   # NW, N, NE, W of center
    tied_smaller = jnp.zeros_like(cand)
    for i, j in shifts:
        nb_cand = pc[i:i + H, j:j + W]
        nb_val = p[i:i + H, j:j + W]
        tied_smaller |= nb_cand & (nb_val >= norm)
    is_peak = cand & ~tied_smaller
    score = jnp.where(is_peak, norm, -1.0).reshape(-1)
    vals, idx = jax.lax.top_k(score, max_samples)
    ii = idx // W
    jj = idx % W
    x = (ii - H // 2 + 0.5) * cfg.resolution
    y = (jj - W // 2 + 0.5) * cfg.resolution
    return SamplePeaks(xy=jnp.stack([x, y], -1), value=vals, valid=vals > 0)
