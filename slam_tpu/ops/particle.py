"""Particle-filter scan matching — the fleet-scale matching variant
(BASELINE config 5: "particle-filter scan matching + shared map").

The reference has no particle filter; this is the batched alternative to ICP
for fleet simulation: P pose particles per robot are scored by scan-to-map
occupancy agreement (a gather into the point-map grid — no NN search at
all), softmax-weighted, systematically resampled, and collapsed to a pose
measurement for the EKF. Cost is O(P * N_scan) gathers per robot — flat in
map size, ideal when thousands of robots share HBM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tpu.geometry import angle_wrap, se2_apply
from slam_tpu.mapping.point_map import PointMapGrid
from slam_tpu.types import PointCloud


class PFConfig(NamedTuple):
    num_particles: int = 128
    pos_sigma: float = 0.3       # proposal spread around the prediction [m]
    yaw_sigma: float = 0.05      # [rad]
    temperature: float = 0.1     # softmax temperature on hit fractions
    min_score: float = 0.2       # acceptance gate (hit fraction)
    # score every k-th scan point (classic MCL beam skipping): the scoring
    # gather is the entire PF cost on TPU (serialized ~6 ns/element; P x N
    # per robot per tick), and the hit FRACTION is an unbiased estimate at
    # any stride — stride adds estimator noise (~0.05 std at stride 4 with
    # 96 scored points) but cuts the matcher cost ~linearly (measured
    # 313 -> 131 ms/tick at b1024 from the stride alone; the flat-gather
    # restructure then took 131 -> 93, docs/PERF.md config-5 section).
    # Scan points are beam-ordered, so a stride keeps angular coverage
    # uniform. Default 1 = exact estimator; opt into 4 where throughput
    # matters and the min_score gate has margin (see config.py PfConfig).
    score_stride: int = 1
    # scoring engine: "gather" (per-point lookups — CPU-fast, TPU-slow),
    # "dense" (one-hot MXU contractions), "pallas" (dense with VMEM-resident
    # one-hots), "auto" (pallas on TPU, gather elsewhere). Identical scores.
    scorer: str = "auto"


class PFResult(NamedTuple):
    pose: jnp.ndarray            # (3,) weighted-mean pose
    score: jnp.ndarray           # () best particle hit fraction
    ok: jnp.ndarray              # () acceptance
    particles: jnp.ndarray       # (P, 3) resampled particles


def occupancy_flat(grid: PointMapGrid) -> jnp.ndarray:
    """(G*G,) bool occupancy table for score_pose — compute ONCE per match
    and share across particles: the per-(particle, point) work is then a
    single flat 1-D gather, which the TPU runs ~30% faster than the 2-D
    gather + compare it replaces (92.9 vs 131.3 ms/tick at b1024, P=128,
    96 scored points)."""
    return grid.count.reshape(-1) > 0


def score_pose(grid: PointMapGrid, scan_xy: jnp.ndarray, valid: jnp.ndarray,
               pose: jnp.ndarray, resolution: float,
               occ_flat: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fraction of scan points landing in occupied map cells at `pose`."""
    G = grid.count.shape[0]
    if occ_flat is None:
        occ_flat = occupancy_flat(grid)
    world = se2_apply(pose, scan_xy)
    rel = world - grid.center
    cx = jnp.floor(rel[..., 0] / resolution).astype(jnp.int32) + G // 2
    cy = jnp.floor(rel[..., 1] / resolution).astype(jnp.int32) + G // 2
    inb = valid & (cx >= 0) & (cy >= 0) & (cx < G) & (cy < G)
    flat = jnp.clip(cx, 0, G - 1) * G + jnp.clip(cy, 0, G - 1)
    hits = jnp.sum(jnp.where(inb & occ_flat[flat], 1.0, 0.0))
    return hits / jnp.maximum(jnp.sum(valid), 1)


def _cell_indices(grid_center, G, scan_xy, poses, resolution):
    """(..., N) int32 cell coordinates of scan points under pose(s)."""
    world = se2_apply(poses, scan_xy)
    rel = world - grid_center
    cx = jnp.floor(rel[..., 0] / resolution).astype(jnp.int32) + G // 2
    cy = jnp.floor(rel[..., 1] / resolution).astype(jnp.int32) + G // 2
    return cx, cy


def score_particles_dense(grid: PointMapGrid, scan_xy: jnp.ndarray,
                          valid: jnp.ndarray, particles: jnp.ndarray,
                          resolution: float,
                          chunk: int = 16) -> jnp.ndarray:
    """All-particle occupancy scoring WITHOUT per-point gathers: the
    (particle, point) -> occ[cx, cy] lookup becomes two one-hot
    contractions the MXU eats.

        hit(p, i) = sum_g onehot(cx)[p,i,g] * occ[g,h] * onehot(cy)[p,i,h]

    Exactly score_pose's semantics: out-of-bounds indices match no one-hot
    column (hit 0 == the inb gate), one-hots are 0/1-exact in bf16, the
    row result is an exact 0/1, and the final hit count is an exact small
    integer in f32. On TPU this replaces ~P*N serialized ~6-10 ns gathers
    per robot (the entire config-5 budget, docs/PERF.md) with dense MXU
    work. Chunked over particles so the batched one-hot intermediates stay
    bounded: (B_vmap, chunk, N, G) rather than (B_vmap, P, N, G).

    Returns (P,) hit fractions.
    """
    G = grid.count.shape[0]
    occ = (grid.count > 0).astype(jnp.bfloat16)              # (G, G)
    P = particles.shape[0]
    denom = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    w = valid.astype(jnp.float32)
    iota = jnp.arange(G, dtype=jnp.int32)

    pad = (-P) % chunk
    parts = jnp.concatenate(
        [particles, jnp.zeros((pad, 3), particles.dtype)]) if pad else \
        particles
    blocks = parts.reshape(-1, chunk, 3)

    def score_chunk(_, pblock):
        cx, cy = _cell_indices(grid.center, G, scan_xy, pblock,
                               resolution)                   # (C, N)
        ohx = (cx[..., None] == iota).astype(jnp.bfloat16)   # (C, N, G)
        ohy = (cy[..., None] == iota).astype(jnp.bfloat16)
        t = jnp.einsum("cng,gh->cnh", ohx, occ,
                       preferred_element_type=jnp.float32)
        hit = jnp.einsum("cnh,cnh->cn", t, ohy.astype(jnp.float32))
        return None, jnp.sum(hit * w, axis=-1)               # (C,)

    _, hits = jax.lax.scan(score_chunk, None, blocks)
    return hits.reshape(-1)[:P] / denom


def _pf_scores_pallas(grid: PointMapGrid, scan_xy, valid, particles,
                      resolution: float, chunk: int = 32,
                      interpret: bool = False) -> jnp.ndarray:
    """Pallas version of score_particles_dense: the occupancy table and the
    one-hot intermediates live in VMEM, so the only HBM traffic is the
    (N, 2) scan, (P, 3) particles and (G, G) table — the dense XLA path
    round-trips (chunk, N, G) one-hots through HBM instead. Grid is over
    particle chunks; vmap over robots adds the fleet dimension.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = grid.count.shape[0]
    N = scan_xy.shape[0]
    P = particles.shape[0]
    pad = (-P) % chunk
    parts = jnp.concatenate(
        [particles, jnp.zeros((pad, 3), particles.dtype)]) if pad else \
        particles
    Ppad = parts.shape[0]
    occ = (grid.count > 0).astype(jnp.bfloat16)
    w = valid.astype(jnp.float32)
    inv_res = float(1.0 / resolution)   # python constant: closable by pallas

    def kernel(scan_ref, w_ref, parts_ref, occ_ref, center_ref, out_ref):
        pb = parts_ref[:]                                    # (C, 3)
        sx = scan_ref[:, 0][None, :]                         # (1, N)
        sy = scan_ref[:, 1][None, :]
        c = jnp.cos(pb[:, 2])[:, None]                       # (C, 1)
        s = jnp.sin(pb[:, 2])[:, None]
        wx = c * sx - s * sy + pb[:, 0][:, None] - center_ref[0, 0]
        wy = s * sx + c * sy + pb[:, 1][:, None] - center_ref[0, 1]
        cx = jnp.floor(wx * inv_res).astype(jnp.int32) + G // 2
        cy = jnp.floor(wy * inv_res).astype(jnp.int32) + G // 2
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, G), 2)
        ohx = (cx[..., None] == iota).astype(jnp.bfloat16)   # (C, N, G)
        ohy = (cy[..., None] == iota).astype(jnp.bfloat16)
        # precision DEFAULT: the session-wide HIGHEST override would ask
        # Mosaic for an fp32-contract matmul on bf16 operands ("Bad lhs
        # type"); bf16-multiply/f32-accumulate is exact here anyway (0/1
        # operands, row sums <= G)
        t = jax.lax.dot_general(
            ohx, occ_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)             # (C, N, G)
        hit = jnp.sum(t * ohy.astype(jnp.float32), axis=-1)  # (C, N)
        out_ref[:] = jnp.sum(hit * w_ref[0, :][None, :],
                             axis=-1)[:, None]               # (C, 1)

    # 1-D operands ride as (1, N) / (Ppad, 1): Mosaic requires >=2-D blocks
    # whose trailing dims are (8, 128)-divisible or equal to the array's
    hits = pl.pallas_call(
        kernel,
        grid=(Ppad // chunk,),
        in_specs=[
            pl.BlockSpec((N, 2), lambda i: (0, 0)),          # scan
            pl.BlockSpec((1, N), lambda i: (0, 0)),          # weights
            pl.BlockSpec((chunk, 3), lambda i: (i, 0)),      # particles
            pl.BlockSpec((G, G), lambda i: (0, 0)),          # occupancy
            pl.BlockSpec((1, 2), lambda i: (0, 0)),          # center
        ],
        out_specs=pl.BlockSpec((chunk, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Ppad, 1), jnp.float32),
        interpret=interpret,
    )(scan_xy, w[None, :], parts, occ, grid.center[None, :])
    denom = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    return hits[:P, 0] / denom


def score_particles(grid: PointMapGrid, scan_xy, valid, particles,
                    resolution: float, cfg: "PFConfig",
                    occ_flat=None) -> jnp.ndarray:
    """(P,) hit fractions — engine dispatch. "gather" is the original
    per-point lookup (fastest on CPU backends, serialized on TPU);
    "dense" is the one-hot MXU formulation; "pallas" keeps it in VMEM;
    "auto" picks pallas on TPU, gather elsewhere. All three produce
    identical scores (tests/test_utils_particle.py)."""
    engine = getattr(cfg, "scorer", "auto")
    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "gather"
    if engine == "pallas":
        return _pf_scores_pallas(grid, scan_xy, valid, particles, resolution,
                                 interpret=jax.default_backend() != "tpu")
    if engine == "dense":
        return score_particles_dense(grid, scan_xy, valid, particles,
                                     resolution)
    occ = occupancy_flat(grid) if occ_flat is None else occ_flat
    return jax.vmap(
        lambda p: score_pose(grid, scan_xy, valid, p, resolution, occ)
    )(particles)


def pf_match(key: jnp.ndarray, grid: PointMapGrid, scan: PointCloud,
             pred_pose: jnp.ndarray, resolution: float,
             cfg: PFConfig = PFConfig()) -> PFResult:
    """One particle-filter measurement step for a single robot (vmap over the
    fleet). pred_pose: (3,) EKF prediction, the proposal center."""
    P = cfg.num_particles
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, (P, 3)) * jnp.array(
        [cfg.pos_sigma, cfg.pos_sigma, cfg.yaw_sigma])
    particles = pred_pose + noise
    particles = particles.at[0].set(pred_pose)  # keep the prediction itself

    st = max(1, int(cfg.score_stride))
    scan_xy = scan.xyz[::st, :2]
    valid = scan.valid[::st]
    scores = score_particles(grid, scan_xy, valid, particles, resolution,
                             cfg)                             # (P,)

    w = jax.nn.softmax(scores / cfg.temperature)
    # weighted circular mean for yaw
    mx = jnp.sum(w * particles[:, 0])
    my = jnp.sum(w * particles[:, 1])
    myaw = jnp.arctan2(jnp.sum(w * jnp.sin(particles[:, 2])),
                       jnp.sum(w * jnp.cos(particles[:, 2])))
    pose = jnp.stack([mx, my, angle_wrap(myaw)])

    # systematic resampling (for iterated filtering across steps)
    u = (jax.random.uniform(k2) + jnp.arange(P)) / P
    cdf = jnp.cumsum(w)
    idx = jnp.searchsorted(cdf, u)
    resampled = particles[jnp.clip(idx, 0, P - 1)]

    # acceptance gates on the score of the RETURNED pose, not the best
    # particle: on a multimodal posterior (corridor ambiguity) the softmax
    # mean can land between two well-scoring modes where the scan matches
    # nothing — gating on max(scores) would accept exactly that pose
    out_score = score_particles(grid, scan_xy, valid, pose[None, :],
                                resolution, cfg)[0]
    return PFResult(pose=pose, score=out_score,
                    ok=out_score >= cfg.min_score, particles=resampled)
