"""GP-INSAC ground segmentation — TPU-native rebuild of
ground_segmentation/src/groundSegmentation.cpp.

Reference pipeline (sectorINSAC, groundSegmentation.cpp:196-468):
  1. polar bin grid 72 sectors x 200 range bins (genPolarBinGrid, :110-162),
     per-bin prototype = lowest-z point;
  2. per sector: signal = valid prototypes (bins with >5 points, :211),
     sorted by height; seeds = up to 10 lowest within 50 m, |h|<15 (:232-266);
  3. INSAC: GP-regress ground height over the model set (squared-exp kernel
     k = sf*exp(-dr^2/2l^2), genGPModel :165-185), adopt candidates passing
     vf < P_TMODEL && |h - f_s|/sqrt(sn + vf^2) < P_TDATA (:334-337), repeat
     until no adoption;
  4. classify bin points: model bins -> ground if |z - proto_h| < P_TG else
     obstacle (drivable-over if h > ROBot_HEIGHT); non-model bins (when the
     model was sufficient) -> all obstacle, drivable flag vs f_s (:378-459).

TPU reformulation: binning/prototypes are scatter-mins; each sector keeps a
fixed-capacity height-sorted signal array; one INSAC sweep adopts *all*
inliers against the current regression at once (within a reference sweep f_s
is fixed — :331-369 — so per-sweep adoption order doesn't change the set),
and sweeps run a fixed count with converged sectors frozen. All 72 sectors
run batched; the (C x C) GP solves batch over sectors on the MXU.

Semantics preserved exactly except: (a) reference recomputes nothing within a
sweep => identical; (b) bins whose points are never classified (count<=5, or
insufficient model) are dropped from all outputs, as in the reference.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tpu.config import GroundSegConfig
from slam_tpu.ops.linalg import (cholesky_blocked, cholesky_unrolled,
                                 forward_substitute,
                                 forward_substitute_blocked)
from slam_tpu.types import PointCloud


# bin-incidence ((N, S*L)) passes beat native serialized scatters at sim
# scale but are memory-quadratic; beyond this element budget the O(N) native
# scatter/gather engine takes over (reference scale: 20k pts x 72x200 bins)
INCIDENCE_LIMIT = 1 << 25

# which large-N prototype engine to use: "sort" (stable 2-key sort, exact
# proto z/r of the mm-min point) or "packedmin" (one int32 scatter-min over a
# packed (zq, rq) key + one count scatter-add — 2 O(N) passes instead of a
# 4-operand sort; proto z quantized to 1 mm and proto r to r_max/2048
# ~5 cm, both far inside the GP length scale / threshold tolerances).
# Env-gated so the engines can be A/B'd through the real pipeline.
LARGE_N_PROTO = os.environ.get("SLAM_TPU_GROUND_PROTO", "sort")

# low-bit field width for the packed (zq, rq) prototype key: 20 z bits +
# _RQ_BITS range bits must stay < 31 (int32, non-negative)
_RQ_BITS = 11

# GP solver for the INSAC sweeps: "unrolled" (column-at-a-time, fully
# fusible, best at tiny C) or "blocked" (panel updates — one full-matrix
# einsum per 8 columns instead of one full-matrix copy per column; same
# math to fp roundoff). Env-gated for on-chip A/B at reference scale (C=64).
GP_SOLVER = os.environ.get("SLAM_TPU_GP_SOLVER", "unrolled")


class GroundSegResult(NamedTuple):
    cloud: PointCloud          # flags: GROUND / DRIVABLE(-over); valid &= classified
    sector_sufficient: jnp.ndarray  # (S,) bool — model had >=2 seeds
    model_mask: jnp.ndarray    # (S, C) adopted signal slots (diagnostics)
    f_s: jnp.ndarray           # (S, C) regressed ground height per slot


def _gp_kernel(r: jnp.ndarray, cfg: GroundSegConfig) -> jnp.ndarray:
    """Squared-exp kernel matrix over ranges (genGPModel,
    groundSegmentation.cpp:165-185). r: (..., C) -> (..., C, C)."""
    d = r[..., :, None] - r[..., None, :]
    return cfg.gp_signal_var * jnp.exp(-(d * d) / (2.0 * cfg.gp_length_scale**2))


def segment_ground(cloud: PointCloud, cfg: GroundSegConfig) -> GroundSegResult:
    """Classify a sensor-frame cloud into ground/obstacle/drivable-over.

    cloud.xyz in the (roll/pitch-compensated) sensor frame, z up.
    """
    S, L, C = cfg.num_sectors, cfg.num_range_bins, cfg.signal_capacity
    xyz = cloud.xyz
    N = xyz.shape[0]
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    r3 = jnp.sqrt(x * x + y * y + z * z)
    r2 = jnp.sqrt(x * x + y * y)
    phi = jnp.degrees(jnp.arctan2(y, x))
    phi = jnp.where(phi < 0, phi + 360.0, phi)
    sector = jnp.clip((phi / (360.0 / S)).astype(jnp.int32), 0, S - 1)
    lbin = (r2 / (cfg.r_max / L)).astype(jnp.int32)
    ok = cloud.valid & (r3 < cfg.r_max) & (lbin >= 0) & (lbin < L)
    flat = jnp.where(ok, sector * L + lbin, S * L)

    # --- per-bin stats ---
    # Two engines, one semantics:
    #   incidence: one (N, S*L) bin-incidence matrix drives counts,
    #     prototype argmin, and the per-point table lookup matmul — a few
    #     dense VPU/MXU passes, fastest at sim scale (native serialized
    #     scatters measured ~8 ms/tick at batch 128 there);
    #   native: .at[].add / .at[].min flat scatters + flat gathers — O(N),
    #     the only tractable form at the reference's working point (a 20k+
    #     point HDL-32E scan x the 72x200 polar grid would make the
    #     incidence 295M elements).
    imax = jnp.iinfo(jnp.int32).max
    # z quantized to mm: exact ties resolve by first scan index like the
    # reference's strict < sweep. DOCUMENTED TOLERANCE: two points whose z
    # differ by < 1 mm quantize equal, so the earlier-index point wins even
    # if it is the (sub-mm) higher one — the reference would pick the
    # strictly lower. The prototype feeds the GP at its own (z, range), so
    # the model perturbation is bounded by the 1 mm quantization. Ok points
    # have |z| <= r3 < r_max << 524 m, so mm quantization fits in 20 bits.
    # Clip ceiling 2**20 - 2 (not -1): a maximal zq at the largest packable
    # idx_bits would make key == imax, colliding with the invalid sentinel.
    zq = jnp.clip(jnp.round((z + 500.0) * 1000.0), 0,
                  2**20 - 2).astype(jnp.int32)
    idx_bits = max(1, (N - 1).bit_length())
    use_incidence = N * (S * L) <= INCIDENCE_LIMIT
    if use_incidence:
        inc = flat[:, None] == jnp.arange(S * L)[None, :]      # (N, K) bool
        counts = jnp.sum(inc, axis=0, dtype=jnp.int32)         # (K,)
        if idx_bits + 20 <= 31:  # key = zq << idx_bits | idx fits int32
            # single-pass lexicographic argmin: pack (zq, first-index
            # tiebreak) into one int32 key — one (N, K) reduce_min picks the
            # prototype point uniquely, replacing the 3-reduction
            # min/lookup/argmin chain (~1 ms/tick at batch 128)
            key = jnp.where(ok, zq * (1 << idx_bits)
                            + jnp.arange(N, dtype=jnp.int32), imax)
            key_min = jnp.min(jnp.where(inc, key[:, None], imax), axis=0)
            chosen = (inc & (key[:, None] == key_min[None, :])).astype(
                z.dtype)
        else:
            # scans too large for the packed key: two-pass (min then match)
            zq_ok = jnp.where(ok, zq, imax)
            min_zq = jnp.min(jnp.where(inc, zq_ok[:, None], imax), axis=0)
            min_at_pt = jnp.sum(jnp.where(inc, min_zq[None, :], 0), axis=1)
            is_proto = ok & (zq_ok == min_at_pt)
            proto_idx = jnp.min(
                jnp.where(inc & is_proto[:, None],
                          jnp.arange(N)[:, None], N),
                axis=0)                                           # (K,)
            chosen = (inc & is_proto[:, None] &
                      (jnp.arange(N)[:, None] == proto_idx[None, :])).astype(
                          z.dtype)
        bin_count = counts.reshape(S, L)
        # prototype coordinates via the chosen-point one-hot (r2[pidx]/
        # z[pidx] index into the (N,) cloud — native row gathers serialize
        # on TPU at this scale)
        proto_r = jnp.sum(chosen * r2[:, None], axis=0).reshape(S, L)
        proto_h = jnp.sum(chosen * z[:, None], axis=0).reshape(S, L)
    elif LARGE_N_PROTO == "sort":
        # Sort-based prototype extraction. XLA TPU scatter-ADD runs at
        # bandwidth speed, but scatter-MIN costs ~4.4 ms per pass at this
        # size, and the min->gather->min->gather prototype chain serialized
        # ~5 memory-bound passes (~23 ms of the 50 ms ref-scale call).
        # One stable 2-key sort by (bin, zq) replaces the whole chain: the
        # first row of each bin segment IS the prototype (mm-quantized min
        # z, original-index tiebreak via stability — same 1 mm tolerance as
        # the packed-key path above), and everything downstream is
        # boundary-masked scatter-adds.
        K = S * L
        zq_ok = jnp.where(ok, zq, imax)
        sf, _, sr, sz = jax.lax.sort((flat, zq_ok, r2, z), num_keys=2,
                                     is_stable=True)
        boundary = jnp.concatenate(
            [jnp.ones(1, bool), sf[1:] != sf[:-1]])
        sel = boundary.astype(z.dtype)
        acc = jnp.zeros((K + 1, 3), z.dtype).at[sf].add(
            jnp.stack([sel * sr, sel * sz, jnp.ones_like(sz)], -1))
        proto_r = acc[:K, 0].reshape(S, L)
        proto_h = acc[:K, 1].reshape(S, L)
        bin_count = acc[:K, 2].astype(jnp.int32).reshape(S, L)
    else:
        # Packed-key scatter-min prototype extraction ("packedmin"): pack
        # (zq, rq) into one non-negative int32 — zq in the high 20 bits,
        # range quantized to r_max/2^_RQ_BITS (~5 cm) in the low bits — so a
        # single .at[].min recovers BOTH prototype fields, plus one
        # scatter-add for counts: 2 bandwidth-bound O(N) passes replacing
        # the sort engine's 4-operand stable sort. DOCUMENTED TOLERANCES on
        # top of the sort path's 1 mm z quantization: (a) proto_r is mid-bin
        # at ~5 cm resolution (vs the GP length scale of 10 m and the 50 m
        # seed gate — sub-0.1% kernel perturbation); (b) mm-level z ties
        # resolve by smaller quantized range instead of first scan index
        # (still deterministic); (c) proto_h is the mm-quantized z rather
        # than the chosen point's exact z (±0.5 mm vs the 0.3 m ground
        # threshold).
        K = S * L
        rq_scale = (1 << _RQ_BITS) / cfg.r_max
        # ok implies r2 <= r3 < r_max, so rq < 2^_RQ_BITS before the clip
        rq = jnp.clip((r2 * rq_scale).astype(jnp.int32), 0,
                      (1 << _RQ_BITS) - 1)
        key = jnp.where(ok, zq * (1 << _RQ_BITS) + rq, imax)
        minkey = jnp.full((K + 1,), imax, jnp.int32).at[flat].min(key)
        cnt = jnp.zeros((K + 1,), jnp.int32).at[flat].add(
            jnp.where(ok, 1, 0))
        mk = minkey[:K]
        has = cnt[:K] > 0
        mk = jnp.where(has, mk, 0)
        proto_h = jnp.where(
            has, (mk >> _RQ_BITS).astype(z.dtype) * 1e-3 - 500.0, 0.0
        ).reshape(S, L)
        proto_r = jnp.where(
            has,
            ((mk & ((1 << _RQ_BITS) - 1)).astype(z.dtype) + 0.5) / rq_scale,
            0.0).reshape(S, L)
        bin_count = cnt[:K].reshape(S, L)
    # a prototype exists iff the bin has any ok point, i.e. counts >= 1,
    # which the min-points gate subsumes (min_bin_points >= 1)
    sig_valid = bin_count > cfg.min_bin_points  # :211

    # --- per-sector signal arrays, height-sorted, capacity C ---
    sort_key = jnp.where(sig_valid, proto_h, jnp.inf)
    order = jnp.argsort(sort_key, axis=1)[:, :C]                 # (S, C)
    # slot gathers / scatter-backs as one-hot einsums over the permutation
    # (take_along_axis rows serialize on TPU — ~4 ms/tick at batch 128; the
    # (S, C, L) one-hot is 16k elements)
    P = (order[:, :, None] == jnp.arange(L)[None, None, :]).astype(z.dtype)
    sl_h = jnp.einsum("scl,sl->sc", P, proto_h)
    sl_r = jnp.einsum("scl,sl->sc", P, proto_r)
    sl_valid = jnp.einsum("scl,sl->sc", P,
                          sig_valid.astype(z.dtype)) > 0.5

    # --- seeds (groundSegmentation.cpp:232-266) ---
    qual = sl_valid & (sl_r < cfg.seed_max_range) & \
        (jnp.abs(sl_h) < cfg.seed_max_height)
    npt = jnp.minimum(jnp.sum(sl_valid, 1), cfg.num_seed_points)  # (S,)
    rank = jnp.cumsum(qual, axis=1)
    seed = qual & (rank <= npt[:, None])
    sufficient = jnp.sum(seed, 1) >= 2                            # :269

    # --- INSAC sweeps ---
    Kall = _gp_kernel(sl_r, cfg)                                  # (S, C, C)
    eyeC = jnp.eye(C, dtype=Kall.dtype)

    def sweep(carry, _):
        m, active, f_prev, v_prev = carry  # m: (S, C) model mask
        mf = m.astype(Kall.dtype)
        # M = K restricted to the model + noise; identity elsewhere. Block
        # diagonal SPD, so the batched unrolled Cholesky applies (the LU
        # custom-call this replaces was 56% of the whole 3D step).
        M = Kall * mf[:, :, None] * mf[:, None, :] + \
            cfg.gp_noise * mf[:, None, :] * eyeC + \
            (1.0 - mf)[:, None, :] * eyeC
        B = Kall * mf[:, None, :]                                 # cols masked
        if GP_SOLVER == "blocked":
            Lchol = cholesky_blocked(M)
        else:
            Lchol = cholesky_unrolled(M)
        rhs = jnp.concatenate([(sl_h * mf)[:, :, None],
                               jnp.swapaxes(B, 1, 2)], axis=2)    # (S, C, 1+C)
        if GP_SOLVER == "blocked":
            Y = forward_substitute_blocked(Lchol, rhs)
        else:
            Y = forward_substitute(Lchol, rhs)
        w, Yb = Y[..., 0], Y[..., 1:]                             # L^-1 h, L^-1 B^T
        # f_s = B M^-1 h = Yb^T w;  v = sf - diag(B M^-1 B^T) = sf - sum Yb^2
        f_s = jnp.einsum("sjc,sj->sc", Yb, w)
        v = cfg.gp_signal_var - jnp.sum(Yb * Yb, axis=1)

        cand = sl_valid & ~m
        met = (sl_h - f_s) / jnp.sqrt(cfg.gp_noise + v * v)
        inlier = cand & (v < cfg.gp_model_confidence) & \
            (jnp.abs(met) < cfg.gp_data_confidence)
        inlier = inlier & active[:, None]
        new_m = m | inlier
        adopted = jnp.any(inlier, axis=1)
        f_keep = jnp.where(active[:, None], f_s, f_prev)
        v_keep = jnp.where(active[:, None], v, v_prev)
        # terminate when nothing adopted or no candidates left (:374)
        still = active & adopted & jnp.any(sl_valid & ~new_m, axis=1)
        return (new_m, still, f_keep, v_keep), None

    init = (seed, sufficient & jnp.any(sl_valid & ~seed, axis=1),
            jnp.zeros_like(sl_h), jnp.zeros_like(sl_h))
    # unroll: the sweep state is tiny ((S, C) masks/floats) so the fixed
    # 8-sweep loop is XLA while-machinery overhead, not compute; inlining the
    # sweeps lets the fuser chain them (~0.7 ms/tick at batch 128)
    (model, _, f_s, _), _ = jax.lax.scan(sweep, init, None,
                                         length=cfg.max_insac_sweeps,
                                         unroll=True)

    # --- scatter sweep results back to (S, L) bins (einsum over the same
    # permutation one-hot: each bin receives from at most one slot), then
    # gather per point ---
    bin_model = jnp.einsum(
        "scl,sc->sl", P, (model & sl_valid).astype(f_s.dtype)) > 0.5
    bin_f = jnp.einsum("scl,sc->sl", P, jnp.where(sl_valid, f_s, 0.0))
    # bins that made it into the capacity-C slot array; overflow bins (more
    # than C valid signals in a sector) drop their points like invalid bins
    bin_in = jnp.einsum("scl,sc->sl", P, sl_valid.astype(f_s.dtype)) > 0.5

    # per-point lookups of the five bin tables: one one-hot matmul at sim
    # scale (native TPU gathers cost ~10 ms/table/step at batch 128; the MXU
    # does all five in one pass, exactly, at HIGHEST precision); flat native
    # gathers at reference scale (O(N) each). Rows/entries of out-of-range
    # points are zero, which p_sig_valid's `ok` conjunction already excludes.
    table = jnp.stack([
        bin_in.astype(xyz.dtype), bin_model.astype(xyz.dtype), proto_h, bin_f,
        jnp.broadcast_to(sufficient[:, None], (S, L)).astype(xyz.dtype),
    ], axis=-1).reshape(S * L, 5)
    if use_incidence:
        g = jnp.matmul(inc.astype(xyz.dtype), table,
                       precision=jax.lax.Precision.HIGHEST)
    else:
        # one (K+1, 5) row gather: measured 4.1 ms vs 6.2 ms for five
        # separate 1-D gathers at (16, 20480) on v5e
        padded = jnp.concatenate(
            [table, jnp.zeros((1, 5), table.dtype)], axis=0)   # (K+1, 5)
        g = padded[flat]
    p_sig_valid = ok & (g[:, 0] > 0.5)
    p_model = g[:, 1] > 0.5
    p_proto_h = g[:, 2]
    p_f = g[:, 3]
    p_suff = g[:, 4] > 0.5

    # model bins: ground if |proto_h - z| < P_TG (:393-414)
    h_model = jnp.abs(p_proto_h - z)
    is_ground = p_sig_valid & p_model & (h_model < cfg.ground_threshold)
    obs_model = p_sig_valid & p_model & ~is_ground
    # non-model bins classified only when the sector model was sufficient
    # (:429-459); height vs regressed f_s
    obs_nonmodel = p_sig_valid & ~p_model & p_suff
    h_ref = jnp.where(p_model, h_model, jnp.abs(z - p_f))
    is_obs = obs_model | obs_nonmodel
    drivable_over = is_obs & (h_ref > cfg.robot_height)

    classified = is_ground | is_obs
    flags = jnp.where(is_ground, PointCloud.FLAG_GROUND, 0)
    flags = flags | jnp.where(drivable_over, PointCloud.FLAG_DRIVABLE, 0)
    out = cloud.replace(valid=classified,
                        flags=flags.astype(jnp.int32))
    return GroundSegResult(cloud=out, sector_sufficient=sufficient,
                           model_mask=model, f_s=f_s)


def split_ground_obstacle(res_cloud: PointCloud):
    """Split a segmented cloud into (obstacle, ground, non-drivable-obstacle)
    masks — the oCloud/gCloud/dCloud triple of setupGroundSegmentation."""
    ground = res_cloud.valid & res_cloud.is_ground()
    obstacle = res_cloud.valid & ~res_cloud.is_ground()
    drv_over = (res_cloud.flags & PointCloud.FLAG_DRIVABLE) != 0
    non_drivable = obstacle & ~drv_over
    return obstacle, ground, non_drivable
