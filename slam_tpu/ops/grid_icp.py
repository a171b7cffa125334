"""Grid-accelerated class-constrained ICP.

The brute-force correspondence (ops/nn.py, ops/nn_pallas.py) costs
O(S x C) per ICP iteration. Since the scan-to-map target lives in the
point-map grid (mapping/point_map.py) anyway, we instead precompute — once
per scan, not per iteration — a *nearest-centroid field*: for every grid
cell, the coordinates of the nearest occupied-cell centroid of each class
(GA / NGA), via jump flooding (JFA, log2(G) dense passes of rolls+selects,
pure VPU work). Every ICP iteration's correspondence is then one gather per
query point. 20 iterations cost 20 x O(S) instead of 20 x O(S x C).

Semantics vs the reference KD-tree: nearest is resolved from the query's
cell center rather than the query itself, so correspondences can differ for
points near Voronoi boundaries between two map centroids (<= resolution/2
quantization). ICP averages over hundreds of inliers; the fixed point is the
same within the map's own 0.5 m discretization (icpTools.cpp:623 voxel leaf).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tpu.config import IcpConfig
from slam_tpu.geometry import angle_wrap, rot2
from slam_tpu.mapping.point_map import PointMapGrid
from slam_tpu.ops.icp import IcpResult, procrustes_2d

BIG = jnp.float32(1e30)


class NearestField(NamedTuple):
    """Per-cell nearest map centroid, per class: arrays (2, G, G)."""
    px: jnp.ndarray
    py: jnp.ndarray
    valid: jnp.ndarray
    n_class: jnp.ndarray  # (2,) occupied-cell count per class (NGA, GA)
    center: jnp.ndarray   # (2,) grid center (world)
    resolution: float


def nearest_point_field(grid: PointMapGrid, resolution: float,
                        ga_threshold: int = 2,
                        max_step: int = 4) -> NearestField:
    """Jump-flood the per-class nearest-centroid fields over the map grid.

    max_step bounds the flood radius to ~2*max_step cells: ICP only accepts
    correspondences within sqrt(inlier_dist) (5 m^2 ref / 1 m^2 sim), so
    cells farther than that from any source can stay invalid — a full-grid
    flood (log2(G) levels) would pay 2.3x the whole SLAM step's cost for
    distances the inlier gate discards.

    `resolution` must equal the grid's own (the centroid offsets in
    grid.sum_x/sum_y were accumulated at grid.resolution; decoding queries
    at any other cell size would read the wrong cells)."""
    if abs(resolution - grid.resolution) > 1e-9:
        raise ValueError(
            f"nearest_point_field resolution {resolution} != the map "
            f"grid's own {grid.resolution}; the field must be built and "
            "queried at the grid's cell size")
    from slam_tpu.ops.stencil import neighbor_sum_2d

    G = grid.count.shape[0]
    occ = grid.count > 0
    cnt = jnp.maximum(grid.count, 1.0)
    # centroids = cell centers + cell-relative offset means
    base_x = ((jnp.arange(G) - G // 2 + 0.5) * grid.resolution
              + grid.center[0])[:, None]
    base_y = ((jnp.arange(G) - G // 2 + 0.5) * grid.resolution
              + grid.center[1])[None, :]
    cx = base_x + grid.sum_x / cnt
    cy = base_y + grid.sum_y / cnt

    # GA classification on the grid (classifyPoints stencil, icpTools.cpp:63;
    # same banded-matmul stencil + interior mask as the exports)
    box = neighbor_sum_2d((~occ).astype(jnp.float32),
                          precision=jax.lax.Precision.DEFAULT)
    ii = jnp.arange(G)
    interior = ((ii > 0) & (ii < G - 1))[:, None] & \
        ((ii > 0) & (ii < G - 1))[None, :]
    ga = occ & interior & (box >= ga_threshold)
    cls_occ = jnp.stack([occ & ~ga, occ & ga])              # (2, G, G): NGA, GA

    # cell centers in world coords (JFA distance is measured from these)
    ccx = jnp.broadcast_to(base_x, (G, G))
    ccy = jnp.broadcast_to(base_y, (G, G))
    idx = jnp.arange(G)

    def wrap_mask(d):
        """Rows/cols whose rolled-in source crossed the toroidal boundary."""
        if d > 0:
            return idx < d
        if d < 0:
            return idx >= G + d
        return jnp.zeros(G, bool)

    def flood(occ_c):
        px = jnp.where(occ_c, cx, 0.0)
        py = jnp.where(occ_c, cy, 0.0)
        d2 = jnp.where(occ_c, (px - ccx) ** 2 + (py - ccy) ** 2, BIG)

        state = (px, py, d2)
        step = max_step
        while step >= 1:
            px, py, d2 = state
            for di in (-step, 0, step):
                for dj in (-step, 0, step):
                    if di == 0 and dj == 0:
                        continue
                    qx = jnp.roll(px, (di, dj), (0, 1))
                    qy = jnp.roll(py, (di, dj), (0, 1))
                    qd = jnp.roll(d2, (di, dj), (0, 1))
                    # candidates that wrapped around the grid edge are from
                    # the far side of the map — a real centroid there would
                    # otherwise WIN against an unreachable cell (cand < BIG)
                    # and flag a cross-map correspondence as valid
                    wrapped = wrap_mask(di)[:, None] | wrap_mask(dj)[None, :]
                    cand = (qx - ccx) ** 2 + (qy - ccy) ** 2
                    cand = jnp.where(wrapped | (qd >= BIG), BIG, cand)
                    take = cand < d2
                    px = jnp.where(take, qx, px)
                    py = jnp.where(take, qy, py)
                    d2 = jnp.where(take, cand, d2)
            state = (px, py, d2)
            step //= 2
        px, py, d2 = state
        return px, py, d2 < BIG

    px, py, valid = jax.vmap(flood)(cls_occ)
    n_class = jnp.sum(cls_occ, axis=(1, 2))
    return NearestField(px=px, py=py, valid=valid, n_class=n_class,
                        center=grid.center, resolution=resolution)


def pack_field(field: NearestField) -> jnp.ndarray:
    """Stack (px, py, valid) channel-last into one (2*G*G, 3) row table so a
    lookup is ONE row gather. Three separate per-channel gathers compile to
    three serialized gather fusions (~1 ms each at 16x4096 queries on v5e —
    47% of the whole ref-scale step inside the 20-iteration fit loop); the
    packed row gather pays the index walk once."""
    G = field.px.shape[-1]
    return jnp.stack([field.px, field.py,
                      field.valid.astype(field.px.dtype)],
                     axis=-1).reshape(2 * G * G, 3)


def _lookup_packed(table, G, center, resolution, q, q_ga):
    """lookup() against a pack_field table: (pt (S,2), ok) in one gather."""
    rel = q - center
    cxi = jnp.floor(rel[:, 0] / resolution).astype(jnp.int32) + G // 2
    cyi = jnp.floor(rel[:, 1] / resolution).astype(jnp.int32) + G // 2
    inb = (cxi >= 0) & (cyi >= 0) & (cxi < G) & (cyi < G)
    cxi = jnp.clip(cxi, 0, G - 1)
    cyi = jnp.clip(cyi, 0, G - 1)
    c = q_ga.astype(jnp.int32)
    row = table[(c * G + cxi) * G + cyi]                   # (S, 3)
    return row[:, :2], inb & (row[:, 2] > 0.5)


def lookup(field: NearestField, q: jnp.ndarray, q_ga: jnp.ndarray):
    """Per-query nearest map point of the query's class: (pt (S,2), ok)."""
    G = field.px.shape[-1]
    return _lookup_packed(pack_field(field), G, field.center,
                          field.resolution, q, q_ga)


def icp_fit_grid(scene_xyz, scene_valid, scene_ga, field: NearestField,
                 init_pose, cfg: IcpConfig) -> IcpResult:
    """ICP against the nearest-centroid field (replaces icp_fit when the
    target is the point-map grid). Matches Icp::fit semantics: <=20
    iterations, min_delta gate, per-class participation (a class with <=3
    model cells is inactive, icpPointToPoint.cpp:59,93), inlier squared-dist
    gate, no-correspondence freeze."""
    n_scene = jnp.sum(scene_valid)
    ok = (n_scene >= cfg.min_scene_points) & \
        (jnp.sum(field.n_class) >= 5)
    class_on = field.n_class > 3                      # (2,)
    participate = scene_valid & class_on[scene_ga.astype(jnp.int32)]
    # pack once OUTSIDE the iteration loop (don't rely on while-LICM)
    G = field.px.shape[-1]
    table = pack_field(field)

    def body(carry, _):
        pose, converged, num_corr, mean_res, delta = carry
        R = rot2(pose[2])
        q = scene_xyz @ R.T + pose[:2]
        m_pt, m_ok = _lookup_packed(table, G, field.center,
                                    field.resolution, q, scene_ga)
        d2 = jnp.sum((q - m_pt) ** 2, axis=-1)
        inlier = participate & m_ok & (d2 < cfg.inlier_dist)
        w = inlier.astype(q.dtype)
        dyaw, dt, wsum = procrustes_2d(q, m_pt, w)
        R_ = rot2(dyaw)
        new_pose = jnp.concatenate([R_ @ pose[:2] + dt,
                                    angle_wrap(pose[2] + dyaw)[None]])
        frob = jnp.sqrt(jnp.sum((R_ - jnp.eye(2)) ** 2))
        d = jnp.maximum(frob, jnp.sqrt(jnp.sum(dt ** 2)))
        nc = jnp.sum(inlier).astype(jnp.int32)
        mr = jnp.sum(w * d2) / jnp.maximum(wsum, 1e-12)
        has_corr = nc > 0
        new_pose = jnp.where(has_corr, new_pose, pose)
        d = jnp.where(has_corr, d, -1.0)
        stop = converged | (d < cfg.min_delta) | (d < 0)
        pose = jnp.where(converged, pose, new_pose)
        num_corr = jnp.where(converged, num_corr, nc)
        mean_res = jnp.where(converged, mean_res, mr)
        delta = jnp.where(converged, delta, d)
        return (pose, stop, num_corr, mean_res, delta), None

    init = (init_pose, ~ok, jnp.int32(0), jnp.float32(0.0), jnp.float32(jnp.inf))
    if cfg.loop == "while":
        # early exit: measured live iterations at ref-scale are 3-11 of 20
        # (min_delta hits quickly once the pose settles), so running only
        # until the batch converges roughly halves the fit-loop cost. Under
        # vmap the while batching rule keeps iterating while ANY robot is
        # live and per-lane selects freeze the rest — identical outputs to
        # the scan, which freezes converged lanes the same way.
        def w_cond(c):
            return (c[0] < cfg.max_iterations) & ~jnp.all(c[1][1])

        def w_body(c):
            i, carry = c
            carry, _ = body(carry, None)
            return (i + 1, carry)

        _, (pose, _, num_corr, mean_res, delta) = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), init))
    else:
        (pose, _, num_corr, mean_res, delta), _ = jax.lax.scan(
            body, init, None, length=cfg.max_iterations)
    pose = jnp.where(ok, pose, init_pose)
    return IcpResult(pose=pose, ok=ok & (num_corr > 0), num_corr=num_corr,
                     delta=delta, mean_residual=mean_res)
