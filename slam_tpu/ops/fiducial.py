"""Batched fiducial (AprilTag-equivalent) detection — TPU-native rebuild of
april_tag_detector/ (vendored Olson AprilTag C library, ~11k LoC).

Reference pipeline (april_tag_detector_detect, apriltag.c:998ff): gradient
segmentation (segment2.c) -> union-find components -> quad_search
(apriltag.c:376) -> homography refine (homography.c) -> payload decode vs
tag36h10/36h11 codebooks (decode_tag, apriltag.c:250) with a pthread
workerpool for parallel quad decode (workerpool.c).

TPU reformulation (everything batched over images, no pointer structures):
  1. adaptive threshold (box-mean) -> dark mask
  2. connected components: iterative min-label propagation over the mask
     (replaces union-find; K sweeps connect paths of length K)
  3. component table via label-hash scatter; moments (area, centroid,
     principal angle) via masked scatter-adds
  4. corners: per-(component, angular-quadrant-about-principal-axis)
     farthest-pixel extraction (two-pass scatter, exact)
  5. homography from the 4 corners (unit-square DLT, batched 8x8 solve —
     homography.c equivalent)
  6. payload sampling at cell centers by bilinear interpolation; black/white
     reference from the border ring; decode vs a codebook under 4 rotations
     with a Hamming acceptance gate (decode_tag equivalent)

The codebook is a parameter. The published tag36h11 (587 codes) and
tag36h10 (2320) families the reference matches against ship in
slam_tpu/data/tag_families.py (tables tag36h11.c/tag36h10.c) via the
tag36h11()/tag36h10() helpers, so the detector decodes physical AprilTags;
`make_codebook` additionally generates synthetic families for tests. The
reference's own ROS node is an empty stub (april_tag_detector.cpp:1-37),
so detector outputs are returned, not wired.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class FiducialConfig(NamedTuple):
    grid_dim: int = 8            # cells incl. 1-cell black border (6x6 payload)
    cc_iters: int = 16           # label sweeps (logarithmic via pointer jump)
    max_detections: int = 8      # per image
    min_area: int = 64           # component pixel-area gates
    max_area: int = 100000
    thresh_margin: float = 0.08  # adaptive threshold margin
    box: int = 15                # adaptive threshold window (odd)
    max_hamming: int = 2         # decode acceptance (AprilTag default)
    blur_sigma: float = 0.0      # optional pre-blur (seg_sigma, apriltag.c:1000)
    # morphological opening radius on the dark mask before CC: cuts dark
    # bridges (shadows, contact points) up to 2r+1 px wide that would merge
    # a tag border with touching clutter into one component — the role the
    # reference's gradient segmentation plays (segment2.c: clutter pixels
    # have different edge orientations and never join the border's
    # segments). Borders thinner than 2r+1 px are destroyed; at r=1 that
    # only affects tags < ~24 px wide, below min_area anyway.
    open_radius: int = 1
    # segmentation decimation (quad_decimate, apriltag.c:1000-1031): run
    # threshold/CC/corner extraction on a d-subsampled image, scale corners
    # back, decode at FULL resolution through the homography
    decimate: int = 1


class Detections(NamedTuple):
    tag_id: jnp.ndarray      # (Q,) int32, -1 if invalid
    corners: jnp.ndarray     # (Q, 4, 2) pixel coords (x=col, y=row), CCW
    center: jnp.ndarray      # (Q, 2)
    hamming: jnp.ndarray     # (Q,) int32
    valid: jnp.ndarray       # (Q,) bool


# ---------- codebooks ----------

def tag36h11() -> np.ndarray:
    """The published tag36h11 family (587, 36) — the codes physical AprilTags
    carry (reference table april_tag_detector/src/tag36h11.c)."""
    from slam_tpu.data.tag_families import tag36h11_codebook
    return tag36h11_codebook()


def tag36h10() -> np.ndarray:
    """The published tag36h10 family (2320, 36)
    (april_tag_detector/src/tag36h10.c)."""
    from slam_tpu.data.tag_families import tag36h10_codebook
    return tag36h10_codebook()


def make_codebook(seed: int, num_codes: int, bits: int = 36,
                  min_hamming: int = 10) -> np.ndarray:
    """Generate a tag family (K, bits) bool with pairwise Hamming separation
    >= min_hamming under all 4 rotations (the property tag36h11 guarantees;
    tag36h11's own table is drop-in compatible)."""
    side = int(np.sqrt(bits))
    assert side * side == bits
    rng = np.random.default_rng(seed)
    codes = []

    def rots(c):
        g = c.reshape(side, side)
        return [np.rot90(g, k).reshape(-1) for k in range(4)]

    while len(codes) < num_codes:
        cand = rng.random(bits) > 0.5
        ok = True
        for c in codes:
            for r in rots(cand):
                if np.sum(c != r) < min_hamming:
                    ok = False
                    break
            if not ok:
                break
        # also self-rotation distinctness (so rotation is unambiguous)
        for r in rots(cand)[1:]:
            if np.sum(cand != r) < min_hamming:
                ok = False
        if ok:
            codes.append(cand)
    return np.stack(codes)


# ---------- stage 1-2: threshold + connected components ----------

def _box_mean(img: jnp.ndarray, k: int) -> jnp.ndarray:
    """Separable box filter via cumulative sums (integral-image style)."""
    pad = k // 2

    def blur1d(a, axis):
        csum = jnp.cumsum(jnp.pad(a, [(pad + 1, pad) if ax == axis else (0, 0)
                                      for ax in range(a.ndim)]), axis=axis)
        hi = jax.lax.slice_in_dim(csum, k, k + a.shape[axis], axis=axis)
        lo = jax.lax.slice_in_dim(csum, 0, a.shape[axis], axis=axis)
        return (hi - lo) / k

    return blur1d(blur1d(img, 0), 1)


def _erode(mask: jnp.ndarray, r: int) -> jnp.ndarray:
    """r iterations of 3x3 (8-neighborhood) binary erosion."""
    for _ in range(r):
        p = jnp.pad(mask, 1, constant_values=False)
        m = p[1:-1, 1:-1]
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                m = m & p[1 + di:p.shape[0] - 1 + di,
                          1 + dj:p.shape[1] - 1 + dj]
        mask = m
    return mask


def _dilate(mask: jnp.ndarray, r: int) -> jnp.ndarray:
    """r iterations of 3x3 binary dilation."""
    for _ in range(r):
        p = jnp.pad(mask, 1, constant_values=False)
        m = p[1:-1, 1:-1]
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                m = m | p[1 + di:p.shape[0] - 1 + di,
                          1 + dj:p.shape[1] - 1 + dj]
        mask = m
    return mask


def connected_components(mask: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Min-label propagation with pointer jumping: labels (H, W) int32;
    background = -1.

    Each sweep takes the 4-neighbor minimum (local propagation) then jumps
    every label to its label's label (union-find path halving) — convergence
    is logarithmic in component geodesic diameter, so ~16 sweeps handle the
    ring-shaped tag borders a linear sweep count would split (a perimeter-P
    ring needs P/2 linear sweeps)."""
    H, W = mask.shape
    sentinel = jnp.int32(H * W)
    init = jnp.where(mask,
                     jnp.arange(H * W, dtype=jnp.int32).reshape(H, W),
                     sentinel)

    def sweep(lab, _):
        p = jnp.pad(lab, 1, constant_values=sentinel)
        neigh = jnp.minimum(
            jnp.minimum(p[:-2, 1:-1], p[2:, 1:-1]),
            jnp.minimum(p[1:-1, :-2], p[1:-1, 2:]))
        new = jnp.where(mask, jnp.minimum(lab, neigh), sentinel)
        # pointer jumps: label <- label at the pixel the label names. Two
        # jumps per sweep give true log-diameter convergence: a 600-px
        # perimeter ring (160-px tag border) converges in 8 sweeps, where
        # one jump per sweep needed >16 (the round-1 cc_iters trap).
        for _ in range(2):
            flat = jnp.concatenate([new.reshape(-1), sentinel[None]])
            jumped = flat[new.reshape(-1)].reshape(H, W)
            new = jnp.where(mask, jnp.minimum(new, jumped), sentinel)
        return new, None

    lab, _ = jax.lax.scan(sweep, init, None, length=iters)
    return jnp.where(mask, lab, -1)


# ---------- stage 3-4: components, moments, corners ----------

def _component_table(labels: jnp.ndarray, num_slots: int):
    """Hash components into fixed slots: slot owner = min label hashing there.
    Returns (per-pixel slot or num_slots, slot_owner_label (num_slots,))."""
    flat = labels.reshape(-1)
    valid = flat >= 0
    h = jnp.where(valid, flat % num_slots, num_slots)
    owner = jnp.full((num_slots + 1,), jnp.iinfo(jnp.int32).max,
                     jnp.int32).at[h].min(jnp.where(valid, flat, jnp.iinfo(jnp.int32).max))
    mine = valid & (owner[h] == flat)
    return jnp.where(mine, h, num_slots), owner[:num_slots]


def detect_tags(img: jnp.ndarray, codebook: jnp.ndarray,
                cfg: FiducialConfig = FiducialConfig()) -> Detections:
    """Detect tags in one grayscale image (H, W) in [0, 1]; vmap over batch."""
    H, W = img.shape
    Q = cfg.max_detections
    T = 4 * Q  # hash slots (headroom for clutter components)

    if cfg.blur_sigma > 0:
        # separable 5-tap Gaussian (the reference's seg_sigma pre-blur,
        # apriltag.c:1000-1060) — knocks down sensor noise before threshold
        t = jnp.exp(-0.5 * (jnp.arange(-2.0, 3.0) / cfg.blur_sigma) ** 2)
        t = t / jnp.sum(t)
        pad = jnp.pad(img, 2, mode="edge")
        img_s = sum(t[i] * pad[i:i + H, 2:2 + W] for i in range(5))
        img_s = sum(t[i] * jnp.pad(img_s, ((0, 0), (2, 2)), mode="edge")
                    [:, i:i + W] for i in range(5))
    else:
        img_s = img

    # segmentation decimation (apriltag.c:1000-1031): stages 1-4 run at
    # 1/d resolution; the decode below always samples the FULL-res image
    d = max(1, cfg.decimate)
    seg_img = img_s[::d, ::d] if d > 1 else img_s
    Hs, Ws = seg_img.shape
    area_scale = float(d * d)

    mean = _box_mean(seg_img, cfg.box)
    dark = seg_img < (mean - cfg.thresh_margin)
    if cfg.open_radius > 0:
        # opening: cuts <=2r+1 px dark bridges between a tag border and
        # touching clutter (shadows, contact) so they stay separate
        # components; large shapes come back to size under the dilation
        dark = _dilate(_erode(dark, cfg.open_radius), cfg.open_radius)
    labels = connected_components(dark, cfg.cc_iters)
    slot_pp, _ = _component_table(labels, T)               # (Hs*Ws,)
    H, W = Hs, Ws  # stages 3-4 operate in decimated coordinates

    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(-1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(-1)
    is_comp = slot_pp < T
    w = is_comp.astype(jnp.float32)

    def scat(v):
        return jnp.zeros((T + 1,), jnp.float32).at[slot_pp].add(v)[:T]

    area = scat(w)
    cx = scat(w * xx) / jnp.maximum(area, 1.0)
    cy = scat(w * yy) / jnp.maximum(area, 1.0)
    slot_c = jnp.minimum(slot_pp, T - 1)

    pix_idx = jnp.arange(H * W, dtype=jnp.int32)

    def argmax_per_slot(value):
        """Exact per-component argmax pixel (two-pass scatter)."""
        best = jnp.full((T + 1,), -jnp.inf, jnp.float32).at[slot_pp].max(
            jnp.where(is_comp, value, -jnp.inf))
        hit = is_comp & (value >= best[slot_pp] - 1e-5)
        pick = jnp.full((T + 1,), H * W, jnp.int32).at[slot_pp].min(
            jnp.where(hit, pix_idx, H * W))[:T]
        safe = jnp.minimum(pick, H * W - 1)
        return pick < H * W, xx[safe], yy[safe]

    # convex-quad corner construction (robust where moment axes degenerate on
    # squares): c0 = farthest from centroid; c2 = farthest from c0; c1/c3 =
    # extreme signed-cross points either side of the diagonal c0->c2
    dx0 = xx - cx[slot_c]
    dy0 = yy - cy[slot_c]
    ok0, c0x, c0y = argmax_per_slot(dx0 * dx0 + dy0 * dy0)
    d0x = xx - c0x[slot_c]
    d0y = yy - c0y[slot_c]
    ok2, c2x, c2y = argmax_per_slot(d0x * d0x + d0y * d0y)
    ex = (c2x - c0x)[slot_c]
    ey = (c2y - c0y)[slot_c]
    cross = ex * d0y - ey * d0x
    # negative-cross side first: matches the unit-square winding used by the
    # homography (x right, y down); the opposite order mirrors the payload,
    # which rotation-matching cannot recover
    ok1, c1x, c1y = argmax_per_slot(-cross)
    ok3, c3x, c3y = argmax_per_slot(cross)
    corner_ok = jnp.stack([ok0, ok1, ok2, ok3], axis=1)
    corners = jnp.stack([
        jnp.stack([c0x, c0y], -1), jnp.stack([c1x, c1y], -1),
        jnp.stack([c2x, c2y], -1), jnp.stack([c3x, c3y], -1)], axis=1)

    # degenerate-quad gate: both off-diagonal corners must be well off the
    # c0->c2 diagonal (a line/blob is not a quad)
    diag2 = (c2x - c0x) ** 2 + (c2y - c0y) ** 2
    off1 = jnp.abs((c2x - c0x) * (c1y - c0y) - (c2y - c0y) * (c1x - c0x))
    off3 = jnp.abs((c2x - c0x) * (c3y - c0y) - (c2y - c0y) * (c3x - c0x))
    not_flat = (off1 > 0.1 * diag2) & (off3 > 0.1 * diag2)

    good = (area >= cfg.min_area / area_scale) & \
        (area <= cfg.max_area / area_scale) & \
        jnp.all(corner_ok, axis=1) & not_flat

    # keep top-Q components by area
    score = jnp.where(good, area, -1.0)
    top_area, top_idx = jax.lax.top_k(score, Q)
    sel_ok = top_area > 0
    # back to full-resolution coordinates for the decode sampling
    sel_corners = corners[top_idx] * d                     # (Q, 4, 2)
    sel_center = jnp.stack([cx[top_idx], cy[top_idx]], -1) * d

    tag_id, hamming, dec_ok = jax.vmap(
        lambda c: _decode_quad(img, c, codebook, cfg))(sel_corners)
    valid = sel_ok & dec_ok
    return Detections(tag_id=jnp.where(valid, tag_id, -1),
                      corners=sel_corners, center=sel_center,
                      hamming=hamming, valid=valid)


# ---------- stage 5-6: homography + decode ----------

def homography_from_corners(corners: jnp.ndarray) -> jnp.ndarray:
    """DLT homography mapping unit square (0,0),(1,0),(1,1),(0,1) -> corners
    (homography.c equivalent). corners: (4, 2) CCW."""
    src = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])

    def rows(s, d):
        x, y = s
        u, v = d
        return jnp.array([
            [x, y, 1, 0, 0, 0, -u * x, -u * y],
            [0, 0, 0, x, y, 1, -v * x, -v * y],
        ]), jnp.array([u, v])

    A = jnp.concatenate([rows(src[i], corners[i])[0] for i in range(4)], 0)
    b = jnp.concatenate([rows(src[i], corners[i])[1] for i in range(4)], 0)
    sol = jnp.linalg.solve(A + 1e-9 * jnp.eye(8), b)
    return jnp.concatenate([sol, jnp.ones(1)]).reshape(3, 3)


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def _decode_quad(img, corners, codebook, cfg: FiducialConfig):
    """Sample the tag grid through the homography and match the codebook
    under 4 rotations (decode_tag, apriltag.c:250 equivalent)."""
    D = cfg.grid_dim
    side = D - 2
    Hm = homography_from_corners(corners)

    def project(u, v):
        p = Hm @ jnp.stack([u, v, jnp.ones_like(u)])
        return p[0] / p[2], p[1] / p[2]

    # payload cell centers (inside the 1-cell black border)
    ii = (jnp.arange(side) + 1.5) / D
    uu, vv = jnp.meshgrid(ii, ii, indexing="xy")
    px, py = project(uu.reshape(-1), vv.reshape(-1))
    vals = _bilinear(img, px, py)

    # black reference: border cell centers; white reference: just outside.
    # Fit linear gray models black(u,v), white(u,v) over the samples (the
    # reference's graymodel, apriltag.c:798-803) so an illumination gradient
    # across the tag moves the per-cell threshold with it.
    jb = (jnp.arange(D) + 0.5) / D
    bu = jnp.concatenate([jb, jb, jnp.full(D, 0.5 / D), jnp.full(D, 1 - 0.5 / D)])
    bv = jnp.concatenate([jnp.full(D, 0.5 / D), jnp.full(D, 1 - 0.5 / D), jb, jb])
    bx, by = project(bu, bv)
    black_vals = _bilinear(img, bx, by)
    wu, wv = bu * 1.25 - 0.125, bv * 1.25 - 0.125
    wx, wy = project(wu, wv)
    white_vals = _bilinear(img, wx, wy)

    def fit_plane(u, v, w):
        A = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)        # (M, 3)
        AtA = A.T @ A + 1e-6 * jnp.eye(3)
        return jnp.linalg.solve(AtA, A.T @ w)                   # (3,)

    cb = fit_plane(bu, bv, black_vals)
    cw = fit_plane(wu, wv, white_vals)
    uv1 = jnp.stack([uu.reshape(-1), vv.reshape(-1),
                     jnp.ones(side * side)], axis=-1)           # (cells, 3)
    black_c = uv1 @ cb
    white_c = uv1 @ cw
    thresh = 0.5 * (black_c + white_c)
    black = jnp.mean(black_vals)
    white = jnp.mean(white_vals)
    bits = (vals > thresh)                                  # (side*side,) white=1

    grid = bits.reshape(side, side)
    best_id = jnp.int32(-1)
    best_ham = jnp.int32(99)
    for k in range(4):
        g = jnp.rot90(grid, k).reshape(-1)
        ham = jnp.sum(g[None, :] != codebook, axis=1)       # (K,)
        i = jnp.argmin(ham)
        h = ham[i].astype(jnp.int32)
        take = h < best_ham
        best_id = jnp.where(take, i.astype(jnp.int32), best_id)
        best_ham = jnp.where(take, h, best_ham)
    contrast_ok = (white - black) > 0.15
    ok = (best_ham <= cfg.max_hamming) & contrast_ok
    return best_id, best_ham, ok


# ---------- test-support renderer ----------

def render_tag(code: jnp.ndarray, corners: jnp.ndarray, H: int, W: int,
               grid_dim: int = 8, bg: float = 0.9) -> jnp.ndarray:
    """Render a tag (white bg, black border, payload cells) whose OUTER border
    corners are `corners`, by inverse-homography lookup per pixel."""
    side = grid_dim - 2
    Hm = homography_from_corners(corners)
    Hi = jnp.linalg.inv(Hm)
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    p = jnp.einsum("ij,jhw->ihw", Hi,
                   jnp.stack([xx, yy, jnp.ones_like(xx)]))
    u = p[0] / p[2]
    v = p[1] / p[2]
    inside = (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
    cu = jnp.clip((u * grid_dim).astype(jnp.int32), 0, grid_dim - 1)
    cv = jnp.clip((v * grid_dim).astype(jnp.int32), 0, grid_dim - 1)
    border = (cu == 0) | (cv == 0) | (cu == grid_dim - 1) | (cv == grid_dim - 1)
    pu = jnp.clip(cu - 1, 0, side - 1)
    pv = jnp.clip(cv - 1, 0, side - 1)
    cell = code.reshape(side, side)[pv, pu]
    color = jnp.where(border, 0.05,
                      jnp.where(cell, 0.95, 0.05))
    return jnp.where(inside, color, bg)
