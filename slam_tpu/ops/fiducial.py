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
    # segmentation engine: "cc" = dark-component threshold path (fast);
    # "gradient" = direction-clustered edge segments + quad search (the
    # reference's own pipeline shape, segment2.c + apriltag.c:376 — robust
    # to wide dark-clutter contact)
    segmenter: str = "cc"
    # gradient-segmentation path (detect_tags_gradient — segment2.c role)
    grad_mag_thresh: float = 0.12  # edge gate on |grad| (image in [0, 1])
    grad_angle_tol: float = 0.3    # neighbor join tolerance [rad]: tight
    #   enough that direction drift around a blurred corner cuts the chain
    grad_coherence: float = 0.8    # 5x5 direction-coherence gate that cuts
    #   corner pixels so sides cannot transitively merge
    min_seg_pixels: int = 8        # segment validity gates
    min_seg_len: float = 8.0       # [px at the decimated scale]
    quad_join_dist: float = 14.0   # endpoint chaining distance [px]
    # collinear re-join across occlusion/contact gaps: looser than corner
    # chaining (direction + lateral-offset gates make long bridges safe)
    collinear_join_dist: float = 26.0


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


def _gauss5(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable 5-tap Gaussian (the reference's seg_sigma pre-blur,
    apriltag.c:1000-1060)."""
    H, W = img.shape
    t = jnp.exp(-0.5 * (jnp.arange(-2.0, 3.0) / sigma) ** 2)
    t = t / jnp.sum(t)
    pad = jnp.pad(img, 2, mode="edge")
    out = sum(t[i] * pad[i:i + H, 2:2 + W] for i in range(5))
    out = sum(t[i] * jnp.pad(out, ((0, 0), (2, 2)), mode="edge")
              [:, i:i + W] for i in range(5))
    return out


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

def detect_tags(img: jnp.ndarray, codebook: jnp.ndarray,
                cfg: FiducialConfig = FiducialConfig()) -> Detections:
    """Detect tags in one grayscale image (H, W) in [0, 1]; vmap over batch.

    cfg.segmenter selects the engine: "cc" (dark components, below) or
    "gradient" (detect_tags_gradient — the reference's segment2.c shape)."""
    if cfg.segmenter == "gradient":
        return detect_tags_gradient(img, codebook, cfg)
    H, W = img.shape
    Q = cfg.max_detections
    T = 4 * Q  # hash slots (headroom for clutter components)

    img_s = _gauss5(img, cfg.blur_sigma) if cfg.blur_sigma > 0 else img

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
    # exact top-T-by-size slots (a hash table here dropped whole components
    # on collision: >T dark blobs guaranteed one by pigeonhole, and a tag
    # colliding with a smaller-label clutter blob simply vanished)
    slot_pp, _ = _component_slots_topk(labels, T)          # (Hs*Ws,)
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


# ---------- gradient segmentation + quad search (segment2.c role) ----------

def _grad(img: jnp.ndarray):
    """Central-difference gradients (gx toward +x/cols, gy toward +y/rows)."""
    gy = jnp.zeros_like(img).at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    gx = jnp.zeros_like(img).at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    return gx, gy


def _ang_close(ta, tb, tol_cos: float):
    """|angle(ta - tb)| < tol via cos(ta - tb) > tol_cos (no wrapping)."""
    return jnp.cos(ta - tb) > tol_cos


def connected_components_directed(mask: jnp.ndarray, theta: jnp.ndarray,
                                  iters: int, tol_cos: float) -> jnp.ndarray:
    """Min-label propagation where neighbors join only when their gradient
    directions agree within tol (the union-find criterion of the reference's
    gradient segmentation, segment2.c: edges cluster by direction, so a tag
    border never merges with clutter whose edges point elsewhere)."""
    H, W = mask.shape
    sentinel = jnp.int32(H * W)
    init = jnp.where(mask,
                     jnp.arange(H * W, dtype=jnp.int32).reshape(H, W),
                     sentinel)
    pt = jnp.pad(theta, 1)
    pm = jnp.pad(mask, 1, constant_values=False)

    def shift(a, di, dj):
        return a[1 + di:a.shape[0] - 1 + di, 1 + dj:a.shape[1] - 1 + dj]

    # static neighbor-connection masks (4-neighborhood)
    conns = []
    for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        ok = mask & shift(pm, di, dj) & _ang_close(theta, shift(pt, di, dj),
                                                   tol_cos)
        conns.append(((di, dj), ok))

    def sweep(lab, _):
        p = jnp.pad(lab, 1, constant_values=sentinel)
        new = lab
        for (di, dj), ok in conns:
            cand = jnp.where(ok, shift(p, di, dj), sentinel)
            new = jnp.minimum(new, cand)
        new = jnp.where(mask, new, sentinel)
        for _ in range(2):  # pointer jumps (path halving)
            flat = jnp.concatenate([new.reshape(-1), sentinel[None]])
            jumped = flat[new.reshape(-1)].reshape(H, W)
            new = jnp.where(mask, jnp.minimum(new, jumped), sentinel)
        return new, None

    lab, _ = jax.lax.scan(sweep, init, None, length=iters)
    return jnp.where(mask, lab, -1)


def _component_slots_topk(labels: jnp.ndarray, K: int):
    """Exact top-K-by-size component slots (no hash collisions: labels are
    min-pixel-indices, so a full (H*W,) count array indexes them directly).
    Returns (per-pixel slot in [0, K] with K = none, slot pixel counts)."""
    HW = labels.shape[0] * labels.shape[1]
    flat = labels.reshape(-1)
    safe = jnp.where(flat >= 0, flat, HW)
    counts = jnp.zeros(HW + 1, jnp.float32).at[safe].add(1.0)
    top_c, top_lab = jax.lax.top_k(counts[:HW], K)
    slot_of = jnp.full(HW + 1, K, jnp.int32).at[top_lab].set(
        jnp.arange(K, dtype=jnp.int32))
    # labels that are empty (count 0) may appear in top_k tail: invalidate
    slot_pp = jnp.where((flat >= 0) & (top_c[jnp.minimum(
        slot_of[safe], K - 1)] > 0), slot_of[safe], K)
    return slot_pp, top_c


def _line_intersect(p0, d0, p1, d1):
    """Intersection of lines p0 + t d0 and p1 + s d1 (batched over leading
    dims); parallel pairs fall back to the endpoint midpoint."""
    # solve [d0, -d1] [t, s]^T = p1 - p0
    det = d0[..., 0] * (-d1[..., 1]) - (-d1[..., 0]) * d0[..., 1]
    rhs = p1 - p0
    t = (rhs[..., 0] * (-d1[..., 1]) - (-d1[..., 0]) * rhs[..., 1]) / \
        jnp.where(jnp.abs(det) < 1e-6, 1.0, det)
    inter = p0 + t[..., None] * d0
    mid = 0.5 * (p0 + p1)
    return jnp.where((jnp.abs(det) < 1e-6)[..., None], mid, inter)


def detect_tags_gradient(img: jnp.ndarray, codebook: jnp.ndarray,
                         cfg: FiducialConfig = FiducialConfig()) -> Detections:
    """Gradient-segmentation detector — the reference's own pipeline shape
    (segment2.c -> quad_search, apriltag.c:376) rebuilt batched:

      1. gradient magnitude/direction; edge mask
      2. direction-constrained connected components (edge pixels join only
         within an angular tolerance) -> one component per tag SIDE
      3. per-segment weighted line fit: centroid + principal direction +
         extremal endpoints (two-pass scatter argmax), oriented so the dark
         side is on the segment's LEFT (gradient 90deg clockwise of travel)
      4. collinear merge of split segments (clutter contact / occlusion
         gaps), then endpoint chaining: connect[i, j] when segment i's end
         meets segment j's start and the turn is a left turn
      5. 4-cycles of the connection graph are candidate quads; corners are
         consecutive line intersections; decode as usual

    Slower than detect_tags' dark-component path but robust where a tag
    border CONTACTS dark clutter over a wide area: clutter edge pixels point
    in other directions and never join the border's segments."""
    H0, W0 = img.shape
    Q = cfg.max_detections
    T = 64   # exact top-T components by size (no hash collisions)
    K = 32   # strongest segments kept for the quad search

    d = max(1, cfg.decimate)
    seg_img = img[::d, ::d] if d > 1 else img
    H, W = seg_img.shape

    # the gradient path ALWAYS low-passes first: hard rendered/thresholded
    # edges are staircases whose per-pixel gradient directions alternate
    # between the axes, fragmenting direction-clustered components (the
    # reference likewise runs segmentation on the seg_sigma-blurred image)
    seg_img = _gauss5(seg_img, max(cfg.blur_sigma, 0.8))
    gx, gy = _grad(seg_img)
    mag2 = gx * gx + gy * gy
    edge = mag2 > (cfg.grad_mag_thresh ** 2)
    theta = jnp.arctan2(gy, gx)

    # cut CORNER pixels before clustering: at a blurred corner the gradient
    # direction rotates smoothly, so neighbor-tolerance clustering would
    # chain adjacent sides into one component (transitive drift — the
    # reference bounds each component's direction RANGE instead,
    # segment2.c). Local direction coherence |sum u|^2 / count^2 over a 5x5
    # window is 1 on straight edges and ~0.5 where two orthogonal sides
    # meet; dropping low-coherence pixels severs the sides at every corner.
    ux = jnp.where(edge, jnp.cos(theta), 0.0)
    uy = jnp.where(edge, jnp.sin(theta), 0.0)

    def box5(a):
        p = jnp.pad(a, 2)
        out = jnp.zeros_like(a)
        for di in range(5):
            for dj in range(5):
                out = out + p[di:di + a.shape[0], dj:dj + a.shape[1]]
        return out

    sx_ = box5(ux)
    sy_ = box5(uy)
    cnt5 = jnp.maximum(box5(edge.astype(jnp.float32)), 1.0)
    coh = (sx_ * sx_ + sy_ * sy_) / (cnt5 * cnt5)
    edge = edge & (coh > cfg.grad_coherence)

    labels = connected_components_directed(edge, theta, cfg.cc_iters,
                                           jnp.cos(cfg.grad_angle_tol))
    slot_pp, _ = _component_slots_topk(labels, T)

    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(-1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(-1)
    is_seg = slot_pp < T
    w = jnp.where(is_seg, jnp.sqrt(mag2).reshape(-1), 0.0)

    def scat(v):
        return jnp.zeros((T + 1,), jnp.float32).at[slot_pp].add(v)[:T]

    wsum = jnp.maximum(scat(w), 1e-6)
    cx = scat(w * xx) / wsum
    cy = scat(w * yy) / wsum
    npix = scat(jnp.where(is_seg, 1.0, 0.0))
    # principal direction from weighted second moments
    slot_c = jnp.minimum(slot_pp, T - 1)
    rx = xx - cx[slot_c]
    ry = yy - cy[slot_c]
    sxx = scat(w * rx * rx)
    sxy = scat(w * rx * ry)
    syy = scat(w * ry * ry)
    ang = 0.5 * jnp.arctan2(2.0 * sxy, sxx - syy)
    dirx = jnp.cos(ang)
    diry = jnp.sin(ang)

    # orient travel so the mean gradient points 90deg LEFT of travel in
    # image coords (y down): for a dark tag on light ground, traversing the
    # border counter-clockwise on screen keeps dark inside. left-of-travel
    # normal (y down) = (dy, -dx).
    mgx = scat(w * jnp.cos(theta).reshape(-1) * jnp.where(is_seg, 1.0, 0.0))
    mgy = scat(w * jnp.sin(theta).reshape(-1) * jnp.where(is_seg, 1.0, 0.0))
    flip = (diry * mgx - dirx * mgy) < 0.0
    dirx = jnp.where(flip, -dirx, dirx)
    diry = jnp.where(flip, -diry, diry)

    # extremal endpoints along the travel direction (exact per-slot argmax)
    pix_idx = jnp.arange(H * W, dtype=jnp.int32)

    def argmax_per_slot(value):
        best = jnp.full((T + 1,), -jnp.inf, jnp.float32).at[slot_pp].max(
            jnp.where(is_seg, value, -jnp.inf))
        hit = is_seg & (value >= best[slot_pp] - 1e-5)
        pick = jnp.full((T + 1,), H * W, jnp.int32).at[slot_pp].min(
            jnp.where(hit, pix_idx, H * W))[:T]
        safe = jnp.minimum(pick, H * W - 1)
        return xx[safe], yy[safe]

    t_along = dirx[slot_c] * rx + diry[slot_c] * ry
    e1x, e1y = argmax_per_slot(t_along)       # forward end
    e0x, e0y = argmax_per_slot(-t_along)      # start
    length = jnp.sqrt((e1x - e0x) ** 2 + (e1y - e0y) ** 2)
    seg_ok = (npix >= cfg.min_seg_pixels) & (length >= cfg.min_seg_len)

    # compact: keep the K longest valid segments (the chain/cycle tensors
    # below are O(K^2)/O(K^4) — K stays small, slots can be many)
    klen, kidx = jax.lax.top_k(jnp.where(seg_ok, length, -1.0), K)
    seg_ok = klen > 0
    length = jnp.maximum(klen, 0.0)
    cx, cy = cx[kidx], cy[kidx]
    p0 = jnp.stack([e0x[kidx], e0y[kidx]], -1)          # (K, 2)
    p1 = jnp.stack([e1x[kidx], e1y[kidx]], -1)
    dvec = jnp.stack([dirx[kidx], diry[kidx]], -1)
    T = K  # the graph stages below index the compacted set

    # --- collinear merge: a side split by a contact gap rejoins when the
    # forward end of i meets the start of j with matching direction AND a
    # small lateral offset (so the parallel inner/outer border edges,
    # ~border-width apart, can never merge) ---
    join = cfg.quad_join_dist
    dd = jnp.sum(dvec[:, None, :] * dvec[None, :, :], -1)     # (T, T) cos
    gvec = p0[None, :, :] - p1[:, None, :]                    # (T, T, 2)
    gap = jnp.linalg.norm(gvec, axis=-1)
    lateral = jnp.abs(dvec[:, None, 0] * gvec[..., 1] -
                      dvec[:, None, 1] * gvec[..., 0])
    colin = seg_ok[:, None] & seg_ok[None, :] & (dd > 0.95) & \
        (gap < cfg.collinear_join_dist) & (lateral < 3.0) & \
        ~jnp.eye(T, dtype=bool)
    # j must EXTEND i (its end projects beyond i's end): makes the
    # successor relation acyclic, so two short mutually-collinear fragments
    # can't absorb each other and both die
    progress = jnp.sum(dvec[:, None, :] * (p1[None, :, :] - p1[:, None, :]),
                       -1)
    colin = colin & (progress > 0.0)
    # multi-link chain absorb: follow each segment's NEAREST collinear
    # successor to the chain terminal by pointer doubling (single-link
    # absorption lost the far extent of a side split into 3+ fragments:
    # the middle fragment died before passing its extension on)
    has_next = jnp.any(colin, axis=1)
    nxt = jnp.where(has_next,
                    jnp.argmin(jnp.where(colin, gap, jnp.inf), axis=1),
                    jnp.arange(T))
    f = nxt
    for _ in range(max(1, T.bit_length())):
        f = f[f]
    p1 = p1[f]                                # chain-terminal forward end
    seg_ok = seg_ok & ~jnp.any(colin, axis=0)  # heads survive
    # lengths grew by the absorbed extent: the chaining budget below
    # (join_ij scales with length) must see the merged length
    length = jnp.linalg.norm(p1 - p0, axis=-1)

    # --- endpoint chaining: i -> j when i's end meets j's start with a
    # LEFT turn (consistent winding). The allowed endpoint gap scales with
    # the segments' lengths (the reference's quad search budgets gap by
    # segment length too) so a side truncated by occlusion/contact still
    # chains — the corner comes from the LINE INTERSECTION, so accuracy
    # does not degrade with the gap. ---
    gap2 = jnp.linalg.norm(p0[None, :, :] - p1[:, None, :], axis=-1)
    join_ij = join + 0.35 * (length[:, None] + length[None, :])
    crossd = dvec[:, None, 0] * dvec[None, :, 1] - \
        dvec[:, None, 1] * dvec[None, :, 0]
    connect = seg_ok[:, None] & seg_ok[None, :] & (gap2 < join_ij) & \
        (crossd > 0.05) & ~jnp.eye(T, dtype=bool)

    # --- 4-cycle search over the (T, T) connection graph ---
    # enumerate i<j,k,l cycles via the boolean tensor product: cand[i,j,k,l]
    c2 = connect[:, :, None] & connect[None, :, :]            # i->j->k
    cand = c2[:, :, :, None] & connect[None, None, :, :]      # i->j->k->l
    cyc = cand & connect.T[:, None, None, :]                  # l->i closes
    # dedup: require i the smallest index in the cycle
    ii = jnp.arange(T)
    least = (ii[:, None, None, None] < ii[None, :, None, None]) & \
        (ii[:, None, None, None] < ii[None, None, :, None]) & \
        (ii[:, None, None, None] < ii[None, None, None, :])
    cyc = cyc & least
    flat = cyc.reshape(-1)
    score_len = (length[:, None, None, None] + length[None, :, None, None] +
                 length[None, None, :, None] +
                 length[None, None, None, :]).reshape(-1)
    qscore = jnp.where(flat, score_len, -1.0)
    top_s, top_i = jax.lax.top_k(qscore, Q)
    sel_ok = top_s > 0
    i0 = top_i // (T * T * T)
    i1 = (top_i // (T * T)) % T
    i2 = (top_i // T) % T
    i3 = top_i % T

    # corners: consecutive line intersections (side i meets side j at the
    # shared corner), scaled back to full resolution
    def corner(a, b):
        return _line_intersect(
            jnp.stack([cx[a], cy[a]], -1), dvec[a],
            jnp.stack([cx[b], cy[b]], -1), dvec[b])

    q01 = corner(i0, i1)
    q12 = corner(i1, i2)
    q23 = corner(i2, i3)
    q30 = corner(i3, i0)
    # winding: sides traversed i0->i1->i2->i3 with left turns puts corners
    # in the border-traversal order; decode expects the same winding as the
    # dark-component path (negative-cross first), which this matches
    corners = jnp.stack([q30, q01, q12, q23], axis=1) * d     # (Q, 4, 2)
    center = jnp.mean(corners, axis=1)

    # sanity gates: finite, inside the image, non-degenerate area
    finite = jnp.all(jnp.isfinite(corners), axis=(1, 2))
    inb = jnp.all((corners[..., 0] >= -4) & (corners[..., 0] <= W0 + 4) &
                  (corners[..., 1] >= -4) & (corners[..., 1] <= H0 + 4),
                  axis=1)
    e1 = corners[:, 1] - corners[:, 0]
    e2 = corners[:, 2] - corners[:, 0]
    area2 = jnp.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    sel_ok = sel_ok & finite & inb & (area2 * 0.5 >= cfg.min_area / 2)

    tag_id, hamming, dec_ok = jax.vmap(
        lambda c: _decode_quad(img, c, codebook, cfg))(corners)
    valid = sel_ok & dec_ok
    return Detections(tag_id=jnp.where(valid, tag_id, -1),
                      corners=corners, center=center,
                      hamming=hamming, valid=valid)


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
