"""Fiducial (AprilTag-equivalent) detection tests: render -> detect roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.ops.fiducial import (Detections, FiducialConfig, detect_tags,
                                   homography_from_corners, make_codebook,
                                   render_tag)


@pytest.fixture(scope="module")
def codebook():
    return jnp.array(make_codebook(seed=0, num_codes=16))


def _square(cx, cy, half, angle=0.0):
    base = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], np.float32) * half
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s], [s, c]], np.float32)
    return jnp.array(base @ R.T + np.array([cx, cy], np.float32))


def test_homography_maps_unit_square():
    corners = _square(60, 70, 25, 0.3)
    H = homography_from_corners(corners)
    src = jnp.array([[0.0, 0.0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]])
    proj = (src @ H.T)
    proj = proj[:, :2] / proj[:, 2:3]
    np.testing.assert_allclose(np.asarray(proj), np.asarray(corners),
                               atol=1e-3)


def test_render_detect_roundtrip(codebook):
    cfg = FiducialConfig(min_area=100, cc_iters=64)
    tag = 5
    corners = _square(64, 64, 28, angle=0.2)
    img = render_tag(codebook[tag], corners, 128, 128)
    det = detect_tags(img, codebook, cfg)
    v = np.asarray(det.valid)
    assert v.any(), "tag not detected"
    ids = np.asarray(det.tag_id)[v]
    assert tag in ids, f"wrong id: {ids}"
    # detected center near the true center
    k = int(np.where(v)[0][np.asarray(ids == tag).argmax()])
    np.testing.assert_allclose(np.asarray(det.center[k]), [64, 64], atol=4)


def test_multiple_tags_and_batching(codebook):
    cfg = FiducialConfig(min_area=100, cc_iters=64)
    img1 = render_tag(codebook[2], _square(40, 40, 20), 160, 160)
    tag2 = render_tag(codebook[9], _square(115, 110, 22, 0.5), 160, 160)
    img1 = jnp.minimum(img1, tag2)
    img2 = render_tag(codebook[11], _square(80, 80, 30, -0.4), 160, 160)
    batch = jnp.stack([img1, img2])
    det = jax.jit(jax.vmap(lambda im: detect_tags(im, codebook, cfg)))(batch)
    ids0 = set(np.asarray(det.tag_id[0])[np.asarray(det.valid[0])].tolist())
    ids1 = set(np.asarray(det.tag_id[1])[np.asarray(det.valid[1])].tolist())
    assert {2, 9} <= ids0, ids0
    assert 11 in ids1, ids1


def test_no_false_positives_on_noise(codebook):
    cfg = FiducialConfig(min_area=100)
    rng = np.random.default_rng(0)
    img = jnp.array(rng.uniform(0.3, 1.0, (128, 128)).astype(np.float32))
    det = detect_tags(img, codebook, cfg)
    assert not bool(det.valid.any())


def test_codebook_hamming_separation():
    cb = make_codebook(seed=1, num_codes=8, min_hamming=10)
    side = 6
    for i in range(8):
        for j in range(8):
            for k in range(4):
                r = np.rot90(cb[j].reshape(side, side), k).reshape(-1)
                d = (cb[i] != r).sum()
                if i == j and k == 0:
                    continue
                assert d >= 10, (i, j, k, d)
