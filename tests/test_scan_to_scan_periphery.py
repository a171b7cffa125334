"""Scan-to-scan registration mode + the full periphery chain
(fiducial detection -> camera calibration -> sample map)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu import calib
from slam_tpu.config import SampleMapConfig, sim2d_config
from slam_tpu.mapping.sample_map import (add_sample, extract_samples,
                                         init_sample_map)
from slam_tpu.ops.fiducial import (FiducialConfig, detect_tags, make_codebook,
                                   render_tag)
from slam_tpu.pipeline import slam2d
from slam_tpu.sim import world2d


def test_scan_to_scan_tracks_motion():
    cfg = sim2d_config()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([0.4, 0.1, 0.05])

    def scene_at(p):
        r, h = world2d.raycast(world, p, cfg.sim)
        xyz, h = world2d.scan_to_points(r, h, cfg.sim)
        return slam2d.build_scene(xyz, h, cfg)

    s0 = scene_at(p0)
    s1 = scene_at(p1)
    res = slam2d.register_scan_to_scan(s1, s0, jnp.concatenate([p0, p0[:1]]),
                                       p0, cfg)
    assert bool(res.ok)
    got = np.asarray(res.pose)
    assert np.linalg.norm(got[:2] - np.asarray(p1[:2])) < 0.15, got
    assert abs(got[2] - 0.05) < 0.03


def test_detection_to_sample_map_chain():
    """Camera sees a tag -> pixel -> ground-plane ray -> global point ->
    evidence blob -> extracted candidate (sample_conversion_node +
    sample_mapping_node roles end-to-end)."""
    cam = calib.REFERENCE_CAMERA
    scfg = SampleMapConfig(size_x=128, size_y=128, resolution=0.5)
    fcfg = FiducialConfig(min_area=100)
    codebook = jnp.array(make_codebook(seed=0, num_codes=8))

    # ground-truth sample at a known lidar-frame ground point
    h = -1.3
    sample_lidar = jnp.array([7.0, 0.8, h])
    uv_true = calib.camera_to_pixel(cam, calib.lidar_to_camera(cam,
                                                               sample_lidar))

    # synthesize the camera image: a tag centered on that pixel, then detect
    c = np.asarray(uv_true) / 32.0  # scale into a small test image
    corners = jnp.array(np.array(
        [[-1, -1], [1, -1], [1, 1], [-1, 1]], np.float32) * 20 + c)
    img = render_tag(codebook[3], corners, 160, 160)
    det = detect_tags(img, codebook, fcfg)
    k = int(np.argmax(np.asarray(det.valid)))
    assert bool(det.valid[k]) and int(det.tag_id[k]) == 3
    uv_detected = det.center[k] * 32.0  # back to full-res pixels

    # robot pose in the world
    pose = jnp.array([3.0, -2.0, 0.7, 1.3])
    g = calib.pixel_to_global(cam, uv_detected, pose, h)
    expect = calib.pixel_to_global(cam, uv_true, pose, h)
    np.testing.assert_allclose(np.asarray(g)[:2], np.asarray(expect)[:2],
                               atol=0.4)

    m = init_sample_map(scfg)
    for _ in range(3):
        m = add_sample(m, g[:2], jnp.asarray(1.2), jnp.asarray(0.8), scfg)
    peaks = extract_samples(m, scfg)
    assert bool(peaks.valid[0])
    np.testing.assert_allclose(np.asarray(peaks.xy[0]),
                               np.asarray(expect[:2]), atol=0.8)
