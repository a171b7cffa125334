"""Sample mapping + camera calibration tests (sample_mapping/, calibration/)."""

import jax.numpy as jnp
import numpy as np

from slam_tpu import calib
from slam_tpu.config import SampleMapConfig
from slam_tpu.mapping.sample_map import (add_sample, extract_samples,
                                         init_sample_map, remove_cone)


def cfg_small():
    return SampleMapConfig(size_x=128, size_y=128, resolution=0.5)


def test_add_and_extract_sample():
    cfg = cfg_small()
    m = init_sample_map(cfg)
    for _ in range(3):  # repeated detections accumulate evidence
        m = add_sample(m, jnp.array([5.0, -3.0]), jnp.asarray(1.5),
                       jnp.asarray(1.0), cfg)
    assert float(m.prob.max()) <= cfg.prob_max
    peaks = extract_samples(m, cfg)
    assert bool(peaks.valid[0])
    np.testing.assert_allclose(np.asarray(peaks.xy[0]), [5.0, -3.0], atol=0.5)


def test_cone_decay_clears_false_positive():
    cfg = cfg_small()
    m = init_sample_map(cfg)
    m = add_sample(m, jnp.array([5.0, 0.0]), jnp.asarray(2.0),
                   jnp.asarray(0.8), cfg)
    # robot at origin looking +x: the sample is inside the cone
    for _ in range(12):
        m = remove_cone(m, jnp.zeros(2), jnp.asarray(0.0), jnp.asarray(0.3),
                        cfg)
    peaks = extract_samples(m, cfg)
    assert not bool(peaks.valid[0]), "cone decay should clear the blob"


def test_cone_does_not_touch_outside():
    cfg = cfg_small()
    m = init_sample_map(cfg)
    m = add_sample(m, jnp.array([-8.0, 0.0]), jnp.asarray(2.0),
                   jnp.asarray(0.8), cfg)  # behind the robot
    before = float(m.prob.max())
    m = remove_cone(m, jnp.zeros(2), jnp.asarray(0.0), jnp.asarray(1.0), cfg)
    assert abs(float(m.prob.max()) - before) < 1e-6


def test_projection_roundtrip():
    cam = calib.REFERENCE_CAMERA
    pt = jnp.array([8.0, -0.5, -0.4])  # lidar-frame point ahead of the rover
    cxyz = calib.lidar_to_camera(cam, pt)
    assert float(cxyz[2]) > 0, "point should be in front of the camera"
    uv = calib.camera_to_pixel(cam, cxyz)
    ray = calib.pixel_to_ray(cam, uv)
    # the ray through the pixel must pass through the camera-frame point
    cos = float(jnp.dot(ray, cxyz / jnp.linalg.norm(cxyz)))
    assert cos > 0.9999


def test_pixel_to_ground_chain():
    cam = calib.REFERENCE_CAMERA
    h = -1.3
    # forward-project a known ground point, then invert through the chain
    gpt = jnp.array([6.0, 1.0, h])
    uv = calib.camera_to_pixel(cam, calib.lidar_to_camera(cam, gpt))
    back = calib.ray_to_flat_ground(cam, calib.pixel_to_ray(cam, uv), h)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gpt), atol=1e-2)
    # global transform applies robot pose
    pose = jnp.array([10.0, -2.0, np.pi / 2, 1.3])
    g = calib.pixel_to_global(cam, uv, pose, h)
    expect = np.array([10.0 - 1.0, -2.0 + 6.0, 0.0])
    np.testing.assert_allclose(np.asarray(g), expect, atol=0.05)


def test_yaml_parse():
    text = open("/root/reference/calibration/calibration/extrinsics.yaml").read()
    cams = calib.load_extrinsics_yaml(text)
    assert len(cams) == 1
    np.testing.assert_allclose(np.asarray(cams[0].P())[0, 0], 11162.85801)
    np.testing.assert_allclose(np.asarray(cams[0].T())[3], [0, 0, 0, 1])


def test_saturated_sample_yields_one_peak():
    """Evidence saturates at prob_max for a stared-at sample (add_sample
    clips), turning its whole plateau into equal-valued local maxima —
    extraction must dedup to ONE peak per sample, not fill every slot with
    duplicates that crowd out weaker real samples (the reference returns
    one contour centroid per blob, sample_mapping.cpp:188-239)."""
    from slam_tpu.mapping.sample_map import init_sample_map

    cfg = cfg_small()
    m = init_sample_map(cfg)
    for _ in range(8):  # saturate a plateau at (5, 0)
        m = add_sample(m, jnp.array([5.0, 0.0]), 1.5, 1.0, cfg)
    # one weaker (but above-threshold) real sample
    m = add_sample(m, jnp.array([-10.0, -10.0]), 1.5, 1.0, cfg)
    m = add_sample(m, jnp.array([-10.0, -10.0]), 1.5, 1.0, cfg)
    peaks = extract_samples(m, cfg, max_samples=8)
    v = np.asarray(peaks.valid)
    xy = np.asarray(peaks.xy)[v]
    near_sat = np.linalg.norm(xy - np.array([5.0, 0.0]), axis=-1) < 2.0
    assert near_sat.sum() == 1, xy  # one peak for the saturated sample
    near_weak = np.linalg.norm(xy - np.array([-10.0, -10.0]), axis=-1) < 2.0
    assert near_weak.sum() == 1, xy  # the weak sample survives


def test_init_respects_prob_min_floor():
    import dataclasses

    from slam_tpu.mapping.sample_map import init_sample_map

    cfg = dataclasses.replace(cfg_small(), prob_min=0.1)
    m = init_sample_map(cfg)
    np.testing.assert_allclose(np.asarray(m.prob), 0.1)
    # first add_sample must not raise untouched cells above the floor
    m2 = add_sample(m, jnp.array([0.0, 0.0]), 1.5, 1.0, cfg)
    far = np.asarray(m2.prob)[:10, :10]
    np.testing.assert_allclose(far, 0.1, atol=1e-6)


def test_horizon_pixel_returns_nan_not_garbage():
    """A pixel at/above the horizon has no ground intersection in front of
    the camera: the chain must return NaN (loud), not a point at ~infinity
    or behind the robot."""
    from slam_tpu.calib import (REFERENCE_CAMERA, pixel_to_global,
                                pixel_to_ray, ray_to_flat_ground)

    cam = REFERENCE_CAMERA
    # a pixel far above the principal point looks upward for this mount
    up_uv = jnp.array([1938.0, -200000.0])
    ray = pixel_to_ray(cam, up_uv)
    pt = ray_to_flat_ground(cam, ray, -1.3)
    assert not bool(jnp.isfinite(pt).all()), np.asarray(pt)
    # ...and a normal downward pixel still lands on finite ground
    down = pixel_to_global(cam, jnp.array([1938.0, 2600.0]),
                           jnp.zeros(4))
    assert bool(jnp.isfinite(down).all()), np.asarray(down)
