"""Camera <-> lidar calibration geometry — TPU-native rebuild of
calibration/src/camera_to_velodyne.cpp.

All transforms are pure jnp and batch over pixels/points. Calibration data
(projection matrix + extrinsics per camera) comes from a dataclass mirroring
calibration/calibration/extrinsics.yaml; `load_extrinsics_yaml` parses that
file format without external YAML deps.
"""

from __future__ import annotations

import dataclasses
import re
from typing import List

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CameraParams:
    """One camera's calibration (extrinsics.yaml entry)."""

    projection: tuple      # 12 floats, row-major 3x4 (P)
    extrinsics: tuple      # 16 floats, row-major 4x4 (T: camera -> lidar)

    def P(self) -> jnp.ndarray:
        return jnp.asarray(np.array(self.projection).reshape(3, 4),
                           jnp.float32)

    def T(self) -> jnp.ndarray:
        return jnp.asarray(np.array(self.extrinsics).reshape(4, 4),
                           jnp.float32)


# the reference rover's single zoom camera (extrinsics.yaml:1-5)
REFERENCE_CAMERA = CameraParams(
    projection=(11162.85801, 0.0, 1938.03850, 0.0,
                0.0, 11109.93803, 1270.60007, 0.0,
                0.0, 0.0, 1.0, 0.0),
    extrinsics=(0.0607901, -0.205867, 0.97669, 0.313862,
                -0.99711, 0.0321484, 0.0688373, -0.302954,
                -0.0455703, -0.978052, -0.203318, -0.291717,
                0.0, 0.0, 0.0, 1.0),
)


def load_extrinsics_yaml(text: str) -> List[CameraParams]:
    """Parse the reference's extrinsics.yaml list format
    (camera_to_velodyne.cpp:5-22 read_yaml_file equivalent)."""
    cams = []
    for block in re.split(r"^- ", text, flags=re.M)[1:]:
        def grab(key):
            m = re.search(key + r":\s*\[([^\]]*)\]", block)
            return tuple(float(v) for v in m.group(1).split(","))
        cams.append(CameraParams(projection=grab("projection_matrix"),
                                 extrinsics=grab("extrinsics")))
    return cams


def lidar_to_camera(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    """Lidar-frame xyz -> camera-frame xyz (rangexyz_to_cameraxyz,
    camera_to_velodyne.cpp:68-78: applies T^-1). xyz: (..., 3)."""
    Tinv = jnp.linalg.inv(cam.T())
    h = jnp.concatenate([xyz, jnp.ones(xyz.shape[:-1] + (1,), xyz.dtype)], -1)
    out = jnp.einsum("ij,...j->...i", Tinv, h)
    return out[..., :3]


def camera_to_pixel(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame xyz -> pixel uv (cameraxyz_to_camerauv, :80-90)."""
    h = jnp.concatenate([xyz, jnp.ones(xyz.shape[:-1] + (1,), xyz.dtype)], -1)
    p = jnp.einsum("ij,...j->...i", cam.P(), h)
    return p[..., :2] / p[..., 2:3]


def camera_center(cam: CameraParams) -> jnp.ndarray:
    """Projection center in the camera frame: C = -M^-1 P[:, 3] with
    M = P[:, :3]. Zero for the reference camera (its P has no fourth
    column); nonzero for e.g. a stereo-rig right camera."""
    P = cam.P()
    return -jnp.linalg.solve(P[:, :3], P[:, 3])


def pixel_to_ray(cam: CameraParams, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel uv -> unit ray in camera frame via the TRUE projection-matrix
    left inverse dir = M^-1 [u, v, 1] (camerauv_to_cameraray, :92-106):
    honors skew (P[0,1]) and any nonzero fourth column; reduces exactly to
    the fx/fy/cx/cy form for the reference camera. The ray passes through
    camera_center(cam), not necessarily the frame origin."""
    P = cam.P()
    Minv = jnp.linalg.inv(P[:, :3])
    h = jnp.stack([uv[..., 0], uv[..., 1], jnp.ones_like(uv[..., 0])], -1)
    ray = jnp.einsum("ij,...j->...i", Minv, h)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


def ray_to_flat_ground(cam: CameraParams, ray: jnp.ndarray,
                       ground_height: float) -> jnp.ndarray:
    """Intersect a camera ray (through camera_center) with the lidar-frame
    plane z = ground_height; returns the lidar-frame point
    (cameraray_to_rangeflatground, :109-139).

    Rays at/above the horizon (parallel to the plane, or intersecting
    BEHIND the camera) return NaN — loud, so a consumer can't ingest a
    point at infinity or behind the robot as a valid landmark."""
    r1 = jnp.array([0.0, 1.0, ground_height])
    r2 = jnp.array([0.0, -1.0, ground_height])
    r3 = jnp.array([-1.0, 0.0, ground_height])
    c1, c2, c3 = (lidar_to_camera(cam, r) for r in (r1, r2, r3))
    n = jnp.cross(c3 - c1, c3 - c2)
    C = camera_center(cam)
    denom = jnp.einsum("...i,i->...", ray, n)
    d = jnp.dot(c1 - C, n) / jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
    ok = (jnp.abs(denom) >= 1e-9) & (d > 0.0)
    cp = C + d[..., None] * ray
    h = jnp.concatenate([cp, jnp.ones(cp.shape[:-1] + (1,), cp.dtype)], -1)
    rp = jnp.einsum("ij,...j->...i", cam.T(), h)
    return jnp.where(ok[..., None], rp[..., :3], jnp.nan)


def pixel_to_global(cam: CameraParams, uv: jnp.ndarray, pose4: jnp.ndarray,
                    sensor_ground_height: float = -1.3) -> jnp.ndarray:
    """Full pixel -> global-frame ground point chain (convert_uv_to_xyz,
    sample_conversion_node.cpp:27-54). pose4: robot (x, y, yaw, z)."""
    ray = pixel_to_ray(cam, uv)
    rp = ray_to_flat_ground(cam, ray, sensor_ground_height)
    c, s = jnp.cos(pose4[2]), jnp.sin(pose4[2])
    gx = c * rp[..., 0] - s * rp[..., 1] + pose4[0]
    gy = s * rp[..., 0] + c * rp[..., 1] + pose4[1]
    gz = rp[..., 2] + pose4[3]
    return jnp.stack([gx, gy, gz], axis=-1)
