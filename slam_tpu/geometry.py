"""SE(2)/SE(3) geometry ops — the TPU-native replacement for the reference's
Matrix lib + tf (ccicp2d/src/matrix.{h,cpp}, tf broadcasts in nasa_ekf.cpp:480-493).

All functions are pure jnp, broadcast over leading batch dims, and safe under
jit/vmap. Angles follow the reference's conventions: yaw in [-pi, pi], wrap
semantics of nasa_ekf.cpp:85-108 (angleWrap / subtractYaw).
"""

from __future__ import annotations

import jax.numpy as jnp


def angle_wrap(a: jnp.ndarray) -> jnp.ndarray:
    """Standardize angle to [-pi, pi] (true periodic wrap).

    The reference's angleWrap (nasa_ekf.cpp:85-97) is single-step and its
    negative branch is `2*pi - a` — for a < -pi that RAISES the magnitude
    (a=-3.2 -> 9.48, out of range), a latent reference bug its callers
    dodge by only feeding small per-tick increments. We use the correct
    periodic form everywhere; the two agree exactly on (-pi, pi] and on
    the positive branch up to 3*pi.
    """
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def subtract_yaw(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Acute-angle difference a-b across the +-pi boundary (nasa_ekf.cpp:100-108)."""
    return angle_wrap(a - b)


def rot2(theta: jnp.ndarray) -> jnp.ndarray:
    """2x2 rotation matrix; batch dims pass through (matrix.h:97 rotMatX analogue)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def se2_apply(pose: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply SE(2) pose [x, y, yaw] to points (..., N, 2)."""
    x, y, th = pose[..., 0], pose[..., 1], pose[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    px, py = pts[..., 0], pts[..., 1]
    qx = c[..., None] * px - s[..., None] * py + x[..., None]
    qy = s[..., None] * px + c[..., None] * py + y[..., None]
    return jnp.stack([qx, qy], axis=-1)


def se2_apply_xy(pose: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """Planar SE(2) apply: x/y planes (..., N) -> (qx, qy) planes.

    The stacked form (se2_apply) forces (..., N, 1) reshape/stack boundaries
    that XLA materializes with the minor dim lane-padded to 128 — ~3.6 ms/tick
    of pure padding traffic at batch 1024. Planes stay rank-2 and clean."""
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    x, y = pose[..., 0], pose[..., 1]
    qx = c[..., None] * px - s[..., None] * py + x[..., None]
    qy = s[..., None] * px + c[..., None] * py + y[..., None]
    return qx, qy


def se2_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a ∘ b for poses [x, y, yaw]: first apply b, then a."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    th = angle_wrap(a[..., 2] + b[..., 2])
    return jnp.stack([x, y, th], axis=-1)


def se2_inverse(p: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    x = -(c * p[..., 0] + s * p[..., 1])
    y = -(-s * p[..., 0] + c * p[..., 1])
    return jnp.stack([x, y, -p[..., 2]], axis=-1)


def se2_relative(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Relative pose of b expressed in a's frame: a^{-1} ∘ b.

    This is the edge initialization Mfrom^{-1}*Mto of graphSlamTools.cpp:258
    restricted to the plane.
    """
    return se2_compose(se2_inverse(a), b)


# --- SO(3) / quaternions (for roll-pitch compensation & SE(3) keyframes) ---


def quat_from_rpy(roll, pitch, yaw):
    """XYZW-free: we use [w, x, y, z]. Matches tf createQuaternionFromRPY."""
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return jnp.stack([w, x, y, z], axis=-1)


def yaw_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw from [w,x,y,z] quaternion (nasa_ekf.cpp:71-84 quat2Euler)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


def rot3_from_rpy(roll, pitch, yaw):
    """3x3 rotation R = Rz(yaw) @ Ry(pitch) @ Rx(roll)."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rp_compensate(pts: jnp.ndarray, roll, pitch) -> jnp.ndarray:
    """Roll/pitch-compensate a cloud: rotate by R(roll, pitch, yaw=0).

    Replaces the IMU tilt compensation in pointcloud_filter.cpp:103-148 and the
    yaw-removed EKF-pose rotation of scan_registration.cpp:127-139.
    pts: (..., N, 3).
    """
    R = rot3_from_rpy(roll, pitch, jnp.zeros_like(roll))
    return jnp.einsum("...ij,...nj->...ni", R, pts)


def se3_matrix(xyz: jnp.ndarray, rpy: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous transform from translation + roll/pitch/yaw."""
    R = rot3_from_rpy(rpy[..., 0], rpy[..., 1], rpy[..., 2])
    top = jnp.concatenate([R, xyz[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
