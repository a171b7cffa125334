"""Relocalization pipeline — the global_matching node's role
(global_match.cpp:72-223): recover a lost robot's pose against a prior map.

The reference retries random GICP seeds until fitness accepts, then publishes
a correction edge; here one exhaustive FFT correlative search + ICP polish
recovers the pose, and `apply_relocalization` shifts the EKF belief (the
globalCallback delta-shift, nasa_ekf.cpp:155-176)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam_tpu.config import SlamConfig
from slam_tpu.geometry import subtract_yaw
from slam_tpu.models import ekf as ekf_mod
from slam_tpu.ops.fft_match import MatchResult, global_match
from slam_tpu.types import PointCloud, SlamState


def relocalize(state: SlamState, scene: PointCloud,
               cfg: SlamConfig) -> MatchResult:
    """Match the current (robot-frame) scene against the map around the
    current belief (the reference searches +-10 m around the pose,
    global_match.cpp:105-122; our raster covers grid_size*resolution)."""
    return global_match(scene, state.map_cloud, state.pose[:2],
                        cfg.global_match, cfg.icp)


def apply_relocalization(state: SlamState, match: MatchResult) -> SlamState:
    """Shift the EKF belief by the recovered pose delta when accepted
    (globalCallback, nasa_ekf.cpp:155-176: mu += [dx, dy, dyaw])."""
    delta = jnp.stack([
        match.pose[0] - state.ekf.mu[0],
        match.pose[1] - state.ekf.mu[1],
        subtract_yaw(match.pose[2], state.ekf.mu[6]),
    ])
    shifted = ekf_mod.global_offset(state.ekf, delta)
    new_ekf = jax.tree.map(
        lambda a, b: jnp.where(match.ok, a, b), shifted, state.ekf)
    new_pose = jnp.where(
        match.ok,
        jnp.concatenate([match.pose, state.pose[3:4]]),
        state.pose)
    return state.replace(ekf=new_ekf, pose=new_pose)
