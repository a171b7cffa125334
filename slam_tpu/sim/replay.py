"""Sensor-frame synthesis for the replay/live transport — the one place the
frame layout is produced (consumed by the native replay loader,
runtime/src/slamrt.cpp, and examples/run_live.py).

Frame layout (little-endian float32): [ranges(num_beams), gyro, cmd(3)].
Missed beams are written at EXACTLY cfg.beam_max_range — range noise is
applied to hit beams only, so a consumer can recover the hit mask as
`ranges < beam_max_range` (noisy misses used to land just under the cap
and reconstruct as phantom ~max-range hits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.sim import world2d


def frame_floats(cfg) -> int:
    """Floats per frame for the layout above."""
    return cfg.num_beams + 4


def synth_frames(world, cfg, n: int, seed: int = 0) -> np.ndarray:
    """(n, num_beams + 4) float32 frames along the standard drive loop."""
    def body(pose, step):
        cmd = world2d.drive_cmd(step, cfg.dt)
        pose = world2d.unicycle_step(pose, cmd, cfg.dt)
        r, h = world2d.raycast(world, pose, cfg)
        return pose, (r, h, cmd)

    _, (rs, hs, cmds) = jax.lax.scan(body, jnp.zeros(3), jnp.arange(n))
    rs, hs, cmds = np.asarray(rs), np.asarray(hs), np.asarray(cmds)
    rng = np.random.default_rng(seed)
    noisy = rs + rng.normal(0, cfg.range_noise, rs.shape)
    ranges = np.where(hs, noisy, cfg.beam_max_range)
    gyro = cmds[:, 2:3] + cfg.gyro_bias
    return np.concatenate([ranges, gyro, cmds], axis=1).astype("<f4")
