"""Per-robot worlds: the fleet axis vmaps over (state, world) pairs — every
robot simulates in its own procedurally-generated environment (config 5
fleet-scale sim; the reference runs exactly one robot in one world)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import sim2d_config
from slam_tpu.pipeline import slam2d
from slam_tpu.sim import world2d


def test_vmapped_distinct_worlds():
    cfg = sim2d_config()
    B = 4
    wkeys = jax.random.split(jax.random.PRNGKey(100), B)
    worlds = jax.vmap(lambda k: world2d.make_world(k, cfg.sim))(wkeys)
    skeys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(lambda k: slam2d.init_state(k, cfg))(skeys)

    step = jax.jit(jax.vmap(lambda s, w: slam2d.slam_step(s, w, cfg)))
    for _ in range(8):
        states = step(states, worlds)

    # same drive commands, different worlds -> same true poses but different
    # maps/scans per robot
    maps = np.asarray(states.map_cloud.valid.sum(axis=1))
    xy0 = np.asarray(states.map_cloud.xyz[0][np.asarray(
        states.map_cloud.valid[0])])
    xy1 = np.asarray(states.map_cloud.xyz[1][np.asarray(
        states.map_cloud.valid[1])])
    assert (maps > 20).all()
    # the two robots' maps should not coincide
    n = min(len(xy0), len(xy1))
    assert not np.allclose(np.sort(xy0[:n, 0]), np.sort(xy1[:n, 0]), atol=0.5)
    # all robots still track (EKF + ICP healthy in every world)
    err = np.linalg.norm(np.asarray(states.pose[:, :2]
                                    - states.true_pose[:, :2]), axis=1)
    assert (err < 0.5).all(), err
