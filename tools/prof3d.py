"""Scratch profiler: trace the 3D rollout on the real TPU."""
import functools
import time

import jax
import jax.numpy as jnp

from slam_tpu.config import sim3d_config
from slam_tpu.pipeline import slam3d
from slam_tpu.sim import world3d

BATCH = 128
STEPS = 20

cfg = sim3d_config()
world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
states = jax.vmap(lambda k: slam3d.init_state_3d(k, cfg, world))(keys)
gms = jax.vmap(lambda _: slam3d.init_ground_map(cfg))(jnp.arange(BATCH))


@functools.partial(jax.jit, donate_argnums=0)
def run_block(sg):
    def one(ss, gg):
        out, gm2, _ = slam3d.rollout_3d(ss, world, gg, cfg, STEPS)
        return out, gm2
    return jax.vmap(one)(*sg)


sg = run_block((states, gms))
jax.block_until_ready(jax.tree.leaves(sg)[0])
t0 = time.perf_counter()
sg = run_block(sg)
jax.block_until_ready(jax.tree.leaves(sg)[0])
dt = time.perf_counter() - t0
print(f"rate: {BATCH * STEPS / dt:.1f} robot-steps/s ({dt*1e3:.1f} ms/block)")

with jax.profiler.trace("/tmp/prof3d"):
    sg = run_block(sg)
    jax.block_until_ready(jax.tree.leaves(sg)[0])
print("trace written to /tmp/prof3d")
