"""Scratch profiler: trace the 2D rollout on the real TPU."""
import functools
import time

import jax
import jax.numpy as jnp

from slam_tpu.config import sim2d_config
from slam_tpu.pipeline import slam2d
from slam_tpu.sim import world2d

BATCH, STEPS = 1024, 20

cfg = sim2d_config()
world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
states = jax.vmap(lambda k: slam2d.init_state(k, cfg))(keys)


@functools.partial(jax.jit, donate_argnums=0)
def run_block(s):
    out, _ = jax.vmap(lambda x: slam2d.rollout(x, world, cfg, STEPS))(s)
    return out


states = run_block(states)
jax.block_until_ready(states.pose)
t0 = time.perf_counter()
states = run_block(states)
jax.block_until_ready(states.pose)
dt = time.perf_counter() - t0
print(f"rate: {BATCH * STEPS / dt:.1f} robot-steps/s ({dt*1e3:.1f} ms/block)")

with jax.profiler.trace("/tmp/prof2d"):
    states = run_block(states)
    jax.block_until_ready(states.pose)
print("trace written to /tmp/prof2d")
