"""Scan-size scaling datapoint (VERDICT r2 item 1 table): ref-scale config
with only the azimuth count varied — 32x64=2048, 32x256=8192, 32x640=20480
rays — grid matcher, B=16, chained 8-step blocks. One size per process
(compile-cache / device-claim rules)."""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
naz = int(sys.argv[1])
sys.argv = ["bench.py"]
import dataclasses
import bench  # noqa: F401  (backend await + timing helpers)
import jax
from slam_tpu import config as _c

cfg = _c.ref_scale_config()
cfg = cfg.replace(
    sim=dataclasses.replace(cfg.sim, num_azimuth=naz),
    icp=dataclasses.replace(cfg.icp, matcher="grid"),
    # scale the raw-scan completeness gate with the ray count (the
    # full-size 5856 gate would mask every scan at the smaller sizes)
    cloud=dataclasses.replace(cfg.cloud,
                              min_scan_points=int(32 * naz * 0.286)),
)
import functools
import time

import jax.numpy as jnp
from slam_tpu.pipeline import slam3d
from slam_tpu.sim import world3d

BATCH, STEPS = 16, 8
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
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    sg = run_block(sg)
    jax.block_until_ready(jax.tree.leaves(sg)[0])
    best = min(best, time.perf_counter() - t0)
print(f"scan={32*naz} rays rate: {BATCH*STEPS/best:.1f} robot-steps/s "
      f"({best*1e3/STEPS:.2f} ms/step at B={BATCH})", flush=True)
