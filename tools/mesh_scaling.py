#!/usr/bin/env python3
"""Ref-scale fleet scaling under the dp x sp mesh — the multi-chip evidence
for docs/PERF.md's claim that fleet scale-out at reference scan sizes is a
dp-over-ICI story (single-chip batch scaling at ~10 MB/robot of grids is
NEGATIVE: B=16: 101 -> B=64: 67 steps/s, HBM thrash).

Runs the reference-working-point 3D pipeline (20,480-ray scans, 72x200
polar grid, 384^2 maps, grid matcher) sharded over an 8-device virtual CPU
mesh and reports, per batch size:

  - compiled PER-DEVICE memory (argument + temp + output bytes from XLA's
    own memory analysis): the quantity that thrashed the single chip. Under
    dp sharding it must scale with B/dp, not B — each device holds only its
    robots' grids.
  - wall-clock aggregate robot-steps/s on the virtual mesh (coarse — CPU
    devices are host threads, not chips; the number shows scaling SHAPE,
    not TPU throughput).

Usage:  python tools/mesh_scaling.py [--batches 16,32,64] [--steps 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32,64")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--sp", type=int, default=1,
                    help="spatial shards per robot grid (dp = 8/sp)")
    args = ap.parse_args()

    import dataclasses

    from slam_tpu.config import ref_scale_config
    from slam_tpu.parallel.mesh import fleet_sharding, grid_rows_sharding, \
        make_mesh
    from slam_tpu.pipeline import slam3d
    from slam_tpu.sim import world3d
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = ref_scale_config()
    cfg = cfg.replace(icp=dataclasses.replace(cfg.icp, matcher="grid"))
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
    mesh = make_mesh(8, sp=args.sp)
    dp = mesh.shape["dp"]

    def bspec(leaf):
        nd = getattr(leaf, "ndim", 0)
        return NamedSharding(mesh, P() if nd == 0
                             else P("dp", *([None] * (nd - 1))))

    for batch in (int(b) for b in args.batches.split(",")):
        keys = jax.random.split(jax.random.PRNGKey(0), batch)
        states = jax.vmap(lambda k: slam3d.init_state_3d(k, cfg, world))(keys)
        gms = jax.vmap(lambda _: slam3d.init_ground_map(cfg))(
            jnp.arange(batch))
        states = jax.device_put(states, fleet_sharding(mesh, states))
        gms = jax.device_put(gms, slam3d.GroundMap(
            grid=grid_rows_sharding(mesh, gms.grid),
            cloud=jax.tree.map(bspec, gms.cloud)))

        @jax.jit
        def block(sg):
            def one(ss, gg):
                out, gm2, _ = slam3d.rollout_3d(ss, world, gg, cfg,
                                                args.steps)
                return out, gm2
            return jax.vmap(one)(*sg)

        lowered = block.lower((states, gms))
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        per_dev_mb = (ma.argument_size_in_bytes + ma.output_size_in_bytes +
                      ma.temp_size_in_bytes) / 1e6
        sg = compiled((states, gms))
        jax.block_until_ready(sg[0].pose)
        t0 = time.perf_counter()
        sg = compiled(sg)
        jax.block_until_ready(sg[0].pose)
        dt = time.perf_counter() - t0
        rate = batch * args.steps / dt
        print(f"b{batch:3d} dp{dp} sp{args.sp}: per-device "
              f"{per_dev_mb:8.1f} MB (args+temps+out), "
              f"{batch // dp:3d} robots/device, "
              f"{rate:8.1f} robot-steps/s aggregate "
              f"({dt / args.steps * 1e3:7.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
