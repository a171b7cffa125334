"""Benchmark harness: full SLAM steps/sec on real TPU hardware.

Measures the fused per-scan pipeline (scene build + class-constrained ICP +
EKF fuse + occupancy grid update — BASELINE config 1) vmapped across a robot
fleet on one chip, and reports aggregate robot-steps/sec.

Baseline target (BASELINE.json): >=10,000 full SLAM steps/sec across 1024
batched robots on v5e-8. vs_baseline is measured single-chip throughput
against that full 8-chip target (1.0 == hitting the 8-chip number on 1 chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--steps", type=int, default=20, help="steps per timed block")
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    from slam_tpu.config import sim2d_config
    from slam_tpu.pipeline import slam2d
    from slam_tpu.sim import world2d

    cfg = sim2d_config()
    B = args.batch

    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(lambda k: slam2d.init_state(k, cfg))(keys)

    @functools.partial(jax.jit, donate_argnums=0)
    def run_block(s):
        out, _ = jax.vmap(
            lambda x: slam2d.rollout(x, world, cfg, args.steps))(s)
        return out

    # warmup / compile
    states = run_block(states)
    jax.block_until_ready(states.pose)

    best = 0.0
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        states = run_block(states)
        jax.block_until_ready(states.pose)
        dt = time.perf_counter() - t0
        rate = B * args.steps / dt
        best = max(best, rate)

    print(json.dumps({
        "metric": "slam_robot_steps_per_sec_b%d_1chip" % B,
        "value": round(best, 1),
        "unit": "robot-steps/s",
        "vs_baseline": round(best / 10000.0, 4),
    }))


if __name__ == "__main__":
    main()
