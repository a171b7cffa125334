"""Render a binary replay file of simulated sensor frames — the framework's
'rosbag' (consumed by the native replay loader, runtime/src/slamrt.cpp).

Frame layout (little-endian float32): [ranges(num_beams), gyro, cmd(3)].

    python tools/make_replay.py --frames 500 --out /tmp/scans.bin
"""

import argparse
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--out", default="/tmp/scans.bin")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from slam_tpu.config import sim2d_config
    from slam_tpu.sim import world2d
    from slam_tpu.sim.replay import synth_frames

    cfg = sim2d_config()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    frames = synth_frames(world, cfg.sim, args.frames, seed=args.seed)
    with open(args.out, "wb") as f:
        f.write(frames.tobytes())
    print(f"wrote {args.frames} frames x {frames.shape[1]} floats to "
          f"{args.out} ({frames.nbytes} bytes)")


if __name__ == "__main__":
    main()
