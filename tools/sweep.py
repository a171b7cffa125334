"""Config-sweep runner: one subprocess per configuration.

Two reasons sweeps must not share a process:
  1. jax 0.9.0's re-trace const_args bug — re-jitting a pipeline-sized
     function with a second config in one process kills the C++ dispatch
     fast path (tests/test_jax_retrace_footgun.py pins it);
  2. the axon TPU client tolerates one compiled bench size per process
     (docs/PERF.md, verify skill gotchas).

Usage:
    python tools/sweep.py --set icp.loop=while,scan -- \
        python -u tools/scale_probe.py
    python tools/sweep.py --env SLAM_TPU_LARGE_SCATTER=native,chunked -- \
        python bench.py --pipeline 3d --batch3d 16

Each --set key=v1,v2 axis crosses with every other axis; the child sees
SLAM_TPU_SWEEP_SET="k1=v1;k2=v2" in its environment and applies it via
slam_tpu.config.apply_sweep_overrides (call it on your cfg before use).
--env axes export plain environment variables. Results (exit code, last
stdout line) are printed as one JSON line per run.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import subprocess
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--set", action="append", default=[],
                   help="cfg override axis: dotted.path=v1,v2,...")
    p.add_argument("--env", action="append", default=[],
                   help="env var axis: NAME=v1,v2,...")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="command to run per config (prefix with --)")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given (append: -- python your_script.py)")

    set_axes = [(kv.split("=", 1)[0], kv.split("=", 1)[1].split(","))
                for kv in args.set]
    env_axes = [(kv.split("=", 1)[0], kv.split("=", 1)[1].split(","))
                for kv in args.env]
    axes = [(k, vs, "set") for k, vs in set_axes] + \
           [(k, vs, "env") for k, vs in env_axes]
    combos = list(itertools.product(*[[(k, v, kind) for v in vs]
                                      for k, vs, kind in axes])) or [()]

    for combo in combos:
        env = dict(os.environ)
        sets = [f"{k}={v}" for k, v, kind in combo if kind == "set"]
        if sets:
            env["SLAM_TPU_SWEEP_SET"] = ";".join(sets)
        for k, v, kind in combo:
            if kind == "env":
                env[k] = v
        label = {k: v for k, v, _ in combo}
        r = subprocess.run(cmd, env=env, capture_output=True, text=True)
        last = (r.stdout.strip().splitlines() or [""])[-1]
        print(json.dumps({"config": label, "exit": r.returncode,
                          "last_line": last[:400]}), flush=True)
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-1500:] + "\n")


if __name__ == "__main__":
    main()
