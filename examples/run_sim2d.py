"""Example: single-robot 2D SLAM rollout with trajectory + map rendering.

    python examples/run_sim2d.py [--steps 200] [--out /tmp/slam2d]
"""

import argparse
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default="/tmp/slam2d")
    ap.add_argument("--graph", action="store_true",
                    help="run the full pose-graph pipeline")
    args = ap.parse_args()

    from slam_tpu.config import sim2d_config
    from slam_tpu.pipeline import slam2d
    from slam_tpu.sim import world2d
    from slam_tpu.utils import viz

    cfg = sim2d_config()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    state = slam2d.init_state(jax.random.PRNGKey(0), cfg,
                              with_graph=args.graph)
    if args.graph:
        # round UP like the rollouts themselves: flooring silently truncated
        # non-multiples of 8 and produced an empty (NaN-ATE) run below 8
        final, (est, true) = slam2d.rollout_with_graph(
            state, world, cfg, num_macro=-(-args.steps // 8), graph_every=8)
    else:
        final, (est, true) = slam2d.rollout(state, world, cfg, args.steps)

    est, true = np.asarray(est), np.asarray(true)
    ate = float(slam2d.ate(jax.numpy.array(est[12:]),
                           jax.numpy.array(true[12:])))
    print(f"steps={len(est)}  ATE={ate:.4f} m  "
          f"map_points={int(final.map_cloud.count())}")
    if args.graph:
        print(f"keyframes={int(final.graph.num_nodes)}  "
              f"edges={int(final.graph.num_edges)}")

    os.makedirs(args.out, exist_ok=True)
    mp = np.asarray(final.map_cloud.xyz[np.asarray(final.map_cloud.valid)])
    viz.render_trajectory(os.path.join(args.out, "trajectory.png"),
                          est, true, mp)
    viz.render_grid(os.path.join(args.out, "drivability.png"),
                    np.asarray(final.local_map.drivable),
                    title="drivability (rolling local map)")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
