#!/usr/bin/env python3
"""Eviction-policy cost study (VERDICT r3 item 10): does keyframe eviction
measurably hurt ATE when a mission outlives the graph capacity ~4x?

The reference keeps the FULL keyframe history and rebuilds the global map
from all of it after every optimization (graph_slam.cpp:260-280); our graph
is fixed-capacity with most-redundant-first eviction (pose_graph.py
_eviction_slot). This runs the same long 2D mission at two capacities —
one sized to overflow ~4x, one holding the whole history — and prints the
ATE curve by mission quarter, so the policy's cost is a number.

One capacity per process (the jax re-trace footgun — see
tests/test_jax_retrace_footgun.py):

    python tools/eviction_study.py --max-nodes 16
    python tools/eviction_study.py --max-nodes 64
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-nodes", type=int, required=True)
    ap.add_argument("--macros", type=int, default=128)
    ap.add_argument("--kf-dist", type=float, default=1.0,
                    help="keyframe spacing [m] (shrunk from the reference's "
                         "5 m so the mission overruns capacity on CPU time)")
    ap.add_argument("--degree-weight", type=float, default=None,
                    help="evict_degree_weight override (0 = the round-1 "
                         "pure-redundancy policy)")
    ap.add_argument("--protect-recent", type=int, default=None,
                    help="evict_protect_recent override")
    args = ap.parse_args()

    from slam_tpu.config import sim2d_config
    from slam_tpu.pipeline import slam2d
    from slam_tpu.sim import world2d

    c = sim2d_config()
    gkw = dict(max_nodes=args.max_nodes, max_edges=4 * args.max_nodes,
               keyframe_points=256, knn_dist_thresh=args.kf_dist)
    if args.degree_weight is not None:
        gkw["evict_degree_weight"] = args.degree_weight
    if args.protect_recent is not None:
        gkw["evict_protect_recent"] = args.protect_recent
    cfg = dataclasses.replace(c, graph=dataclasses.replace(c.graph, **gkw))
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam2d.init_state(jax.random.PRNGKey(0), cfg, with_graph=True)
    final, (est, true) = slam2d.rollout_with_graph(
        st, world, cfg, num_macro=args.macros, graph_every=4)
    est, true = np.asarray(est), np.asarray(true)
    T = est.shape[0]
    err = np.linalg.norm(est[:, :2] - true[:, :2], axis=1)
    q = T // 4
    segs = [float(np.sqrt((err[i * q:(i + 1) * q] ** 2).mean()))
            for i in range(4)]
    print(f"max_nodes={args.max_nodes} kf_dist={args.kf_dist} "
          f"degree_weight={cfg.graph.evict_degree_weight} steps={T}: "
          f"nodes={int(final.graph.num_nodes)} "
          f"edges={int(final.graph.num_edges)} "
          f"edges_dropped={int(final.graph.edges_dropped)} "
          f"full={bool(final.graph_full)}")
    print("ATE by mission quarter [cm]: "
          + "  ".join(f"Q{i+1}={s*100:.2f}" for i, s in enumerate(segs))
          + f"  |  overall={float(np.sqrt((err**2).mean()))*100:.2f}")
    # coverage diagnostic: distance from the robot to the nearest SURVIVING
    # graph node per quarter — if this explodes while ATE does, the penalty
    # is capacity coverage (the map target can't span the mission), not the
    # eviction ORDER; separates "better policy possible" from "floor"
    node_xy = np.asarray(final.graph.node_pose[:, :2])
    nv = np.asarray(final.graph.node_valid)
    d_cover = np.linalg.norm(est[:, None, :2] - node_xy[None, nv],
                             axis=-1).min(1)
    segs_c = [float(d_cover[i * q:(i + 1) * q].mean()) for i in range(4)]
    print("mean dist to nearest surviving node [m]: "
          + "  ".join(f"Q{i+1}={s:.2f}" for i, s in enumerate(segs_c)))


if __name__ == "__main__":
    main()
