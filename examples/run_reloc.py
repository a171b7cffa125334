"""Example: kidnapped-robot relocalization against the built map.

The global_matching node's scenario (global_match.cpp:72-223): a robot that
has built a map is teleported in belief (kidnap). The FFT correlative
matcher searches every heading exhaustively (vs the reference's <=20 random
GICP restarts), and on acceptance the EKF belief snaps back; with --graph
the match also injects an Edge{from: 0} loop closure and re-optimizes the
keyframe history (the reference's designed-but-unwired receive path,
graph_slam.cpp:215-243).

    python examples/run_reloc.py --steps 80 --out /tmp/reloc
"""

import argparse
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import sim2d_config
from slam_tpu.pipeline import slam2d
from slam_tpu.pipeline.relocalize import apply_relocalization, relocalize
from slam_tpu.sim import world2d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--kidnap", type=float, nargs=3, default=[8.0, -5.0, 1.2],
                    help="dx dy dyaw applied to the belief")
    ap.add_argument("--out", default="/tmp/reloc")
    ap.add_argument("--save-pcd", default=None, metavar="PATH",
                    help="export the built map as a .pcd (the reference's "
                         "global_generate save, global_generate.cpp:238)")
    ap.add_argument("--prior-pcd", default=None, metavar="PATH",
                    help="relocalize against a prior .pcd map instead of "
                         "the robot's own (loadPCDFile, global_match.cpp:258)")
    ap.add_argument("--graph", action="store_true",
                    help="map with pose-graph SLAM and apply the match as "
                         "an Edge{from: 0} loop closure + re-optimization "
                         "(apply_relocalization_graph)")
    args = ap.parse_args()

    import dataclasses
    c = sim2d_config()
    cfg = dataclasses.replace(
        c, global_match=dataclasses.replace(
            c.global_match, num_rotations=64, grid_size=192,
            grid_resolution=0.5, accept_score=0.35))

    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam2d.init_state(jax.random.PRNGKey(0), cfg, with_graph=args.graph)
    if args.graph:
        st, (est, true) = slam2d.rollout_with_graph(
            st, world, cfg, num_macro=-(-args.steps // 8), graph_every=8)
        print(f"mapped {len(est)} steps with pose graph "
              f"({int(st.graph.num_nodes)} keyframes, "
              f"{int(st.graph.num_edges)} edges), "
              f"ATE {float(slam2d.ate(est[10:], true[10:])):.3f} m")
    else:
        st, (est, true) = slam2d.rollout(st, world, cfg, args.steps)
        print(f"mapped {args.steps} steps, "
              f"ATE {float(slam2d.ate(est[10:], true[10:])):.3f} m")

    if args.save_pcd:
        from slam_tpu.utils.pcd import save_pcd
        n = save_pcd(args.save_pcd, st.map_cloud)
        print(f"saved {n}-point map to {args.save_pcd}")
    if args.prior_pcd:
        from slam_tpu.utils.pcd import load_pcd
        prior = load_pcd(args.prior_pcd, capacity=st.map_cloud.capacity)
        st = st.replace(map_cloud=prior)
        print(f"relocalization target <- {args.prior_pcd} "
              f"({int(prior.valid.sum())} points)")

    dx, dy, dyaw = args.kidnap
    mu = st.ekf.mu.at[0].add(dx).at[1].add(dy).at[6].add(dyaw)
    st_lost = st.replace(
        ekf=st.ekf.replace(mu=mu),
        pose=st.pose.at[0].add(dx).at[1].add(dy).at[2].add(dyaw))
    true_pose = np.asarray(st.true_pose)
    err0 = np.linalg.norm(np.asarray(st_lost.pose[:2]) - true_pose[:2])
    print(f"kidnapped: belief now {err0:.1f} m from truth")

    # fresh scan at the TRUE pose, matched against the robot's own map
    ranges, hit = world2d.raycast(world, st.true_pose[:3], cfg.sim)
    scan_xyz, hit = world2d.scan_to_points(ranges, hit, cfg.sim)
    scene = slam2d.build_scene(scan_xyz, hit, cfg)

    match = relocalize(st_lost, scene, cfg)
    if not bool(match.ok):
        print(f"relocalization REJECTED (score {float(match.score):.3f}) — "
              "state left untouched (the reference retries next scan)")
        return
    if args.graph:
        from slam_tpu.pipeline.relocalize import apply_relocalization_graph
        st_fixed = apply_relocalization_graph(st_lost, match, cfg)
        print(f"loop-closure edge from node 0 injected; graph re-optimized "
              f"({int(st_fixed.graph.num_edges)} edges)")
    else:
        st_fixed = apply_relocalization(st_lost, match)
    err1 = np.linalg.norm(np.asarray(st_fixed.pose[:2]) - true_pose[:2])
    print(f"relocalized: score {float(match.score):.3f}, "
          f"belief error {err0:.1f} m -> {err1:.2f} m")

    os.makedirs(args.out, exist_ok=True)
    try:
        from slam_tpu.utils import viz
        pts = np.asarray(est)
        marks = np.stack([np.asarray(st_lost.pose[:3]),
                          np.asarray(st_fixed.pose[:3]),
                          true_pose[:3]])
        viz.render_trajectory(os.path.join(args.out, "reloc.png"),
                              pts, np.asarray(true))
        print(f"renders in {args.out} (lost {marks[0][:2]}, "
              f"fixed {marks[1][:2]}, true {marks[2][:2]})")
    except Exception as e:  # matplotlib optional
        print(f"(no renders: {e})")


if __name__ == "__main__":
    main()
