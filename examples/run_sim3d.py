"""Example: 3D Velodyne SLAM over procedural terrain (BASELINE config 2).

    python examples/run_sim3d.py [--steps 60] [--out /tmp/slam3d] [--metrics]

Runs the fused 3D pipeline (GP-INSAC segmentation, class-constrained ICP,
wheel-contact height interpolation, obstacle/ground point maps, occupancy),
prints tracking error, and renders the trajectory, drivability grid, and
MLS cluster markers of the graph-regenerated global map.
"""

import argparse
import os as _os
import sys
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--out", default="/tmp/slam3d")
    ap.add_argument("--metrics", action="store_true")
    ap.add_argument("--save-csv", default=None, metavar="PATH",
                    help="log the estimated trajectory as the reference's "
                         "x, y, yaw CSV (global_generate.cpp:194)")
    ap.add_argument("--ref-scale", action="store_true",
                    help="run at the REFERENCE's working point: 20,480-ray "
                         "scans, 72x200 polar grid, 20k pts/class ICP, the "
                         "O(N) scale engines (config.ref_scale_config)")
    args = ap.parse_args()

    import dataclasses

    from slam_tpu.config import ref_scale_config, sim3d_config
    from slam_tpu.pipeline import slam3d
    from slam_tpu.sim import world3d
    from slam_tpu.utils import metrics
    from slam_tpu.utils.viz import render_grid, render_trajectory

    if args.metrics:
        metrics.enable()

    if args.ref_scale:
        cfg = ref_scale_config()
        cfg = cfg.replace(icp=dataclasses.replace(cfg.icp, matcher="grid"))
    else:
        cfg = sim3d_config()
    world = world3d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam3d.init_state_3d(jax.random.PRNGKey(0), cfg, world)
    gm = slam3d.init_ground_map(cfg)

    st, gm, (est, true) = slam3d.rollout_3d(st, world, gm, cfg, args.steps)
    jax.block_until_ready(st.pose)

    est, true = np.asarray(est), np.asarray(true)
    warm = min(8, args.steps // 4)
    xy_err = np.linalg.norm(est[warm:, :2] - true[warm:, :2], axis=1)
    z_err = np.abs(est[warm:, 3] - true[warm:, 3])
    print(f"{args.steps} steps on {jax.default_backend()}  |  "
          f"xy ATE {np.sqrt(np.mean(xy_err**2)):.3f} m  |  "
          f"z err mean {z_err.mean():.3f} m  |  "
          f"icp ok {bool(st.scan_reg_ok)}")

    if args.save_csv:
        from slam_tpu.utils.trajectory import save_trajectory_csv
        n = save_trajectory_csv(args.save_csv, est)  # x, y, yaw, z rows
        print(f"trajectory csv ({n} rows) -> {args.save_csv}")

    _os.makedirs(args.out, exist_ok=True)
    render_trajectory(_os.path.join(args.out, "trajectory.png"),
                      est[:, :2], true[:, :2])
    render_grid(_os.path.join(args.out, "drivability.png"),
                np.asarray(st.local_map.drivable), title="drivability")
    print(f"renders -> {args.out}/")

    if args.metrics:
        s = metrics.summary().get("slam_step_3d", {})
        if s:
            print(f"metrics: icp ok-rate {s.get('icp_ok', 0):.3f}  |  "
                  f"scene pts {s.get('scene_points', 0):.0f}  |  "
                  f"residual {s.get('mean_residual', 0):.4f}")


if __name__ == "__main__":
    main()
