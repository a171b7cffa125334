"""Example: vmapped robot fleet with throughput reporting.

    python examples/run_fleet.py [--batch 1024] [--steps 50]
"""

import argparse
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--metrics", action="store_true",
                    help="host-callback scalar metrics per step (ICP "
                         "ok-rate, correspondences, residual)")
    ap.add_argument("--debug-nans", action="store_true",
                    help="raise at the first NaN produced under jit")
    ap.add_argument("--matcher", default=None,
                    choices=("fused", "points", "grid", "particle"),
                    help="scan-to-map matching engine (default: config)")
    ap.add_argument("--shared-map", action="store_true",
                    help="merge the fleet's maps into one shared "
                         "world-aligned grid each macro (BASELINE config 5)")
    args = ap.parse_args()

    from slam_tpu.config import sim2d_config
    from slam_tpu.pipeline import slam2d
    from slam_tpu.sim import world2d
    from slam_tpu.utils import metrics
    from slam_tpu.utils.profiling import Throughput

    use_ring = False
    if args.metrics:
        # host callbacks where the backend supports them; the device-side
        # metrics ring otherwise (the axon TPU tunnel rejects host
        # send/recv — the ring is fetched after the jitted block instead)
        use_ring = not metrics.enable()
    if args.debug_nans:
        metrics.nan_debug(True)

    cfg = sim2d_config()
    if args.matcher:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, icp=dataclasses.replace(cfg.icp, matcher=args.matcher))
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    keys = jax.random.split(jax.random.PRNGKey(0), args.batch)
    states = jax.vmap(lambda k: slam2d.init_state(
        k, cfg, with_metrics_ring=use_ring,
        metrics_ring_capacity=max(32, 2 * args.steps)))(keys)

    if args.shared_map and (args.matcher or cfg.icp.matcher) == "particle":
        # BASELINE config 5 proper: ONE shared grid, read replicated by the
        # particle matcher (pf_target) — no per-robot copies
        from slam_tpu.mapping.point_map import init_point_map
        from slam_tpu.parallel.shared_map import fleet_rollout_shared

        n_macro = max(1, -(-args.steps // 4))
        executed = 4 * n_macro
        shared0 = init_point_map(cfg.mls.size_x, cfg.icp.voxel_leaf_obs[0])

        run_shared = jax.jit(lambda s, sh: fleet_rollout_shared(
            s, sh, world, cfg, n_macro)[:2])

        states = states.replace(map_grid=None)
        states, shared = run_shared(states, shared0)
        jax.block_until_ready(states.pose)
        t = Throughput(batch=args.batch)
        states, shared = run_shared(states, shared)
        jax.block_until_ready(states.pose)
        t.tick(executed)
        err = np.linalg.norm(
            np.asarray(states.pose[:, :2] - states.true_pose[:, :2]), axis=1)
        print(f"{t.robot_steps_per_sec:,.0f} robot-steps/s on "
              f"{jax.default_backend()}  |  fleet median xy error "
              f"{np.median(err):.3f} m  |  icp ok "
              f"{int(states.scan_reg_ok.sum())}/{args.batch}")
        return

    if args.shared_map:
        # shared map for cloud-target matchers (fused/points): per-robot
        # grids psum-merged each macro, the TARGET cloud re-exported from
        # the merged grid. (The particle path above avoids the broadcast
        # entirely; these matchers still need map_cloud per robot.)
        import jax.numpy as jnp

        from slam_tpu.mapping.point_map import export_points
        from slam_tpu.parallel.shared_map import merge_maps

        n_macro = max(1, -(-args.steps // 4))
        executed = 4 * n_macro

        @jax.jit
        def run(s):
            def macro(ss, _):
                def ticks(x):
                    def tick(x2, _):
                        return slam2d.slam_step(
                            x2, world, cfg, refresh_map=False,
                            shift_maps=False), None
                    return jax.lax.scan(tick, x, None, length=4)[0]
                ss = jax.vmap(ticks)(ss)
                merged = merge_maps(ss.map_grid)

                def bcast(m):
                    return jnp.broadcast_to(m[None],
                                            (args.batch,) + m.shape)

                shared = jax.tree.map(bcast, merged)
                # refresh the registration TARGET from the merged grid:
                # fused/points match against map_cloud, which would
                # otherwise stay the initial empty cloud forever (ICP never
                # succeeding — the fleet silently dead-reckoned); grid/
                # particle read map_grid directly and get the shared grid
                shared_cloud = jax.tree.map(bcast, export_points(
                    merged, cfg.cloud.map_capacity,
                    ga_threshold=cfg.icp.ga_threshold,
                    recall=cfg.cloud.export_recall))
                return ss.replace(map_grid=shared,
                                  map_cloud=shared_cloud), None
            return jax.lax.scan(macro, s, None, length=n_macro)[0]
    else:
        executed = -(-args.steps // 4) * 4  # rollout rounds up to macros
        run = jax.jit(lambda s: jax.vmap(
            lambda x: slam2d.rollout(x, world, cfg, args.steps))(s)[0])
    states = run(states)
    jax.block_until_ready(states.pose)

    t = Throughput(batch=args.batch)
    states = run(states)
    jax.block_until_ready(states.pose)
    t.tick(executed)
    err = np.linalg.norm(
        np.asarray(states.pose[:, :2] - states.true_pose[:, :2]), axis=1)
    print(f"{t.robot_steps_per_sec:,.0f} robot-steps/s on "
          f"{jax.default_backend()}  |  fleet median xy error "
          f"{np.median(err):.3f} m  |  icp ok {int(states.scan_reg_ok.sum())}"
          f"/{args.batch}")
    if args.metrics and use_ring:
        recs = metrics.drain_ring(states.metrics_ring)
        import numpy as _np
        ok = _np.mean([r["icp_ok"] for r in recs]) if recs else float("nan")
        nc = _np.mean([r["num_corr"] for r in recs]) if recs else float("nan")
        mr = _np.mean([r["mean_residual"] for r in recs]) if recs \
            else float("nan")
        print(f"device-ring metrics over {len(recs)} records: "
              f"icp ok-rate {ok:.3f}  |  mean correspondences {nc:.1f}  |  "
              f"mean residual {mr:.4f} m^2")
    elif args.metrics:
        s = metrics.summary().get("slam_step", {})
        # records are per-robot-per-step (steps x batch)
        print(f"metrics over {len(metrics.records())} records "
              f"({len(metrics.records()) // max(args.batch, 1)} steps): "
              f"icp ok-rate {s.get('icp_ok', float('nan')):.3f}  |  "
              f"mean correspondences {s.get('num_corr', float('nan')):.1f}  |  "
              f"mean residual {s.get('mean_residual', float('nan')):.4f} m^2")


if __name__ == "__main__":
    main()
