"""Decompose the config-4 graph tick on TPU: add_keyframe (edge ICP) vs
optimize vs map regeneration. Run: PYTHONPATH=/root/repo:/root/.axon_site
python tools/prof_graph2.py"""
import argparse
import time, dataclasses
import jax, jax.numpy as jnp
from slam_tpu.config import sim2d_config
from slam_tpu.pipeline import slam2d
from slam_tpu.sim import world2d
from slam_tpu.graph import pose_graph as pg

ap = argparse.ArgumentParser()
# A/B the GN batch early exit (one process per value — retrace footgun)
ap.add_argument("--opt-min-delta", type=float, default=None)
_args = ap.parse_args()

cfg = sim2d_config()
cfg = cfg.replace(graph=dataclasses.replace(
    cfg.graph, max_nodes=32, max_edges=128, keyframe_points=384))
if _args.opt_min_delta is not None:
    cfg = cfg.replace(graph=dataclasses.replace(
        cfg.graph, opt_min_delta=_args.opt_min_delta))
world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
B = 256
keys = jax.random.split(jax.random.PRNGKey(0), B)
states = jax.vmap(lambda k: slam2d.init_state(k, cfg, with_graph=True))(keys)
# warm: 2 macros of 4 ticks so graphs have nodes/edges and maps exist
states, _ = jax.jit(lambda s: jax.vmap(
    lambda x: slam2d.rollout_with_graph(x, world, cfg, 2, 4))(s))(states)
jax.block_until_ready(states.pose)


def timed(fn, arg, label, per_call=1):
    f = jax.jit(fn)
    out = f(arg); jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = f(arg); jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0
    print(f"{label}: {dt*1000/per_call:8.1f} ms/call (B={B})")
    return out


def add_kf(s):
    def one(x):
        g, added = pg.add_keyframe(x.graph, x.pose, x.prev_scene, cfg.icp,
                                   cfg.graph,
                                   min_points=cfg.graph.min_keyframe_points)
        return g
    return jax.vmap(one)(s)

def opt_only(s):
    def one(x):
        g, delta = pg.optimize(x.graph, cfg.graph)
        return g
    return jax.vmap(one)(s)

def regen_only(s):
    def one(x):
        return pg.regenerate_map(x.graph, x.map_cloud.capacity,
                                 cfg.icp.voxel_leaf_obs)
    return jax.vmap(one)(s)

timed(add_kf, states, "add_keyframe (gate+compact+4x edge ICP)")
timed(opt_only, states, "optimize (10 GN iters + z solve)      ")
timed(regen_only, states, "regenerate_map (12k scatter + voxel)  ")
