import time, functools, dataclasses
import jax, jax.numpy as jnp
from slam_tpu.config import sim2d_config
from slam_tpu.pipeline import slam2d
from slam_tpu.sim import world2d

cfg = sim2d_config()
cfg = cfg.replace(graph=dataclasses.replace(
    cfg.graph, max_nodes=32, max_edges=128, keyframe_points=384))
world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
B = 256
keys = jax.random.split(jax.random.PRNGKey(0), B)
states = jax.vmap(lambda k: slam2d.init_state(k, cfg, with_graph=True))(keys)

def timed(fn, s, steps, label):
    f = jax.jit(fn)
    out = f(s); jax.block_until_ready(out.pose)
    t0 = time.perf_counter(); out = f(out); jax.block_until_ready(out.pose)
    dt = time.perf_counter() - t0
    print(f"{label}: {dt/1:7.3f} s/block  {B*steps/dt:8.0f} robot-steps/s")
    return out

# full config-4 block: 2 graph macros of 8 ticks
def full(s):
    out, _ = jax.vmap(lambda x: slam2d.rollout_with_graph(x, world, cfg, 2, 8))(s)
    return out
timed(full, states, 16, "full (ticks+graph)")

# ticks only: the SAME macro structure as rollout_with_graph minus the
# graph_update call (plain rollout maintains a point map graph mode lacks)
def ticks_only(s):
    def one(x):
        def macro(ss, _):
            ss = ss.replace(local_map=slam2d.shift_origin(
                ss.local_map, ss.pose[:2], cfg.mls))
            def tick(st, _):
                st = slam2d.slam_step(st, world, cfg, incremental_map=False,
                                      shift_maps=False)
                return st, None
            ss, _ = jax.lax.scan(tick, ss, None, length=8)
            return ss, None
        out, _ = jax.lax.scan(macro, x, None, length=2)
        return out
    return jax.vmap(one)(s)
st2 = jax.vmap(lambda k: slam2d.init_state(k, cfg, with_graph=True))(keys)
timed(ticks_only, st2, 16, "ticks only        ")

# graph update only x2 (state warmed by a few ticks so prev_scene/map exist)
def graph_only(s):
    def m(ss, _):
        ss = jax.vmap(lambda x: slam2d.graph_update(x, cfg))(ss)
        return ss, None
    out, _ = jax.lax.scan(m, s, None, length=2)
    return out
st3 = jax.vmap(lambda k: slam2d.init_state(k, cfg, with_graph=True))(keys)
st3, _ = jax.jit(lambda s: jax.vmap(
    lambda x: slam2d.rollout_with_graph(x, world, cfg, 1, 4))(s))(st3)
jax.block_until_ready(st3.pose)
timed(graph_only, st3, 16, "graph update x2   ")
