"""TPU probe for the reference-scale path: on-chip tiled-kernel equivalence,
tiled-kernel throughput at 20k pts/class, and ref-scale rollout timing.

Run from the repo root:  python - < tools/scale_probe.py
(PYTHONPATH breaks the axon backend registration — see docs/PERF.md.)
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

import slam_tpu  # noqa: F401  (precision config)
from slam_tpu.config import IcpConfig, ref_scale_config
from slam_tpu.ops import icp_pallas as ip
from slam_tpu.ops.icp import icp_fit

print("backend:", jax.default_backend())


def make_problem(rng, S, C, cfg):
    mx = rng.uniform(-60, 60, C).astype(np.float32)
    my = rng.uniform(-60, 60, C).astype(np.float32)
    mga = rng.rand(C) < 0.4
    mvalid = rng.rand(C) < 0.95
    idx = rng.choice(C, S)
    th = 0.04
    c0, s0 = np.cos(th), np.sin(th)
    sx0 = mx[idx] + rng.normal(0, 0.05, S).astype(np.float32)
    sy0 = my[idx] + rng.normal(0, 0.05, S).astype(np.float32)
    sx = (c0 * (sx0 - 0.3) + s0 * (sy0 + 0.2)).astype(np.float32)
    sy = (-s0 * (sx0 - 0.3) + c0 * (sy0 + 0.2)).astype(np.float32)
    sga = mga[idx]
    svalid = rng.rand(S) < 0.97
    sc = ip.encode_scene_class(jnp.asarray(svalid), jnp.asarray(sga))
    mc = ip.encode_model_class(jnp.asarray(mvalid), jnp.asarray(mga))
    return (jnp.asarray(sx), jnp.asarray(sy), sc,
            jnp.asarray(mx), jnp.asarray(my), mc,
            jnp.asarray(svalid), jnp.asarray(sga),
            jnp.asarray(mvalid), jnp.asarray(mga))


# --- 1. on-chip equivalence: tiled kernel vs XLA icp_fit (moderate size) ---
cfg = IcpConfig(max_iterations=12, inlier_dist=5.0, min_delta=1e-6)
rng = np.random.RandomState(0)
sx, sy, sc, mx, my, mc, svalid, sga, mvalid, mga = make_problem(
    rng, 700, 1500, cfg)
init = jnp.zeros(3, jnp.float32)
ref = icp_fit(jnp.stack([sx, sy], -1), svalid, sga,
              jnp.stack([mx, my], -1), mvalid, mga, init, cfg)
r2 = ip._icp_batched_planes_tiled(sx[None], sy[None], sc[None], mx[None],
                                  my[None], mc[None], init[None], cfg,
                                  256, 512)
err = np.abs(np.asarray(r2.pose[0]) - np.asarray(ref.pose))
print("tiled-vs-xla pose err:", err, "ncorr", int(r2.num_corr[0]),
      int(ref.num_corr))
assert err.max() < 2e-3, err

# --- 2. tiled kernel throughput at the reference working point ---
for B, S, C in ((8, 4096, 40960), (16, 4096, 40960)):
    rngb = np.random.RandomState(1)
    probs = [make_problem(rngb, S, C, cfg) for _ in range(1)]
    sx, sy, sc, mx, my, mc, *_ = probs[0]

    def tile(a, B=B):
        return jnp.broadcast_to(a[None], (B,) + a.shape)

    args = (tile(sx), tile(sy), tile(sc), tile(mx), tile(my), tile(mc),
            jnp.zeros((B, 3), jnp.float32))

    @jax.jit
    def run(args):
        # dependency chain so axon timing is honest
        r = ip._icp_batched_planes_tiled(*args, cfg, 256, 2048)
        a2 = (args[0] + 1e-9 * r.pose[:, 0, None],) + args[1:]
        r2 = ip._icp_batched_planes_tiled(*a2, cfg, 256, 2048)
        return r2

    r = run(args)
    jax.block_until_ready(r.pose)
    t0 = time.perf_counter()
    r = run(args)
    jax.block_until_ready(r.pose)
    dt = (time.perf_counter() - t0) / 2  # two chained calls
    print(f"tiled S={S} C={C} B={B}: {dt*1e3:.1f} ms/call "
          f"({dt/B*1e3:.2f} ms/robot)")

# --- 3. ref-scale rollout (grid matcher) ---
from slam_tpu.pipeline import slam3d  # noqa: E402
from slam_tpu.sim import world3d  # noqa: E402

for matcher, B, steps in (("grid", 16, 8), ("fused", 16, 8)):
    cfg3 = ref_scale_config()
    cfg3 = cfg3.replace(icp=dataclasses.replace(cfg3.icp, matcher=matcher))
    world = world3d.make_world(jax.random.PRNGKey(42), cfg3.sim)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(lambda k: slam3d.init_state_3d(k, cfg3, world))(keys)
    gms = jax.vmap(lambda _: slam3d.init_ground_map(cfg3))(jnp.arange(B))

    import functools

    @functools.partial(jax.jit, donate_argnums=0)
    def block(sg):
        def one(ss, gg):
            out, gm2, _ = slam3d.rollout_3d(ss, world, gg, cfg3, steps)
            return out, gm2
        return jax.vmap(one)(*sg)

    t0 = time.perf_counter()
    sg = block((states, gms))
    jax.block_until_ready(jax.tree.leaves(sg)[0])
    print(f"[{matcher}] compile+first: {time.perf_counter()-t0:.1f} s")
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        sg = block(sg)
        jax.block_until_ready(jax.tree.leaves(sg)[0])
        dt = time.perf_counter() - t0
        best = max(best, B * steps / dt)
    print(f"[{matcher}] ref-scale rollout B={B}: {best:.1f} robot-steps/s")
print("PROBE DONE")
