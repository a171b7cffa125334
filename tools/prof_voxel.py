"""Where does regenerate_map's time go at B=256, 12,288 pts -> 4,096 cap?
Dependency-chained timings (axon overlaps independent dispatches)."""
import time
import jax, jax.numpy as jnp
from slam_tpu.ops.voxel import voxel_downsample
from slam_tpu.types import PointCloud

B, N, CAP = 256, 12288, 4096
key = jax.random.PRNGKey(0)
xyz = jax.random.uniform(key, (B, N, 3), minval=-60, maxval=60)
valid = jnp.ones((B, N), bool)
flags = jnp.zeros((B, N), jnp.int32)


def timed(label, f, x):
    g = jax.jit(f)
    out = g(x); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = g(x); jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{label}: {dt*1000:8.1f} ms")


def full(x):
    c = PointCloud(xyz=x, valid=valid, flags=flags)
    out = jax.vmap(lambda cc: voxel_downsample(cc, (0.5, 0.5, 2.0), CAP))(c)
    return out.xyz


def sort_only(x):
    vid = (x[..., 0] * 1024 + x[..., 1]).astype(jnp.int32)
    return jax.vmap(jnp.argsort)(vid)


def sort_gather(x):
    vid = (x[..., 0] * 1024 + x[..., 1]).astype(jnp.int32)
    order = jax.vmap(jnp.argsort)(vid)
    return jnp.take_along_axis(x, order[..., None], axis=1)


def approx_sel(x):
    d2 = jnp.sum(x * x, axis=-1)
    _, idx = jax.lax.approx_max_k(-d2, CAP)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


timed("full voxel_downsample  ", full, xyz)
timed("argsort only           ", sort_only, xyz)
timed("argsort + 1 gather     ", sort_gather, xyz)
timed("approx_max_k + gather  ", approx_sel, xyz)
