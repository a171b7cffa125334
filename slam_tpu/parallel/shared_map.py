"""Fleet-shared global map — BASELINE config 5's "shared map on TPU pod".

Robots exploring one world merge their observations into a single map. The
point-map grid is an additive sufficient statistic (counts + offset sums),
so merging is a psum over the robot mesh axis — XLA rides it over ICI. The
reference's analogue is graph_slam's single global MLS map fed by every
scan (graph_slam.cpp:260-280), except here N robots feed it concurrently.

Requires world-aligned grids (same center/resolution): use non-rolling
shared frames (shift_point_map never called, center pinned at the origin),
matching the reference's non-rolling global map (mls.h:191-206).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slam_tpu.mapping.point_map import PointMapGrid


def _alignment_guard(grids: PointMapGrid):
    """1.0 when every robot's grid shares robot 0's center, NaN otherwise:
    summing cell accumulators of grids covering DIFFERENT world regions is
    silently-corrupt data (e.g. a caller that forgot shift_maps=False), so
    a misaligned merge poisons the output loudly instead."""
    aligned = jnp.all(grids.center == grids.center[0])
    return jnp.where(aligned, 1.0, jnp.nan)


def merge_maps(grids: PointMapGrid) -> PointMapGrid:
    """Merge a batch of world-aligned grids (leading batch axis) into one."""
    g = _alignment_guard(grids)
    return PointMapGrid(
        count=g * jnp.sum(grids.count, axis=0),
        sum_x=jnp.sum(grids.sum_x, axis=0),
        sum_y=jnp.sum(grids.sum_y, axis=0),
        sum_z=jnp.sum(grids.sum_z, axis=0),
        center=grids.center[0],
        resolution=grids.resolution,
    )


def make_shared_map_merger(mesh: Mesh):
    """shard_map merger: per-device partial sums + psum over the dp axis.

    Input: batched world-aligned grids sharded over dp. Output: the merged
    global grid, replicated. The psum is the only cross-device traffic —
    one grid-sized all-reduce over ICI per merge.

    Runs WITH shard_map's replication check: only the additive channels go
    through the mapped region (local sum + psum over dp makes them provably
    invariant). The center — which is per-shard data inside the mapped
    region and therefore can't be proven replicated — is taken outside from
    robot 0, where the world-aligned precondition makes it the fleet's.
    """

    def _merge_vals(count, sx, sy, sz):
        return tuple(jax.lax.psum(jnp.sum(v, axis=0), "dp")
                     for v in (count, sx, sy, sz))

    sm = jax.shard_map(_merge_vals, mesh=mesh, in_specs=P("dp"),
                       out_specs=P())

    @jax.jit
    def merge(grids: PointMapGrid) -> PointMapGrid:
        c, sx, sy, sz = sm(grids.count, grids.sum_x, grids.sum_y, grids.sum_z)
        return PointMapGrid(count=_alignment_guard(grids) * c,
                            sum_x=sx, sum_y=sy, sum_z=sz,
                            center=grids.center[0],
                            resolution=grids.resolution)

    return merge
