"""Device-mesh fleet scaling — the TPU-native replacement for the reference's
ROS multi-machine pub/sub (nasa_mapping.launch:3-14 `machine=` attribute).

Mesh axes:
  dp — robots (data parallel; the reference's one-robot-per-process becomes
       thousands of vmapped robots sharded across chips)
  sp — spatial sharding of per-robot grids (the long-context analogue:
       SURVEY.md §5, grids ride HBM sharded along a spatial axis; XLA inserts
       the halo collectives for rolls/stencils over ICI)

The reference has no DP/TP/PP/EP (SURVEY.md §2 parallelism table): its only
parallelism is process pipelining + a pthread pool, both absorbed into the
fused jitted step. dp x sp is the full sharding story for this workload.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slam_tpu.types import SlamState


def make_mesh(n_devices: int | None = None, sp: int = 1,
              devices=None) -> Mesh:
    """Mesh over (dp, sp). dp = n_devices/sp robots-axis shards."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % sp != 0:
        raise ValueError(
            f"n_devices={n_devices} must be divisible by sp={sp} "
            "(the (dp, sp) mesh is a full factorization — a floor division "
            "would silently drop devices)")
    devices = np.asarray(devices[:n_devices]).reshape(n_devices // sp, sp)
    return Mesh(devices, axis_names=("dp", "sp"))


def grid_rows_sharding(mesh: Mesh, pytree):
    """Sharding pytree for batched per-robot GRID containers (OccupancyGrid,
    PointMapGrid, MlsGrid, GroundMap, ...): every leaf shaped (B, H, W, ...)
    shards its rows over sp (batch over dp); smaller leaves (centers,
    origins) shard over dp only. This is the spatial-sharding axis — the
    long-context analogue of SURVEY.md §5 — so grids ride HBM partitioned
    and XLA inserts the halo collectives for rolls/stencils over ICI."""

    def spec(leaf):
        if leaf is None or getattr(leaf, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        if leaf.ndim >= 3:  # (B, H, W, ...) -> rows over sp
            return NamedSharding(
                mesh, P("dp", "sp", *([None] * (leaf.ndim - 2))))
        return NamedSharding(mesh, P("dp", *([None] * (leaf.ndim - 1))))

    return jax.tree.map(spec, pytree)


def fleet_sharding(mesh: Mesh, states: SlamState):
    """Sharding pytree for a batched SlamState: batch axis over dp; the
    per-robot spatial grids (occupancy counts/drivable, point-map channels)
    additionally shard their rows over sp."""

    def batch_spec(leaf):
        if leaf is None or getattr(leaf, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P("dp", *([None] * (leaf.ndim - 1))))

    sh = jax.tree.map(batch_spec, states)
    sh = sh.replace(local_map=grid_rows_sharding(mesh, states.local_map))
    if states.map_grid is not None:
        sh = sh.replace(map_grid=grid_rows_sharding(mesh, states.map_grid))
    return sh


def shard_fleet(mesh: Mesh, states: SlamState) -> SlamState:
    """Place a batched state onto the mesh."""
    return jax.device_put(states, fleet_sharding(mesh, states))
