"""Multi-host fleet scale-out — the DCN story (SURVEY.md §5 "distributed
communication backend"; replaces the reference's ROS multi-machine
`machine=` launch attribute, nasa_mapping.launch:3-14).

Topology rule (the scaling-book recipe): the robot (dp) axis is pure data
parallelism — its only cross-device traffic is the optional fleet-map psum
— so dp spans HOSTS over DCN; the spatial (sp) axis carries the halo
collectives of rolling grids every step, so sp stays INSIDE a host on ICI.
`make_fleet_mesh` encodes exactly that: hybrid DCN x ICI meshes when
multiple processes are attached, a plain mesh otherwise.

Single-process testability: pass `hosts=` to partition the local devices
into virtual hosts — the mesh has the same (dp, sp) axis layout a real
multi-host run would, so sharding/collective tests cover the topology
without a pod.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Attach this host to the fleet (jax.distributed.initialize wrapper).

    No-op when already initialized or when running single-process with no
    coordinator (the common local case). On TPU pods the arguments are
    auto-detected from the environment.

    Must run before anything touches devices: probing jax.process_count()
    here would itself initialize the XLA backend and make
    jax.distributed.initialize unconditionally raise — so the
    already-initialized check goes through jax.distributed's own state,
    never through a device call."""
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:   # older jax: no is_initialized
        from jax._src import distributed as _dist
        already = _dist.global_state.client is not None
    if already:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        if coordinator is not None:
            raise


def make_fleet_mesh(sp: int = 1, hosts: int | None = None) -> Mesh:
    """(dp, sp) mesh with dp spanning hosts (DCN) and sp inside a host (ICI).

    hosts: virtual host count for single-process tests (splits the local
    devices into `hosts` contiguous groups, dp-major across groups).
    Multi-process runs take the real process topology instead.
    """
    devices = jax.devices()
    n = len(devices)
    if jax.process_count() > 1:
        per_host = n // jax.process_count()
        if per_host % sp != 0:
            # the contiguous fallback below would silently stripe an sp
            # column across hosts — every-step halo collectives over DCN,
            # the exact layout this module exists to prevent
            raise ValueError(
                f"sp={sp} does not fit inside one host "
                f"({per_host} devices/host): spatial halo collectives "
                "must ride ICI — lower sp or use more devices per host")
        from jax.experimental import mesh_utils
        # process_is_granule: a DCN granule is one HOST process (our dp-
        # across-hosts topology), not a TPU slice — and it is the only
        # granule CPU devices can report (no slice_index attribute),
        # which the 2-process integration test relies on
        # (tests/test_two_process_distributed.py)
        arr = mesh_utils.create_hybrid_device_mesh(
            (per_host // sp, sp), (jax.process_count(), 1),
            devices=devices, process_is_granule=True)
        return Mesh(arr, axis_names=("dp", "sp"))
    hosts = hosts or 1
    assert n % hosts == 0 and (n // hosts) % sp == 0, (n, hosts, sp)
    per_host = n // hosts
    # dp-major across hosts: device[h * per_host + k] -> dp row, sp column.
    # sp columns stay within one host's contiguous devices (ICI on hardware).
    arr = np.asarray(devices).reshape(hosts, per_host // sp, sp)
    arr = arr.reshape(hosts * (per_host // sp), sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def host_local_batch(global_batch: int) -> int:
    """Per-host robot count for a dp-sharded fleet (data feeds are
    host-local: each host device_puts only its own robots)."""
    assert global_batch % jax.process_count() == 0
    return global_batch // jax.process_count()
