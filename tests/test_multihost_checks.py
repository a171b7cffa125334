"""Multi-host mesh topology + donation/alias checks (SURVEY.md §5 items
26/27; VERDICT r1 partials)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.config import sim2d_config
from slam_tpu.parallel.mesh import fleet_sharding
from slam_tpu.parallel.multihost import host_local_batch, make_fleet_mesh
from slam_tpu.pipeline import slam2d
from slam_tpu.sim import world2d
from slam_tpu.utils.checks import assert_donation, donation_reused


def test_fleet_mesh_virtual_hosts_topology():
    """dp spans hosts; each sp column stays inside one host's devices."""
    mesh = make_fleet_mesh(sp=2, hosts=2)
    assert mesh.shape == {"dp": 4, "sp": 2}
    dev = np.asarray(jax.devices()).reshape(2, 4)  # host h owns row h
    host_of = {d: h for h in range(2) for d in dev[h]}
    grid = np.asarray(mesh.devices)
    # every sp row (fixed dp index) must be host-pure (halo rides ICI)
    for row in grid:
        hosts = {host_of[d] for d in row}
        assert len(hosts) == 1, f"sp row crosses hosts: {row}"
    # dp must cover both hosts (fleet batch spans DCN)
    assert {host_of[d] for d in grid[:, 0]} == {0, 1}


def test_fleet_step_on_multihost_style_mesh():
    """The fused step runs sharded on the hybrid-topology mesh."""
    cfg = sim2d_config()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(lambda k: slam2d.init_state(k, cfg))(keys)

    mesh = make_fleet_mesh(sp=2, hosts=2)
    sh = fleet_sharding(mesh, states)
    step = jax.jit(jax.vmap(lambda s: slam2d.slam_step(s, world, cfg)),
                   in_shardings=(sh,), out_shardings=sh)
    out = step(jax.device_put(states, sh))
    assert np.isfinite(np.asarray(out.pose)).all()
    assert host_local_batch(B) == B  # single process owns the whole fleet


def test_donation_check_detects_reuse_and_copy():
    x = jnp.ones((256, 256))

    donating = jax.jit(lambda a: a * 2.0, donate_argnums=0)
    assert donation_reused(donating, x)

    x2 = jnp.ones((256, 256))
    copying = jax.jit(lambda a: a * 2.0)  # no donation
    assert not donation_reused(copying, x2)
    with pytest.raises(AssertionError):
        assert_donation(copying, jnp.ones((256, 256)))


def test_fleet_rollout_donates_state():
    """The bench's donated state buffer is genuinely aliased: the fleet
    state is the big allocation, and silent copy would double it."""
    cfg = sim2d_config()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    states = jax.vmap(lambda k: slam2d.init_state(k, cfg))(keys)

    @functools.partial(jax.jit, donate_argnums=0)
    def run_block(s):
        out, _ = jax.vmap(lambda x: slam2d.rollout(x, world, cfg, 4))(s)
        return out

    assert_donation(run_block, states)
