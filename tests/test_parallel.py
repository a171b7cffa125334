"""Fleet scale-out tests on the 8-device virtual CPU mesh (BASELINE config 5,
SURVEY.md §2 parallelism table): dp-sharded robots, sp-sharded grids, and
sharded == unsharded equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.config import sim2d_config
from slam_tpu.parallel.mesh import fleet_sharding, make_mesh, shard_fleet
from slam_tpu.pipeline import slam2d
from slam_tpu.sim import world2d


@pytest.fixture(scope="module")
def setup():
    cfg = sim2d_config()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(lambda k: slam2d.init_state(k, cfg))(keys)
    return cfg, world, states


def test_mesh_construction():
    assert jax.device_count() == 8
    mesh = make_mesh(8, sp=2)
    assert mesh.shape == {"dp": 4, "sp": 2}
    mesh = make_mesh(8)
    assert mesh.shape == {"dp": 8, "sp": 1}


def test_sharded_step_matches_unsharded(setup):
    cfg, world, states = setup
    step = jax.vmap(lambda s: slam2d.slam_step(s, world, cfg))

    ref = jax.jit(step)(states)

    mesh = make_mesh(8, sp=2)
    sh = fleet_sharding(mesh, states)
    sharded_states = jax.device_put(states, sh)

    @jax.jit
    def sharded_step(s):
        return jax.lax.with_sharding_constraint(step(s), sh)

    out = sharded_step(sharded_states)
    np.testing.assert_allclose(np.asarray(out.pose), np.asarray(ref.pose),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.local_map.counts),
                               np.asarray(ref.local_map.counts), atol=1e-5)
    # outputs actually live on the mesh
    assert len(out.pose.devices()) == 8 or len(out.pose.devices()) == 4


def test_multi_step_sharded_rollout(setup):
    cfg, world, states = setup
    mesh = make_mesh(8, sp=1)
    states = shard_fleet(mesh, states)
    sh = fleet_sharding(mesh, states)

    @jax.jit
    def run(s):
        def body(ss, _):
            ss = jax.vmap(lambda x: slam2d.slam_step(x, world, cfg))(ss)
            return jax.lax.with_sharding_constraint(ss, sh), None
        s, _ = jax.lax.scan(body, s, None, length=8)
        return s

    out = run(states)
    assert int(out.step[0]) == 8
    spread = np.asarray(out.pose).std(axis=0)
    assert np.isfinite(spread).all()


def test_per_robot_failure_isolation(setup):
    """Failure detection (SURVEY.md §5): one diverged robot is masked by the
    ICP ok-gate, not crashing the fleet step."""
    cfg, world, states = setup
    # corrupt robot 0's map (empty) => its ICP must fail, others unaffected
    mc = states.map_cloud
    valid = mc.valid.at[0].set(jnp.zeros_like(mc.valid[0]))
    states = states.replace(map_cloud=mc.replace(valid=valid),
                            map_grid=jax.tree.map(
                                lambda x: x.at[0].set(jnp.zeros_like(x[0])),
                                states.map_grid))
    step = jax.jit(jax.vmap(lambda s: slam2d.slam_step(s, world, cfg)))
    out = step(states)
    assert not bool(out.scan_reg_ok[0])
    assert np.isfinite(np.asarray(out.pose)).all()
