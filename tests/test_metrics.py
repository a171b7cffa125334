"""Observability: in-step host-callback scalar metrics + jax_debug_nans
(SURVEY.md §5 plan; VERDICT r1 next-round item 10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.config import sim2d_config
from slam_tpu.pipeline import slam2d
from slam_tpu.sim import world2d
from slam_tpu.utils import metrics


def test_metrics_emitted_from_jitted_vmapped_step():
    cfg = sim2d_config()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(lambda k: slam2d.init_state(k, cfg))(keys)

    metrics.enable()
    try:
        metrics.clear()
        step = jax.jit(jax.vmap(lambda s: slam2d.slam_step(s, world, cfg)))
        for _ in range(3):
            states = step(states)
        jax.block_until_ready(states.pose)
        recs = [r for r in metrics.records() if r["name"] == "slam_step"]
        # vmap unrolls the callback per robot: one record per robot per step
        assert len(recs) == 3 * B, f"expected {3 * B} records, got {len(recs)}"
        for r in recs:
            assert {"icp_ok", "num_corr", "mean_residual"} <= set(r)
            assert r["icp_ok"] in (0.0, 1.0)
        s = metrics.summary()["slam_step"]
        assert np.isfinite(s["mean_residual"])
        assert 0.0 <= s["icp_ok"] <= 1.0         # fleet ok-rate over history
    finally:
        metrics.disable()


def test_metrics_disabled_is_silent():
    cfg = sim2d_config()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam2d.init_state(jax.random.PRNGKey(0), cfg)
    metrics.clear()
    assert not metrics.enabled()
    st = jax.jit(slam2d.slam_step, static_argnames="cfg")(st, world, cfg)
    jax.block_until_ready(st.pose)
    assert metrics.records() == []


def test_metrics_user_callback():
    got = []
    metrics.enable(callback=got.append)
    try:
        @jax.jit
        def f(x):
            metrics.emit("custom", value=x * 2)
            return x

        f(jnp.float32(3.0))
        jax.effects_barrier()
        assert got and got[0]["name"] == "custom" and got[0]["value"] == 6.0
    finally:
        metrics.disable()


def test_nan_debug_mode_raises():
    metrics.nan_debug(True)
    try:
        @jax.jit
        def bad(x):
            return jnp.log(x - 2.0)  # log(-1) -> NaN

        with pytest.raises(FloatingPointError):
            jax.block_until_ready(bad(jnp.float32(1.0)))
    finally:
        metrics.nan_debug(False)


def test_device_metrics_ring_matches_callback_path():
    """On-TPU fallback (VERDICT r2 item 8): the device-side ring must record
    the same per-step scalars the host-callback path reports, without any
    host callback in the compiled program."""
    import numpy as np

    from slam_tpu.config import sim2d_config
    from slam_tpu.pipeline import slam2d
    from slam_tpu.sim import world2d
    from slam_tpu.utils import metrics

    cfg = sim2d_config()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    st = slam2d.init_state(jax.random.PRNGKey(0), cfg,
                           with_metrics_ring=True, metrics_ring_capacity=32)

    # callback path for reference values
    metrics.enable()
    metrics.clear()
    for _ in range(6):
        st = jax.jit(lambda s: slam2d.slam_step(s, world, cfg))(st)
    jax.block_until_ready(st.pose)
    cb = [r for r in metrics.records() if r["name"] == "slam_step"]
    metrics.disable()

    recs = metrics.drain_ring(st.metrics_ring)
    assert len(recs) == 6, len(recs)
    got = sorted((int(r["step"]), round(r["num_corr"], 1)) for r in recs)
    want = sorted((i, round(c["num_corr"], 1)) for i, c in enumerate(cb))
    assert got == want, (got, want)
    ok_rate_ring = np.mean([r["icp_ok"] for r in recs])
    ok_rate_cb = np.mean([c["icp_ok"] for c in cb])
    assert abs(ok_rate_ring - ok_rate_cb) < 1e-6


def test_ring_rows_keep_site_and_written_channels():
    """Rows from different emission sites must stay distinguishable, and a
    channel a site never wrote must be ABSENT from its drained record (an
    unwritten 0.0 used to read as a measured zero — graph rows dragged the
    mean icp_ok toward 0)."""
    import jax.numpy as jnp
    from slam_tpu.utils import metrics

    ring = metrics.init_ring(8)
    ring = metrics.ring_write(ring, site="slam_step", step=jnp.int32(1),
                              icp_ok=jnp.float32(1.0),
                              num_corr=jnp.float32(42.0))
    ring = metrics.ring_write(ring, site="graph_update", step=jnp.int32(1),
                              graph_nodes=jnp.float32(3.0))
    recs = metrics.drain_ring(ring)
    assert len(recs) == 2
    by_name = {r["name"]: r for r in recs}
    assert by_name["slam_step"]["icp_ok"] == 1.0
    assert by_name["slam_step"]["num_corr"] == 42.0
    assert "graph_nodes" not in by_name["slam_step"]
    assert by_name["graph_update"]["graph_nodes"] == 3.0
    assert "icp_ok" not in by_name["graph_update"]
