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
