"""Upstream JAX 0.9.0 footgun: re-jitting the pipeline with a second config
in ONE process breaks the C++ dispatch fast path.

Mechanism (pinned by bisection): the first trace of a pipeline-sized
function inlines its captured constants; a second trace of the same jitted
callable with a different static config hoists constants it has seen
before into `const_args` executable parameters. The python slow path
passes them (`executable.call(*const_args, *args)`) so the first call
after the re-trace is CORRECT — but the C++ fast path does not
(jax/_src/pjit.py:1248 "TODO(necula): remove num_const_args when fixing
the C++ path"), so the SECOND call fails loudly:

    ValueError: Execution supplied N buffers but compiled program expected M

Always loud, never silent corruption (verified: call-0-after-retrace
results are bit-identical to a clean process). Not avoidable by
jax.clear_caches(), step.clear_cache(), distinct lambda code objects, or
static_argnums — the only safe pattern is one config per process, which
bench.py, the examples, and the test suite already follow.

The repro runs in a SUBPROCESS: whether hoisting triggers depends on the
whole process's compilation history, so an in-process xfail flips between
xfail and xpass with suite ordering. The test asserts the bug is still
present; when a jax upgrade fixes the C++ path it fails with a clear
message saying the one-config-per-process guidance can be dropped.
"""

import subprocess
import sys

REPRO = r"""
import sys; sys.path.insert(0, "/root/repo")
import dataclasses, jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from slam_tpu.config import sim2d_config
from slam_tpu.pipeline import slam2d

cfg0 = sim2d_config()
sx = jnp.linspace(-3.0, 3.0, 360); sy = jnp.ones(360); hit = jnp.ones(360, bool)
cmd = jnp.array([0.1, 0.0, 0.0])
keys = jax.random.split(jax.random.PRNGKey(0), 4)
step = jax.jit(jax.vmap(slam2d.process_frame_planes,
                        in_axes=(0, None, None, None, None, None, None)),
               static_argnums=(6,))
for inlier in (1.0, 0.05):
    cfg = dataclasses.replace(
        cfg0, icp=dataclasses.replace(cfg0.icp, matcher="grid",
                                      inlier_dist=inlier))
    states = jax.vmap(lambda k: slam2d.init_state(k, cfg))(keys)
    for _ in range(2):
        states = step(states, sx, sy, hit, 0.01, cmd, cfg)
    jax.block_until_ready(states.pose)
print("NO-BUG: both configs dispatched cleanly")
"""


def test_retrace_second_config_fast_path_bug_still_present():
    r = subprocess.run([sys.executable, "-c", REPRO], capture_output=True,
                       text=True, timeout=600)
    if r.returncode == 0:
        raise AssertionError(
            "jax's re-trace const_args C++ fast-path bug appears FIXED "
            "(the two-config repro dispatched cleanly). Drop the "
            "one-config-per-process guidance in docs and the verify skill, "
            "then update this test.\n" + r.stdout)
    assert "buffers but compiled program expected" in r.stderr, (
        "repro failed for an unexpected reason:\n" + r.stderr[-2000:])
