"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding is
testable without TPUs (SURVEY.md §4 implication (4)).

Note: this image registers an `axon` TPU backend via sitecustomize and sets
JAX_PLATFORMS=axon; the env var alone doesn't override it, so we force the
platform through jax.config before any device is touched.

RUNNING THE SUITE: use `python tools/run_tests.py` (per-file subprocesses).
A single-process `pytest tests/ -q` deterministically segfaults inside
XLA:CPU `backend_compile_and_load` ~1/3 of the way in — a backend bug that
only manifests at suite scale, with the compile cache already disabled
(see below). Individual files always run clean.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# SLAM_TPU_TEST_ON_TPU=1 runs the suite against the real chip (pallas paths
# live); default is the 8-device virtual CPU mesh.
if not os.environ.get("SLAM_TPU_TEST_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
    # The persistent compilation cache exists for slow axon TPU compiles;
    # on the CPU backend it has segfaulted full-suite runs twice (XLA:CPU
    # executable (de)serialization crashes deep in
    # compilation_cache.{get,put}_executable_and_time — deterministic at
    # suite scale, unreproducible in isolation). CPU compiles are cheap:
    # run the suite uncached.
    jax.config.update("jax_enable_compilation_cache", False)
jax.config.update("jax_threefry_partitionable", True)
