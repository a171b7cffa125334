"""Tracing / metrics — the observability layer (SURVEY.md §5).

The reference's instrumentation was ad-hoc wall-clock CSVs
(pointcloud_filter.cpp:288,348) and ROS log streams. Here:
  - `stage(name)`: jax.named_scope wrapper so XLA profiles attribute time to
    pipeline stages (segmentation, icp, ekf, grids, graph)
  - `trace(dir)`: device-trace context manager (jax.profiler.trace)
  - `Throughput`: steps/sec + robot-steps/sec counters for benches
  - host-side scoped wall timing lives in the native runtime profiler
    (slam_tpu.runtime.native.Profiler — a separate, explicit API)
"""

from __future__ import annotations

import time

import jax


def stage(name: str):
    """Named scope for pipeline stages: shows up in XLA/device profiles."""
    return jax.named_scope(name)


def trace(log_dir: str):
    """Device-trace context manager — jax.profiler.trace itself (kept as a
    named alias so call sites read as slam_tpu API)."""
    return jax.profiler.trace(log_dir)


class Throughput:
    """steps/sec + aggregate robot-steps/sec measurement helper."""

    def __init__(self, batch: int = 1):
        self.batch = batch
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return self._steps / dt

    @property
    def robot_steps_per_sec(self) -> float:
        return self.steps_per_sec * self.batch
