"""Trajectory CSV logging — the reference's ad-hoc regression artifact.

The map builder logs every accepted pose as a `x, y, yaw` CSV row
(global_matching/src/global_generate.cpp:101,194) and the repo ships one
such artifact (`global_matching/global_matching.csv`, 878 rows). The same
format here makes trajectories diffable against runs of the C++ stack and
consumable by the reference's MATLAB alignment scripts
(calcTransform.m:30-36).
"""

from __future__ import annotations

import numpy as np


def save_trajectory_csv(path: str, poses) -> int:
    """Write (T, 3+) pose rows as the reference's `x, y, yaw` CSV (extra
    columns beyond the first three — e.g. z — are appended after yaw).
    Returns the row count."""
    arr = np.asarray(poses, np.float64)
    if arr.ndim != 2 or arr.shape[1] < 3:
        raise ValueError(f"expected (T, >=3) poses, got {arr.shape}")
    np.savetxt(path, arr, fmt="%.6g", delimiter=", ")
    return arr.shape[0]


def load_trajectory_csv(path: str) -> np.ndarray:
    """Read a `x, y, yaw[, ...]` CSV (the reference's format — no header)
    as a float64 (T, K) array."""
    return np.loadtxt(path, delimiter=",", ndmin=2)
