"""Rendering — the rviz-analogue (SURVEY.md §5 observability).

The reference ships rviz configs + marker publishers (mapping.rviz, MLS
markers mls.cpp:558-679). Headless here: render trajectories, occupancy /
drivability grids, and MLS cluster layers to PNG via matplotlib when
available, else raw .npy dumps.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def render_trajectory(path: str, est: np.ndarray, true: np.ndarray | None = None,
                      world_pts: np.ndarray | None = None) -> None:
    """Trajectory overlay (the ekf_path_viz topic analogue)."""
    try:
        plt = _plt()
    except Exception:
        np.save(path + ".npy", est)
        return
    fig, ax = plt.subplots(figsize=(7, 7))
    if world_pts is not None and len(world_pts):
        ax.scatter(world_pts[:, 0], world_pts[:, 1], s=2, c="#999", label="map")
    if true is not None:
        ax.plot(true[:, 0], true[:, 1], "g-", lw=2, label="true")
    ax.plot(est[:, 0], est[:, 1], "b--", lw=1.5, label="estimate")
    ax.set_aspect("equal")
    ax.legend()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def render_grid(path: str, grid: np.ndarray, center=None, title="") -> None:
    """Drivability / occupancy grid image (the OccupancyGrid topic analogue):
    -1 unknown (gray), 0 occupied (black), 1 drivable (white)."""
    try:
        plt = _plt()
    except Exception:
        np.save(path + ".npy", grid)
        return
    img = np.full(grid.shape + (3,), 0.5)
    img[grid == 0] = (0.05, 0.05, 0.05)
    img[grid == 1] = (1.0, 1.0, 1.0)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(np.swapaxes(img, 0, 1), origin="lower")
    ax.set_title(title)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt = _plt()
    plt.close(fig)
