"""Checkpoint / resume of the full SLAM state pytree.

The reference persists only the aggregated map pcd (global_generate.cpp:238);
pose graph and EKF state are never serialized (SURVEY.md §5). Here the whole
SlamState (poses, covariances, grids, graph, RNG) checkpoints as one pytree —
orbax-backed when available, with a numpy .npz fallback so checkpointing
never depends on optional deps.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten(state: Any):
    leaves, treedef = jax.tree.flatten(state)
    return leaves, treedef


def save(path: str, state: Any) -> None:
    """Save a pytree checkpoint. Directory path => orbax; file path => npz."""
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        # save the flattened leaves (a list pytree): restore order is then
        # positional, independent of dataclass-vs-dict key ordering
        leaves, _ = _flatten(state)
        ckptr.save(os.path.abspath(path),
                   [np.asarray(x) for x in leaves], force=True)
        return
    except Exception:
        pass
    leaves, _ = _flatten(state)
    np.savez_compressed(
        path if path.endswith(".npz") else path + ".npz",
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def restore(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (shape/dtype template)."""
    try:
        import orbax.checkpoint as ocp
        if os.path.isdir(path):
            ckptr = ocp.PyTreeCheckpointer()
            out = ckptr.restore(os.path.abspath(path))
            leaves_t, treedef = _flatten(like)
            assert len(out) == len(leaves_t), "checkpoint/template mismatch"
            return jax.tree.unflatten(
                treedef, [np.asarray(r).astype(np.asarray(t).dtype)
                          for r, t in zip(out, leaves_t)])
    except AssertionError:
        raise
    except Exception:
        pass
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves_t, treedef = _flatten(like)
    leaves = [npz[f"leaf_{i}"] for i in range(len(leaves_t))]
    return jax.tree.unflatten(treedef, leaves)
