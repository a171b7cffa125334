"""Cached f64 oracle goldens (suite-latency fix, VERDICT r4 weak 6).

The parity suites validate the pipeline against sequential NumPy oracles
transcribed from the reference C++ (SURVEY §4 golden-oracle strategy). The
oracles are O(N^2) Python and dominate those files' runtime, yet their
outputs are pure functions of (oracle source, config, input frames) — so
they are memoized to `tests/goldens/*.npz` keyed by a hash of exactly those
three things. Assertions are untouched; editing the oracle module, the
config, or the fixture data changes the key and recomputes. Goldens for
the standard configs are committed so fresh clones skip the slow pass.
"""

from __future__ import annotations

import hashlib
import inspect
import os
import sys

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")


def _hash_update_pytree(h, obj):
    import jax
    for leaf in jax.tree.leaves(obj):
        a = np.asarray(leaf)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(np.ascontiguousarray(a).tobytes())


def cached_oracle(name: str, oracle_fn, key_objs, data, compute):
    """Memoize `compute()` (returning one ndarray) on disk.

    name: golden family name; oracle_fn: the oracle whose MODULE source is
    part of the key (helpers included — any oracle edit invalidates);
    key_objs: reprs folded into the key (configs, scalars); data: pytrees
    of arrays folded in (frames, worlds)."""
    h = hashlib.sha256()
    h.update(inspect.getsource(sys.modules[oracle_fn.__module__]).encode())
    for o in key_objs:
        h.update(repr(o).encode())
    _hash_update_pytree(h, data)
    path = os.path.join(GOLDEN_DIR, f"{name}-{h.hexdigest()[:20]}.npz")
    if os.path.exists(path):
        return np.load(path)["out"]
    out = np.asarray(compute())
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    tmp = path[:-4] + f".tmp{os.getpid()}.npz"   # atomic vs parallel runners
    np.savez_compressed(tmp, out=out)
    os.replace(tmp, path)
    return out
