"""ctypes bindings for the native host runtime (runtime/src/slamrt.cpp).

The C++ layer replaces the reference's runtime plumbing (ROS pub/sub
transport, ros::spin ingest threads, AprilTag's timeprofile profiler) with a
lock-free frame ring + threaded loader feeding the jitted TPU step, and a
microsecond scoped profiler. Builds on demand with `make -C runtime`.
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "runtime", "build", "libslamrt.so")
_lib: Optional[C.CDLL] = None


def build(force: bool = False) -> str:
    """Compile libslamrt.so if missing. Returns the path."""
    if force or not os.path.exists(_SO):
        subprocess.run(["make", "-C", os.path.join(_REPO, "runtime")],
                       check=True, capture_output=True)
    return _SO


def lib() -> C.CDLL:
    global _lib
    if _lib is None:
        _lib = C.CDLL(build())
        L = _lib
        L.slamrt_ring_create.restype = C.c_void_p
        L.slamrt_ring_create.argtypes = [C.c_uint32, C.c_uint64]
        L.slamrt_ring_destroy.argtypes = [C.c_void_p]
        L.slamrt_ring_acquire.restype = C.POINTER(C.c_float)
        L.slamrt_ring_acquire.argtypes = [C.c_void_p, C.c_int]
        L.slamrt_ring_publish.argtypes = [C.c_void_p, C.c_uint64]
        L.slamrt_ring_abort.argtypes = [C.c_void_p]
        L.slamrt_ring_pop.restype = C.c_uint64
        L.slamrt_ring_pop.argtypes = [C.c_void_p, C.POINTER(C.c_float),
                                      C.POINTER(C.c_uint64)]
        L.slamrt_ring_published.restype = C.c_uint64
        L.slamrt_ring_published.argtypes = [C.c_void_p]
        L.slamrt_ring_dropped.restype = C.c_uint64
        L.slamrt_ring_dropped.argtypes = [C.c_void_p]
        L.slamrt_ring_available.restype = C.c_uint32
        L.slamrt_ring_available.argtypes = [C.c_void_p]
        L.slamrt_loader_create_replay.restype = C.c_void_p
        L.slamrt_loader_create_replay.argtypes = [
            C.c_void_p, C.c_char_p, C.c_uint64, C.c_int, C.c_double]
        L.slamrt_loader_create_synthetic.restype = C.c_void_p
        L.slamrt_loader_create_synthetic.argtypes = [
            C.c_void_p, C.c_uint64, C.c_uint64, C.c_double, C.c_int]
        for f in ("start", "stop", "destroy"):
            getattr(L, f"slamrt_loader_{f}").argtypes = [C.c_void_p]
        L.slamrt_loader_produced.restype = C.c_uint64
        L.slamrt_loader_produced.argtypes = [C.c_void_p]
        L.slamrt_loader_error.restype = C.c_int
        L.slamrt_loader_error.argtypes = [C.c_void_p]
        L.slamrt_prof_create.restype = C.c_void_p
        L.slamrt_prof_destroy.argtypes = [C.c_void_p]
        L.slamrt_prof_begin.restype = C.c_int32
        L.slamrt_prof_begin.argtypes = [C.c_void_p, C.c_char_p]
        L.slamrt_prof_end.argtypes = [C.c_void_p, C.c_int32]
        L.slamrt_prof_lookup.restype = C.c_int32
        L.slamrt_prof_lookup.argtypes = [C.c_void_p, C.c_char_p]
        L.slamrt_prof_stats.argtypes = [
            C.c_void_p, C.c_int32, C.POINTER(C.c_uint64),
            C.POINTER(C.c_double), C.POINTER(C.c_double), C.POINTER(C.c_double)]
        L.slamrt_prof_report.restype = C.c_uint64
        L.slamrt_prof_report.argtypes = [C.c_void_p, C.c_char_p, C.c_uint64]
    return _lib


class FrameRing:
    """SPSC frame ring: the transport between host sensor feeds and the
    jitted device step (replaces ROS topics)."""

    def __init__(self, slots: int, frame_shape: tuple):
        self._shape = tuple(frame_shape)
        self._floats = int(np.prod(frame_shape))
        self._r = lib().slamrt_ring_create(slots, self._floats)
        self._scratch = np.empty(self._floats, np.float32)

    def push(self, frame: np.ndarray, drop_oldest: bool = True) -> bool:
        # validate BEFORE acquire and abort on copy failure: acquire holds
        # the C-side producer mutex until publish, so raising between the
        # two would deadlock every later push and loader thread
        arr = np.asarray(frame, np.float32).ravel()
        if arr.size != self._floats:
            raise ValueError(f"frame has {arr.size} floats, ring expects "
                             f"{self._floats} (shape {self._shape})")
        ptr = lib().slamrt_ring_acquire(self._r, int(drop_oldest))
        if not ptr:
            return False
        try:
            buf = np.ctypeslib.as_array(ptr, shape=(self._floats,))
            buf[:] = arr
        except Exception:
            lib().slamrt_ring_abort(self._r)
            raise
        lib().slamrt_ring_publish(self._r, 0)
        return True

    def pop(self):
        """Returns (seq, frame) or (0, None)."""
        t = C.c_uint64(0)
        seq = lib().slamrt_ring_pop(
            self._r, self._scratch.ctypes.data_as(C.POINTER(C.c_float)),
            C.byref(t))
        if seq == 0:
            return 0, None
        return seq, self._scratch.reshape(self._shape).copy()

    @property
    def published(self):
        return lib().slamrt_ring_published(self._r)

    @property
    def dropped(self):
        return lib().slamrt_ring_dropped(self._r)

    @property
    def available(self):
        return lib().slamrt_ring_available(self._r)

    def __del__(self):
        try:
            lib().slamrt_ring_destroy(self._r)
        except Exception:
            pass


class ScanLoader:
    """Threaded producer filling a FrameRing (replay file or synthetic)."""

    def __init__(self, ring: FrameRing, path: str | None = None,
                 seed: int = 0, rate_hz: float = 0.0, loop: bool = True,
                 num_threads: int = 2):
        # hold the ring: the loader threads write into its C buffer, so the
        # FrameRing must outlive this loader (a temporary passed in would
        # otherwise be finalized immediately — use-after-free in C)
        self._ring = ring
        if path is not None:
            if not os.path.exists(path):
                raise FileNotFoundError(f"replay file not found: {path}")
            if os.path.getsize(path) < ring._floats * 4:
                raise ValueError(
                    f"replay file {path} is smaller than one "
                    f"{ring._floats}-float frame")
            self._l = lib().slamrt_loader_create_replay(
                ring._r, path.encode(), ring._floats, int(loop), rate_hz)
        else:
            self._l = lib().slamrt_loader_create_synthetic(
                ring._r, ring._floats, seed, rate_hz, num_threads)

    def start(self):
        lib().slamrt_loader_start(self._l)

    @property
    def error(self) -> bool:
        """True when a replay worker failed to open its file."""
        return bool(lib().slamrt_loader_error(self._l))

    def stop(self):
        lib().slamrt_loader_stop(self._l)

    @property
    def produced(self):
        return lib().slamrt_loader_produced(self._l)

    def __del__(self):
        try:
            lib().slamrt_loader_destroy(self._l)
        except Exception:
            pass


class Profiler:
    """Scoped microsecond profiler (AprilTag timeprofile.h analogue)."""

    def __init__(self):
        self._p = lib().slamrt_prof_create()

    class _Scope:
        def __init__(self, prof, name):
            self.prof, self.name = prof, name.encode()

        def __enter__(self):
            self.id = lib().slamrt_prof_begin(self.prof._p, self.name)
            return self

        def __exit__(self, *a):
            lib().slamrt_prof_end(self.prof._p, self.id)

    def scope(self, name: str) -> "_Scope":
        return Profiler._Scope(self, name)

    def stats(self, name: str):
        pid = lib().slamrt_prof_lookup(self._p, name.encode())
        calls = C.c_uint64(0)
        tot = C.c_double(0)
        mn = C.c_double(0)
        mx = C.c_double(0)
        lib().slamrt_prof_stats(self._p, pid, C.byref(calls), C.byref(tot),
                                C.byref(mn), C.byref(mx))
        return dict(calls=calls.value, total_us=tot.value, min_us=mn.value,
                    max_us=mx.value)

    def report(self) -> str:
        buf = C.create_string_buffer(64 * 1024)
        n = lib().slamrt_prof_report(self._p, buf, len(buf))
        return buf.raw[:n].decode()

    def __del__(self):
        try:
            lib().slamrt_prof_destroy(self._p)
        except Exception:
            pass
