"""Native host runtime tests (runtime/src/slamrt.cpp via ctypes)."""

import os
import struct
import tempfile
import time

import numpy as np
import pytest

pytest.importorskip("ctypes")

from slam_tpu.runtime import native


@pytest.fixture(scope="module", autouse=True)
def built():
    native.build()


def test_ring_push_pop_fifo():
    ring = native.FrameRing(slots=4, frame_shape=(8, 3))
    f0 = np.arange(24, dtype=np.float32).reshape(8, 3)
    assert ring.push(f0)
    assert ring.push(f0 * 2)
    seq1, out1 = ring.pop()
    seq2, out2 = ring.pop()
    assert (seq1, seq2) == (1, 2)
    np.testing.assert_array_equal(out1, f0)
    np.testing.assert_array_equal(out2, f0 * 2)
    seq3, out3 = ring.pop()
    assert seq3 == 0 and out3 is None


def test_ring_drop_oldest():
    ring = native.FrameRing(slots=2, frame_shape=(4,))
    for i in range(5):
        ring.push(np.full(4, i, np.float32))
    assert ring.dropped == 3
    seq, frame = ring.pop()
    assert frame[0] == 3.0  # oldest surviving frame


def test_synthetic_loader_threads():
    ring = native.FrameRing(slots=64, frame_shape=(128,))
    loader = native.ScanLoader(ring, seed=7, num_threads=4)
    loader.start()
    deadline = time.time() + 5.0
    while loader.produced < 1000 and time.time() < deadline:
        time.sleep(0.01)
    loader.stop()
    assert loader.produced >= 1000, "4-thread producer too slow"
    seq, frame = ring.pop()
    assert seq > 0
    assert np.isfinite(frame).all()
    assert (np.abs(frame) <= 50.0 + 1e-3).all()


def test_replay_loader_roundtrip():
    frames = np.stack([np.full(16, i, np.float32) for i in range(5)])
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        f.write(frames.tobytes())
        path = f.name
    try:
        ring = native.FrameRing(slots=16, frame_shape=(16,))
        loader = native.ScanLoader(ring, path=path, loop=False)
        loader.start()
        deadline = time.time() + 5.0
        got = []
        while len(got) < 5 and time.time() < deadline:
            seq, fr = ring.pop()
            if seq:
                got.append(fr[0])
        loader.stop()
        assert got == [0.0, 1.0, 2.0, 3.0, 4.0]
    finally:
        os.unlink(path)


def test_profiler_scopes():
    prof = native.Profiler()
    for _ in range(10):
        with prof.scope("outer"):
            with prof.scope("inner"):
                time.sleep(0.001)
    s_out = prof.stats("outer")
    s_in = prof.stats("inner")
    assert s_out["calls"] == 10 and s_in["calls"] == 10
    assert s_out["total_us"] >= s_in["total_us"] > 5000
    assert "outer" in prof.report()


def test_push_wrong_size_raises_without_deadlock():
    """A wrong-sized frame must raise BEFORE acquiring the producer lock —
    previously the raise landed between acquire and publish, leaving the
    C-side mutex held forever (every later push deadlocked)."""
    import pytest

    from slam_tpu.runtime import native

    ring = native.FrameRing(4, (16,))
    with pytest.raises(ValueError, match="floats"):
        ring.push(np.zeros(7, np.float32))
    # the ring is still fully usable afterwards
    assert ring.push(np.arange(16, dtype=np.float32))
    seq, frame = ring.pop()
    assert seq == 1
    np.testing.assert_array_equal(frame, np.arange(16, dtype=np.float32))


def test_replay_missing_file_raises():
    import pytest

    from slam_tpu.runtime import native

    ring = native.FrameRing(4, (16,))
    with pytest.raises(FileNotFoundError):
        native.ScanLoader(ring, path="/tmp/definitely_missing_replay.bin")


def test_loader_holds_ring_reference():
    """A loader constructed on a temporary FrameRing must keep it alive
    (worker threads write into the ring's C buffer — dropping the last
    Python reference mid-run was a use-after-free)."""
    from slam_tpu.runtime import native

    loader = native.ScanLoader(native.FrameRing(16, (32,)), seed=3,
                               num_threads=1)
    import gc
    gc.collect()
    loader.start()
    deadline = time.time() + 5.0
    while loader.produced < 10 and time.time() < deadline:
        time.sleep(0.01)
    loader.stop()
    assert loader.produced >= 10
    seq, frame = loader._ring.pop()
    assert seq >= 1 and np.isfinite(frame).all()


def test_concurrent_drop_oldest_pop_never_tears():
    """Producer overwriting (drop_oldest) while the consumer pops: every
    popped frame must be internally consistent (all elements equal — each
    pushed frame is a constant vector), never a torn mix of two frames."""
    import threading

    from slam_tpu.runtime import native

    ring = native.FrameRing(4, (1024,))
    stop_flag = {"stop": False}

    def producer():
        i = 0
        while not stop_flag["stop"]:
            ring.push(np.full(1024, float(i % 1000), np.float32))
            i += 1

    t = threading.Thread(target=producer)
    t.start()
    torn = 0
    popped = 0
    deadline = time.time() + 3.0
    while time.time() < deadline and popped < 5000:
        seq, frame = ring.pop()
        if seq == 0:
            continue
        popped += 1
        if not (frame == frame[0]).all():
            torn += 1
    stop_flag["stop"] = True
    t.join()
    assert popped > 100
    assert torn == 0, f"{torn}/{popped} torn frames"
