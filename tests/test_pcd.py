"""PCD interop (utils/pcd.py) — the reference's map persistence format
(savePCDFileASCII global_generate.cpp:238, loadPCDFile global_match.cpp:258,
PointXYZGD fields PointcloudXYZGD.h:8-21)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slam_tpu.types import PointCloud
from slam_tpu.utils.pcd import load_pcd, save_pcd


def _cloud(n=37, cap=48, seed=0):
    rng = np.random.RandomState(seed)
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    valid = np.arange(cap) < n
    flags = np.zeros(cap, np.int32)
    flags[:n] = rng.choice(
        [0, PointCloud.FLAG_GA, PointCloud.FLAG_DRIVABLE,
         PointCloud.FLAG_GA | PointCloud.FLAG_DRIVABLE], n)
    return PointCloud(xyz=jnp.asarray(xyz), valid=jnp.asarray(valid),
                      flags=jnp.asarray(flags))


@pytest.mark.parametrize("binary", [False, True])
def test_roundtrip_with_gd_flags(tmp_path, binary):
    c = _cloud()
    path = str(tmp_path / "map.pcd")
    n = save_pcd(path, c, binary=binary)
    assert n == 37
    back = load_pcd(path, capacity=48)
    assert back.capacity == 48
    assert int(back.valid.sum()) == 37
    v = np.asarray(back.valid)
    np.testing.assert_allclose(np.asarray(back.xyz)[v],
                               np.asarray(c.xyz)[:37], atol=2e-5)
    ga = np.asarray(back.is_ga())[v]
    np.testing.assert_array_equal(
        ga, (np.asarray(c.flags)[:37] & PointCloud.FLAG_GA) != 0)
    drv = (np.asarray(back.flags)[v] & PointCloud.FLAG_DRIVABLE) != 0
    np.testing.assert_array_equal(
        drv, (np.asarray(c.flags)[:37] & PointCloud.FLAG_DRIVABLE) != 0)


def test_plain_xyz_and_capacity(tmp_path):
    c = _cloud(n=20, cap=32)
    path = str(tmp_path / "plain.pcd")
    save_pcd(path, c, with_flags=False)
    auto = load_pcd(path)                    # capacity = file point count
    assert auto.capacity == 20 and int(auto.valid.sum()) == 20
    assert int(auto.flags.sum()) == 0
    trunc = load_pcd(path, capacity=8)       # keep first 8
    assert trunc.capacity == 8 and int(trunc.valid.sum()) == 8
    np.testing.assert_allclose(np.asarray(trunc.xyz),
                               np.asarray(c.xyz)[:8], atol=2e-5)


def test_loads_pcl_style_file_with_extra_fields(tmp_path):
    """A hand-written PCL-flavored file: extra intensity field (skipped),
    NaN row (PCL's invalid-point encoding -> masked), count from header."""
    body = ("# .PCD v0.7 - Point Cloud Data file format\n"
            "VERSION 0.7\n"
            "FIELDS x y z intensity ground_adj drivable\n"
            "SIZE 4 4 4 4 2 2\n"
            "TYPE F F F F U U\n"
            "COUNT 1 1 1 1 1 1\n"
            "WIDTH 3\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 3\n"
            "DATA ascii\n"
            "1.5 -2.0 0.25 99.0 1 0\n"
            "nan nan nan 0.0 0 0\n"
            "3.0 4.0 -1.0 17.0 0 1\n")
    path = tmp_path / "pcl.pcd"
    path.write_text(body)
    c = load_pcd(str(path))
    assert c.capacity == 3
    np.testing.assert_array_equal(np.asarray(c.valid), [True, False, True])
    np.testing.assert_allclose(np.asarray(c.xyz)[0], [1.5, -2.0, 0.25])
    assert bool(c.is_ga()[0]) and not bool(c.is_ga()[2])
    assert (int(c.flags[2]) & PointCloud.FLAG_DRIVABLE) != 0
    assert np.all(np.isfinite(np.asarray(c.xyz)))  # NaN row zeroed


def test_lzf_decompress_backreference():
    """Hand-built LZF stream exercising the overlapping back-reference
    path: literal 'abc' then a 6-byte copy from 3 bytes back."""
    from slam_tpu.utils.pcd import _lzf_decompress
    stream = bytes([0x02]) + b"abc" + bytes([0x80, 0x02])
    assert _lzf_decompress(stream, 9) == b"abcabcabc"


def _lzf_literal_encode(raw: bytes) -> bytes:
    """Valid (uncompressed) LZF stream: pure literal runs of <=32 bytes —
    what a compressor emits for incompressible input."""
    out = bytearray()
    for i in range(0, len(raw), 32):
        chunk = raw[i:i + 32]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def test_binary_compressed_roundtrip(tmp_path):
    """PCL's binary_compressed layout: u32 sizes header + LZF payload in
    FIELD-MAJOR order (all x, then all y, ...)."""
    rng = np.random.RandomState(3)
    n = 11
    x = rng.uniform(-5, 5, n).astype("<f4")
    y = rng.uniform(-5, 5, n).astype("<f4")
    z = rng.uniform(-1, 1, n).astype("<f4")
    ga = (rng.rand(n) < 0.5).astype("<u2")
    drv = (rng.rand(n) < 0.5).astype("<u2")
    raw = x.tobytes() + y.tobytes() + z.tobytes() + ga.tobytes() + \
        drv.tobytes()
    comp = _lzf_literal_encode(raw)
    path = tmp_path / "bc.pcd"
    with open(path, "wb") as f:
        f.write(("VERSION 0.7\nFIELDS x y z ground_adj drivable\n"
                 "SIZE 4 4 4 2 2\nTYPE F F F U U\nCOUNT 1 1 1 1 1\n"
                 f"WIDTH {n}\nHEIGHT 1\nPOINTS {n}\n"
                 "DATA binary_compressed\n").encode())
        f.write(np.array([len(comp), len(raw)], "<u4").tobytes())
        f.write(comp)
    c = load_pcd(str(path))
    assert int(c.valid.sum()) == n
    np.testing.assert_allclose(np.asarray(c.xyz),
                               np.stack([x, y, z], -1), atol=0)
    np.testing.assert_array_equal(np.asarray(c.is_ga()), ga != 0)


def test_truncated_header_raises(tmp_path):
    """Empty / truncated / non-pcd input must raise, not spin at EOF."""
    for body in ("", "VERSION 0.7\nFIELDS x y z\n", "not a pcd at all\n"):
        path = tmp_path / "bad.pcd"
        path.write_text(body)
        with pytest.raises(ValueError, match="header"):
            load_pcd(str(path))


def test_pcl_padding_fields_binary(tmp_path):
    """PCL pads binary point types with '_' fields (e.g. PointXYZI is
    x y z _ intensity _); duplicate '_' names must not break the dtype."""
    n = 4
    rng = np.random.RandomState(1)
    rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                             ("p1", "V4"), ("i", "<f4"), ("p2", "V12")])
    for k in "xyz":
        rec[k] = rng.uniform(-3, 3, n).astype("<f4")
    with open(tmp_path / "pad.pcd", "wb") as f:
        f.write(("VERSION 0.7\nFIELDS x y z _ intensity _\n"
                 "SIZE 4 4 4 1 4 1\nTYPE F F F U F U\n"
                 "COUNT 1 1 1 4 1 12\n"
                 f"WIDTH {n}\nHEIGHT 1\nPOINTS {n}\nDATA binary\n").encode())
        f.write(rec.tobytes())
    c = load_pcd(str(tmp_path / "pad.pcd"))
    assert int(c.valid.sum()) == n
    np.testing.assert_allclose(
        np.asarray(c.xyz), np.stack([rec["x"], rec["y"], rec["z"]], -1))


def test_zero_point_roundtrip(tmp_path):
    """An all-invalid cloud saves as POINTS 0 and loads back empty."""
    empty = PointCloud(xyz=jnp.zeros((8, 3)), valid=jnp.zeros(8, bool),
                       flags=jnp.zeros(8, jnp.int32))
    path = str(tmp_path / "empty.pcd")
    assert save_pcd(path, empty) == 0
    back = load_pcd(path, capacity=8)
    assert back.capacity == 8 and int(back.valid.sum()) == 0


def test_binary_compressed_multicount_field(tmp_path):
    """COUNT>1 fields in binary_compressed are stored as n adjacent groups
    of `count` values inside the field's block (PCL's memcpy layout), not
    as count separate scalar channels."""
    n = 5
    rng = np.random.RandomState(2)
    x = rng.uniform(-2, 2, n).astype("<f4")
    y = rng.uniform(-2, 2, n).astype("<f4")
    z = rng.uniform(-2, 2, n).astype("<f4")
    nrm = rng.uniform(-1, 1, (n, 3)).astype("<f4")   # count-3 field
    raw = x.tobytes() + y.tobytes() + z.tobytes() + nrm.tobytes()
    comp = _lzf_literal_encode(raw)
    with open(tmp_path / "mc.pcd", "wb") as f:
        f.write(("VERSION 0.7\nFIELDS x y z normal\nSIZE 4 4 4 4\n"
                 f"TYPE F F F F\nCOUNT 1 1 1 3\nWIDTH {n}\nHEIGHT 1\n"
                 f"POINTS {n}\nDATA binary_compressed\n").encode())
        f.write(np.array([len(comp), len(raw)], "<u4").tobytes())
        f.write(comp)
    c = load_pcd(str(tmp_path / "mc.pcd"))
    # xyz land after the multi-count block is skipped correctly
    np.testing.assert_allclose(np.asarray(c.xyz), np.stack([x, y, z], -1))


def test_prior_map_feeds_relocalization(tmp_path):
    """The reference workflow: a prior obstacle map saved as .pcd
    (global_generate.cpp:238) is reloaded and used as the relocalization
    target (global_match.cpp:258). Here: export our point map, save/load
    through the pcd format, and check the loaded cloud is usable by the
    FFT correlative matcher's map rasterization."""
    import jax
    from slam_tpu.config import sim2d_config
    from slam_tpu.ops.fft_match import rasterize

    cfg = sim2d_config()
    rng = np.random.RandomState(7)
    n = 200
    xyz = np.zeros((256, 3), np.float32)
    xyz[:n, :2] = rng.uniform(-10, 10, (n, 2))
    cloud = PointCloud(xyz=jnp.asarray(xyz),
                       valid=jnp.asarray(np.arange(256) < n),
                       flags=jnp.zeros(256, jnp.int32))
    path = str(tmp_path / "prior.pcd")
    save_pcd(path, cloud, binary=True)
    prior = load_pcd(path, capacity=256)
    g1 = rasterize(cloud.xyz[:, :2], cloud.valid, jnp.zeros(2),
                   cfg.global_match)
    g2 = rasterize(prior.xyz[:, :2], prior.valid, jnp.zeros(2),
                   cfg.global_match)
    assert jax.numpy.array_equal(g1, g2)
