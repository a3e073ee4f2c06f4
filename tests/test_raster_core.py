"""Codec, checksum, resample kernel tests."""

import numpy as np
import pytest

from gdal_spark.raster import checksum as CK
from gdal_spark.raster import codec as C
from gdal_spark.raster import resample as R


def synth(h=32, w=48, c=3, seed=7):
    rng = np.random.default_rng(seed)
    base = (
        np.linspace(0, 255, w)[None, :, None]
        + np.linspace(0, 128, h)[:, None, None]
    )
    noise = rng.integers(0, 40, (h, w, c))
    arr = np.clip(base + noise, 0, 255).astype(np.uint8)
    return arr[:, :, 0] if c == 1 else arr


def test_png_roundtrip_rgb():
    a = synth()
    assert np.array_equal(C.png_decode(C.png_encode(a)), a)


def test_png_roundtrip_gray():
    a = synth(c=1)
    assert np.array_equal(C.png_decode(C.png_encode(a)), a)


def test_png_filters_decode():
    # craft a PNG with Up filter (type 2) by hand and decode
    import struct
    import zlib

    a = synth(8, 8, 1)
    rows = []
    prev = np.zeros(8, dtype=np.uint8)
    for r in range(8):
        rows.append(b"\x02" + (a[r] - prev).astype(np.uint8).tobytes())
        prev = a[r]
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    buf = (
        C.PNG_SIG
        + C._chunk(b"IHDR", ihdr)
        + C._chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + C._chunk(b"IEND", b"")
    )
    assert np.array_equal(C.png_decode(buf), a)


def test_fake_lossy_psnr():
    a = synth()
    enc = C.fake_lossy_encode(a, "jpeg")
    dec = C.fake_lossy_decode(enc)
    assert dec.shape == a.shape
    p = C.psnr(a, dec)
    assert p >= 40.0, p  # north-rule lossy bar (gdalalg_raster_compare.cpp:1094)


def test_decode_dispatch():
    a = synth(c=1)
    assert np.array_equal(C.decode_image(C.encode_image(a, "png")), a)
    assert C.decode_image(C.encode_image(a, "webp")).shape == a.shape
    with pytest.raises(NotImplementedError):
        C.decode_image(b"\xff\xd8\xff real jpeg not supported")


def test_checksum_formula():
    # direct scalar loop oracle of alg/gdalchecksum.cpp:360-367
    a = synth(5, 7, 1)
    primes = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
    cs = 0
    ip = 0
    for v in a.ravel():
        cs += int(v) % primes[ip]
        ip = (ip + 1) % 11
        cs &= 0xFFFF
    assert CK.checksum(a) == cs


def test_checksum_float_rounding():
    a = np.array([[1.4, 1.6], [-1.4, 250.7]])
    # GDALCopyWords: +0.5 then floor → 1, 2, -0 (floor(-0.9)=-1), 251
    primes = [7, 11, 13, 17]
    vals = [1, 2, -1, 251]
    exp = sum(abs(v) % [7, 11, 13, 17][i] * (1 if v >= 0 else -1) for i, v in enumerate(vals)) & 0xFFFF
    assert CK.checksum(a) == exp


def test_resize_nearest_identity():
    a = synth()
    assert np.array_equal(R.resize_nearest(a, *a.shape[:2]), a)


def test_block_average_2x():
    a = np.array([[0, 2], [4, 6]], dtype=np.uint8)
    out = R.block_reduce(a, 1, 1, "average")
    assert out.item() == 3  # (0+2+4+6)/4 = 3


def test_block_stats():
    a = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert R.block_reduce(a, 2, 2, "min")[0, 0] == 0
    assert R.block_reduce(a, 2, 2, "max")[1, 1] == 15
    m = R.block_reduce(np.array([[1, 1], [2, 3]], dtype=np.uint8), 1, 1, "mode")
    assert m.item() == 1


def test_kernel_resize_constant_preserved():
    a = np.full((32, 32), 100, dtype=np.uint8)
    for k in ("bilinear", "cubic", "cubicspline", "lanczos"):
        out = R.resize_kernel(a, 16, 16, k)
        assert out.shape == (16, 16)
        assert np.all(out == 100), k


def test_resample_dispatch_average_matches_block():
    a = synth(32, 32, 1)
    assert np.array_equal(R.resample(a, 16, 16, "average"), R.block_reduce(a, 16, 16, "average"))
