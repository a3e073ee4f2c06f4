"""Full-spec PNG decode — codec.png_decode_full.

External oracles: the reference autotest's published checksum for
uint16_interlaced.png (autotest/gdrivers/png.py:566 → 4672) and the
stefan_full_rgba twin fixture (the PNG must decode pixel-identical to
its GeoTIFF sibling, which our TIFF codec reads under its own
external-oracle matrix). Low bit depths use hand-packed spec-shaped
files with odd widths to exercise row-end bit padding.
"""

import os
import struct
import zlib

import numpy as np
import pytest

from gdal_spark.raster import codec
from gdal_spark.raster.checksum import checksum_band, checksum_bands

_GCORE = "/root/reference/autotest/gcore/data"
_GDRV = "/root/reference/autotest/gdrivers/data"


def _ref(p):
    if not os.path.exists(p):
        pytest.skip("reference autotest data not present")
    with open(p, "rb") as f:
        return f.read()


def test_uint16_interlaced_published_checksum():
    a = codec.png_decode(_ref(f"{_GDRV}/png/uint16_interlaced.png"))
    assert a.dtype == np.uint16 and a.shape == (20, 20)
    assert checksum_band(a) == 4672  # autotest/gdrivers/png.py:566


def test_stefan_rgba_twin_fixture():
    """Adam7-interlaced 8-bit RGBA: pixel-identical to the GeoTIFF
    twin (read by the externally-oracled TIFF codec)."""
    from gdal_spark.raster import tiff

    p = codec.png_decode(_ref(f"{_GCORE}/stefan_full_rgba.png"))
    t = tiff.decode(_ref(f"{_GCORE}/stefan_full_rgba.tif"))
    assert np.array_equal(p, t)
    assert checksum_bands(p) == [12603, 58561, 36064, 10807]


def test_palette_trns_interlaced():
    """Color type 3 + tRNS + Adam7: indices stay indices in the full
    view; the pixel view expands through PLTE and alpha."""
    buf = _ref(f"{_GCORE}/stefan_full_rgba_pct32.png")
    s, info = codec.png_decode_full(buf)
    assert info["color_type"] == 3 and info["palette"].shape == (256, 3)
    assert info["trns"] is not None
    rgba = codec.png_decode(buf)
    assert rgba.shape == (150, 162, 4)
    # expansion law: every pixel equals palette[index] with trns alpha
    idx = s[..., 0]
    assert np.array_equal(rgba[..., :3], info["palette"][idx])


def _build_png(w, h, depth, color_type, rows_bits: np.ndarray,
               palette=None, trns=None):
    """Hand-pack a non-interlaced PNG: rows_bits is (h, w) sample
    values (one channel)."""
    stride = (w * depth + 7) // 8
    scan = bytearray()
    for r in range(h):
        scan.append(0)  # filter None
        if depth == 8:
            scan += rows_bits[r].astype(np.uint8).tobytes()
        else:
            bits = np.zeros(stride * 8, dtype=np.uint8)
            for x in range(w):
                v = int(rows_bits[r, x])
                for b in range(depth):
                    bits[x * depth + b] = (v >> (depth - 1 - b)) & 1
            scan += np.packbits(bits).tobytes()
    out = bytearray(b"\x89PNG\r\n\x1a\n")

    def chunk(tag, data):
        out.extend(struct.pack(">I", len(data)))
        out.extend(tag)
        out.extend(data)
        out.extend(struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0))
    if palette is not None:
        chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    if trns is not None:
        chunk(b"tRNS", bytes(trns))
    chunk(b"IDAT", zlib.compress(bytes(scan)))
    chunk(b"IEND", b"")
    return bytes(out)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_low_depth_gray(depth):
    rng = np.random.default_rng(depth)
    w, h = 13, 7  # odd width: last byte padded
    vals = rng.integers(0, 1 << depth, (h, w))
    buf = _build_png(w, h, depth, 0, vals)
    a = codec.png_decode(buf)
    assert a.shape == (h, w)
    assert np.array_equal(a, vals.astype(np.uint8))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_low_depth_palette(depth):
    rng = np.random.default_rng(10 + depth)
    w, h = 11, 5
    n = 1 << depth
    vals = rng.integers(0, n, (h, w))
    pal = rng.integers(0, 255, (n, 3))
    buf = _build_png(w, h, depth, 3, vals, palette=pal)
    rgb = codec.png_decode(buf)
    assert rgb.shape == (h, w, 3)
    assert np.array_equal(rgb, pal.astype(np.uint8)[vals])


def test_16bit_gray_plain():
    rng = np.random.default_rng(16)
    w, h = 9, 6
    vals = rng.integers(0, 65535, (h, w), dtype=np.uint16)
    scan = bytearray()
    for r in range(h):
        scan.append(0)
        scan += vals[r].astype(">u2").tobytes()
    out = bytearray(b"\x89PNG\r\n\x1a\n")

    def chunk(tag, data):
        out.extend(struct.pack(">I", len(data)))
        out.extend(tag)
        out.extend(data)
        out.extend(struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0))
    chunk(b"IDAT", zlib.compress(bytes(scan)))
    chunk(b"IEND", b"")
    a = codec.png_decode(bytes(out))
    assert a.dtype == np.uint16
    assert np.array_equal(a, vals)


def test_own_encodes_unchanged():
    rng = np.random.default_rng(99)
    for shape in [(13, 21, 3), (8, 5), (20, 30, 4)]:
        a = rng.integers(0, 255, shape, dtype=np.uint8)
        assert np.array_equal(codec.png_decode(codec.png_encode(a)), a)
