"""BMP codec — raster/bmp.py.

External oracle: the reference autotest's published band-1 checksums
(autotest/gcore/bmp_read.py init_list), covering 1/4/8-bit palette,
RLE4/RLE8, and 24-bit files.
"""

import os

import numpy as np
import pytest

from gdal_spark.raster import bmp, codec
from gdal_spark.raster.checksum import checksum_band

_D = "/root/reference/autotest/gcore/data"

PINS = [
    ("1bit.bmp", 200),
    ("4bit_pal.bmp", 2587),
    ("4bit_rle4.bmp", 2587),
    ("8bit_pal.bmp", 4672),
    ("byte_rle8.bmp", 4672),
    ("bmp/red_rgb_1x1.bmp", 3),
]


def _ref(name):
    p = os.path.join(_D, name)
    if not os.path.exists(p):
        pytest.skip("reference autotest data not present")
    with open(p, "rb") as f:
        return f.read()


@pytest.mark.parametrize("name,want", PINS,
                         ids=[n.split("/")[-1] for n, _ in PINS])
def test_autotest_checksums(name, want):
    g = bmp.decode_full(_ref(name))
    band = g.index if g.index is not None else g.pixels[..., 0]
    assert checksum_band(band) == want


def test_rle_vs_uncompressed_identical():
    """4bit_rle4 and 4bit_pal are the same image; RLE must decode to
    the identical index grid (same for byte_rle8 vs 8bit_pal)."""
    a = bmp.decode_full(_ref("4bit_pal.bmp"))
    b = bmp.decode_full(_ref("4bit_rle4.bmp"))
    assert np.array_equal(a.index, b.index)
    c = bmp.decode_full(_ref("8bit_pal.bmp"))
    d = bmp.decode_full(_ref("byte_rle8.bmp"))
    assert np.array_equal(c.index, d.index)


def test_roundtrips():
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 256, (33, 47), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    g = bmp.decode_full(bmp.encode(idx, pal))
    assert np.array_equal(g.index, idx)
    assert np.array_equal(g.palette, pal)
    rgb = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    assert np.array_equal(bmp.decode(bmp.encode(rgb)), rgb)


def test_sniff_and_dispatch():
    d = _ref("byte_rle8.bmp")
    assert codec.sniff_info(d) == ("bmp", 20, 20, 1)
    out = codec.decode_image(d, "bmp")
    assert out.shape == (20, 20, 3)  # palette-expanded
    d24 = _ref("bmp/red_rgb_1x1.bmp")
    assert codec.sniff_info(d24) == ("bmp", 1, 1, 3)
    # pure red: band-1 checksum 3 == 255 % 7 (the GDAL prime formula)
    px = codec.decode_image(d24, "bmp")
    assert [int(v) for v in px[0, 0]] == [255, 0, 0]


def test_png_16bit_encode_roundtrip():
    """png_encode now writes depth-16 for uint16 input (the write half
    of the full-spec decoder)."""
    rng = np.random.default_rng(7)
    for shape in [(9, 6), (5, 8, 3)]:
        a = rng.integers(0, 65535, shape, dtype=np.uint16)
        back = codec.png_decode(codec.png_encode(a))
        assert back.dtype == np.uint16
        assert np.array_equal(back, a)
