"""GIF codec — raster/gif.py.

External oracle: the reference's own GIF autotest pins
(autotest/gdrivers/gif.py::test_gif_2/test_gif_4 on bug407.gif —
band checksum 57921, 16-entry colormap with pinned entries,
GIF_BACKGROUND 0) plus the cross-driver XMP matrix fixture.
"""

import os

import numpy as np
import pytest

from gdal_spark.raster import codec, gif
from gdal_spark.raster.checksum import checksum_band

_REF = "/root/reference/autotest/gdrivers/data/gif"


def _ref(name):
    p = os.path.join(_REF, name)
    if not os.path.exists(p):
        pytest.skip("reference autotest data not present")
    with open(p, "rb") as f:
        return f.read()


def test_bug407_autotest_pins():
    g = gif.decode_indices(_ref("bug407.gif"))
    assert g.index.shape == (400, 400)
    assert checksum_band(g.index) == 57921  # test_gif_2
    assert g.palette.shape[0] == 16  # test_gif_4
    assert tuple(g.palette[0]) == (255, 255, 255)
    assert tuple(g.palette[1]) == (255, 255, 208)
    assert g.background == 0
    assert g.transparent is None


def test_xmp_extension():
    x = gif.gif_xmp(_ref("byte_with_xmp.gif"))
    assert x is not None and x.startswith("<?xpacket begin=")
    # the 258-byte magic trailer must be stripped
    assert x.rstrip().endswith("?>")
    assert gif.gif_xmp(_ref("bug407.gif")) is None


def test_encode_roundtrip_interlace_both_ways():
    g = gif.decode_indices(_ref("bug407.gif"))
    for interlace in (False, True):
        buf = gif.encode(g.index, g.palette, interlace=interlace)
        g2 = gif.decode_indices(buf)
        assert np.array_equal(g2.index, g.index)
        assert np.array_equal(g2.palette[:16], g.palette)


def test_gray_createcopy_checksum_4672():
    """autotest test_gif_5: CreateCopy of gcore byte.tif must keep
    checksum 4672 (gray band as identity-palette indices)."""
    p = "/root/reference/autotest/gcore/data/byte.tif"
    if not os.path.exists(p):
        pytest.skip("reference autotest data not present")
    from gdal_spark.raster import tiff

    arr = tiff.decode(open(p, "rb").read())
    band = arr[..., 0] if arr.ndim == 3 else arr
    assert checksum_band(band) == 4672
    buf = codec.encode_image(band.astype(np.uint8), "gif")
    g = gif.decode_indices(buf)
    assert checksum_band(g.index) == 4672
    # identity gray ramp expands back to the same gray values
    assert np.array_equal(gif.decode(buf)[..., 0], band)


def test_transparency_alpha():
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    pal = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    buf = gif.encode(idx, pal, transparent=1)
    g = gif.decode_indices(buf)
    assert g.transparent == 1
    rgba = gif.decode(buf)
    assert rgba.shape == (2, 2, 4)
    assert rgba[0, 1, 3] == 0 and rgba[0, 0, 3] == 255


def test_lzw_width_growth_and_clear():
    """>4096 dictionary entries forces clear-code reset mid-stream."""
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, (80, 120), dtype=np.uint8)
    ramp = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    buf = gif.encode(idx, ramp)
    g = gif.decode_indices(buf)
    assert np.array_equal(g.index, idx)


def test_sniff_and_dispatch():
    d = _ref("bug407.gif")
    assert codec.sniff_info(d) == ("gif", 400, 400, 1)
    out = codec.decode_image(d, "gif")
    assert out.shape == (400, 400, 3)
