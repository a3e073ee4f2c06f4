"""BSB nautical chart reader vs the reference's published values
(``autotest/gdrivers/bsb.py``: checksum 30321 across four header
variants; truncated fixtures must fail)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import bsb
from gdal_spark.raster import legacy_formats as lf
from gdal_spark.raster.checksum import checksum_band

D = "/root/reference/autotest/gdrivers/data/bsb"
SAGA = "/root/reference/autotest/gdrivers/data/saga"
GCORE = "/root/reference/autotest/gcore/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")


def _load(name):
    return open(os.path.join(D, name), "rb").read()


@needs_ref
@pytest.mark.parametrize("name", [
    "rgbsmall.kap",                  # test_bsb_1
    "rgbsmall_index.kap",            # test_bsb_3 (line-offset table)
    "rgbsmall_with_line_break.kap",  # test_bsb_4
    "transverse_mercator.kap",       # test_bsb_tmerc variant
])
def test_rgbsmall_variants_30321(name):
    arr, info = bsb.read_bsb(_load(name))
    assert checksum_band(arr) == 30321
    assert (info["w"], info["h"]) == (50, 50)
    assert info["palette"].shape[1] == 4


@needs_ref
@pytest.mark.parametrize("name", ["rgbsmall_truncated.kap",
                                  "rgbsmall_truncated2.kap"])
def test_truncated_fails(name):
    """test_bsb_5/6: truncated charts error out, as in the
    reference."""
    with pytest.raises(Exception):
        bsb.read_bsb(_load(name))


@needs_ref
def test_errant_0x1a_in_header():
    """test_bsb_with_errant_0x1A_character_in_header: a stray 0x1A
    inside a header comment must not end the header."""
    buf = _load("rgbsmall.kap")
    # inject a "! comment \x1A continued" header line after BSB/ line
    nl = buf.find(b"\n", buf.find(b"BSB/"))
    patched = buf[:nl + 1] + b"! errant \x1acomment\r\n" + buf[nl + 1:]
    arr, _ = bsb.read_bsb(patched)
    assert checksum_band(arr) == 30321


@needs_ref
def test_multichunk_lines_and_4bit_chart():
    """australia4c.kap: 3-bit color size, multi-chunk rows decode to a
    stable full-frame result."""
    arr, info = bsb.read_bsb(_load("australia4c.kap"))
    assert (info["w"], info["h"]) == (625, 480)
    assert info["color_size"] == 3
    assert checksum_band(arr) == 53973  # self-consistent regression pin


# --------------------------------------------------------- SAGA / KRO

@needs_ref
def test_saga_4byte_float():
    """saga.py test_saga_1: checksum 108, node-registered
    geotransform from POSITION_XMIN/YMIN + CELLSIZE."""
    hdr = open(f"{SAGA}/4byteFloat.sgrd").read()
    arr, info = lf.read_saga(hdr, open(f"{SAGA}/4byteFloat.sdat",
                                       "rb").read())
    assert checksum_band(arr) == 108
    assert info["dtype"] == "float32"
    assert info["geotransform"] == pytest.approx(
        (328.3, 10.0, 0.0, 650.5, 0.0, -10.0))
    assert info["nodata"] == -99999.0


@needs_ref
def test_saga_roundtrips_4672():
    """saga.py test_saga_4/5 semantics: byte.tif through each store
    type keeps checksum 4672."""
    from gdal_spark.raster import tiff

    src, _ = tiff.decode_full(open(f"{GCORE}/byte.tif", "rb").read())
    src = src.squeeze()
    gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    for dt in (np.uint8, np.int16, np.uint16, np.int32, np.uint32,
               np.float32, np.float64):
        hdr, data = lf.write_saga(src.astype(dt), gt)
        arr, info = lf.read_saga(hdr, data)
        assert checksum_band(arr) == 4672, dt
        assert info["geotransform"] == pytest.approx(gt)


@needs_ref
def test_kro_roundtrips():
    """kro.py test_kro_1/2: rgbsmall band 2 at 21053 and uint16 at
    4672 through the big-endian BIP layout."""
    from gdal_spark.raster import tiff

    rgb, _ = tiff.decode_full(
        open(f"{GCORE}/rgbsmall.tif", "rb").read())
    arr, info = lf.read_kro(lf.write_kro(rgb))
    assert info["bands"] == 3
    assert checksum_band(arr[:, :, 1]) == 21053
    assert np.array_equal(arr, rgb)

    u16, _ = tiff.decode_full(open(f"{GCORE}/uint16.tif", "rb").read())
    u16 = u16.squeeze().astype(np.uint16)
    arr2, info2 = lf.read_kro(lf.write_kro(u16))
    assert info2["dtype"] == "uint16"
    assert checksum_band(arr2) == 4672
