"""ERS codec vs the reference's published oracle values
(``autotest/gdrivers/ers.py`` over the shipped fixtures)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import ers
from gdal_spark.raster.checksum import checksum_band

D = "/root/reference/autotest/gdrivers/data/ers"
GCORE = "/root/reference/autotest/gcore/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")

BYTE_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def _rd(base, **kw):
    hdr = open(f"{D}/{base}.ers", encoding="latin-1").read()
    data = open(f"{D}/{base}", "rb").read() \
        if os.path.exists(f"{D}/{base}") else None
    return ers.read_ers(hdr, data, **kw)


@needs_ref
def test_srtm_checksum_and_stats():
    """test_ers_1: checksum 64074 and the exact published statistics
    dict — also pins the tokenizer (comments, escaped quotes, braces
    across lines, '#' inside strings)."""
    arr, info = _rd("srtm")
    assert checksum_band(arr) == 64074
    assert info["dtype"] == "int16"
    assert info["byteorder"] == "big"
    assert info["band_stats"][0] == {
        "STATISTICS_MEAN": "-4020.25",
        "STATISTICS_MINIMUM": "-4315",
        "STATISTICS_MAXIMUM": "-3744",
        "STATISTICS_MEDIAN": "-4000",
    }
    assert info["band_descriptions"] == ["Topography"]
    # registration cell (1,1) shifts the DMS corner by one pixel
    assert info["geotransform"][0] == pytest.approx(
        -180.0 - 0.00833333)
    assert info["geotransform"][3] == pytest.approx(-60.0 + 0.00833333)


@needs_ref
def test_ers_dem_header_offset():
    """test_ers_4: IEEE4ByteReal with HeaderOffset 512, checksum
    56588."""
    arr, info = _rd("ers_dem")
    assert checksum_band(arr) == 56588
    assert info["dtype"] == "float32"
    assert info["header_offset"] == 512
    assert info["nodata"] == -9999.0


@needs_ref
def test_signed8bit():
    """test_ers_5/6: Signed8BitInteger reads as Int8 and survives a
    round trip."""
    arr, info = _rd("8s")
    assert info["dtype"] == "int8"
    hdr, data = ers.write_ers(arr)
    arr2, info2 = ers.read_ers(hdr, data)
    assert info2["dtype"] == "int8"
    assert np.array_equal(arr2, arr)


@needs_ref
def test_caseinsensitive_header():
    """test_ers_7: lower-case header keywords still parse; band
    description comes from BandId.Value."""
    _, info = _rd("caseinsensitive", header_only=True)
    assert info["band_descriptions"] == ["RTP 1st Vertical Derivative"]


@needs_ref
def test_byte_roundtrip_4672():
    """test_ers_2 semantics: byte.tif → ERS → checksum 4672."""
    from gdal_spark.raster import tiff

    src, _ = tiff.decode_full(open(f"{GCORE}/byte.tif", "rb").read())
    src = src.squeeze()
    hdr, data = ers.write_ers(src, BYTE_GT, nodata=255.0)
    arr, info = ers.read_ers(hdr, data)
    assert checksum_band(arr) == 4672
    assert np.array_equal(arr, src)
    assert info["geotransform"] == pytest.approx(BYTE_GT)
    assert info["nodata"] == 255.0


@needs_ref
def test_rgb_roundtrip_21053():
    """test_ers_3: rgbsmall.tif band 2 → 21053 through the BIL
    layout."""
    from gdal_spark.raster import tiff

    src, _ = tiff.decode_full(
        open(f"{GCORE}/rgbsmall.tif", "rb").read())
    hdr, data = ers.write_ers(src)
    arr, info = ers.read_ers(hdr, data)
    assert info["bands"] == 3
    assert checksum_band(arr[:, :, 1]) == 21053
    assert np.array_equal(arr, src)


def test_proj_datum_units_roundtrip():
    """test_ers_10 semantics: PROJ/DATUM/UNITS stick."""
    hdr, data = ers.write_ers(np.zeros((1, 1), np.uint8),
                              datum="GDA94", projection="MGA55",
                              units="METERS")
    _, info = ers.read_ers(hdr, data)
    assert info["projection"] == "MGA55"
    assert info["datum"] == "GDA94"
    assert info["units"] == "METERS"


def test_tokenizer_quirks():
    """The srtm.ers prologue rules in isolation."""
    node = ers.parse_ers_header(
        "# leading comment\n"
        "DatasetHeader Begin\n"
        '  Bar = "# not a comment"\n'
        "  Baz = 7 # trailing comment\n"
        "DatasetHeader End\n")
    ds = node.find_node("DatasetHeader")
    assert ds.find("Bar") == "# not a comment"
    assert ds.find("Baz") == "7"
