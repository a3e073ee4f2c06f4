"""USGS DEM reader vs the reference's published oracle values.

Every checksum/geotransform below is published in
``autotest/gdrivers/usgsdem.py`` over the shipped fixtures — an
oracle fully independent of this repo's kernels.  The set exercises
all four A-record layouts (864/893/918/1024/1025), both band types,
UTM and geographic quads, and the junk-after-profile 1024-boundary
realignment.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import usgsdem
from gdal_spark.raster.checksum import checksum_band

DATA = "/root/reference/autotest/gdrivers/data/usgsdem"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference autotest data absent")


def _load(name):
    return open(os.path.join(DATA, name), "rb").read()


@needs_ref
@pytest.mark.parametrize("name,cs,dtype,datum,start", [
    ("022gdeme_truncated", 1583, "int16", "NAD27", 1024),
    ("114p01_0100_deme_truncated.dem", 53864, "int16", "NAD27", 1024),
    ("39079G6_truncated.dem", 61424, "int16", "WGS72", 1024),
    ("39109h1_truncated.dem", 39443, "float32", "NAD27", 893),
    ("4619old_truncated.dem", 10659, "int16", "NAD27", 1024),
    ("usgsdem_with_extra_values_at_end_of_profile.dem", 56679,
     "int16", "NAD27", 1024),
    ("usgsdem_with_spaces_after_byte_864.dem", 61078,
     "int16", "NAD27", 1024),
    ("record_1025_ending_with_linefeed.dem", 14172, "int16",
     "NAD27", 1025),
])
def test_published_checksums(name, cs, dtype, datum, start):
    arr, info = usgsdem.read_usgsdem(_load(name))
    assert checksum_band(arr) == cs
    assert info["dtype"] == dtype
    assert info["datum"] == datum
    assert info["data_start"] == start
    assert info["nodata"] == -32767


@needs_ref
@pytest.mark.parametrize("name,gt,zone", [
    ("022gdeme_truncated",
     (-67.00041667, 0.00083333, 0.0, 50.000416667, 0.0, -0.00083333), 0),
    ("114p01_0100_deme_truncated.dem",
     (-136.25010416667, 0.000208333, 0.0, 59.25010416667, 0.0,
      -0.000208333), 0),
    ("39079G6_truncated.dem",
     (606855.0, 30.0, 0.0, 4414605.0, 0.0, -30.0), 17),
    ("39109h1_truncated.dem",
     (660055.0, 10.0, 0.0, 4429465.0, 0.0, -10.0), 12),
    ("4619old_truncated.dem",
     (18.99958333, 0.0008333, 0.0, 47.000416667, 0.0, -0.0008333), 0),
])
def test_published_geotransforms(name, gt, zone):
    _, info = usgsdem.read_usgsdem(_load(name), header_only=True)
    assert info["geotransform"] == pytest.approx(gt, abs=1e-7)
    assert info["utm_zone"] == zone


@needs_ref
def test_truncated_918_layout_fails():
    """test_usgsdem_with_header_of_918_bytes: the A record parses
    (918 layout, NAD83 UTM 15, the published geotransform) but the
    truncated profile section must fail, as in the autotest."""
    buf = _load("fema06-140cm_2995441b_truncated.dem")
    _, info = usgsdem.read_usgsdem(buf, header_only=True)
    assert info["data_start"] == 918
    assert info["datum"] == "NAD83"
    assert info["utm_zone"] == 15
    assert info["geotransform"] == pytest.approx(
        (248500.0, 1.4, 0.0, 3252508.7, 0.0, -1.4), abs=1e-6)
    with pytest.raises(ValueError):
        usgsdem.read_usgsdem(buf)


@needs_ref
def test_subunit_vres_is_float32():
    """39109h1: vertical resolution below 1 promotes the band to
    Float32 (LoadFromFile: ``nVUnit == 1 || fVRes < 1.0``)."""
    _, info = usgsdem.read_usgsdem(_load("39109h1_truncated.dem"),
                                   header_only=True)
    assert info["vres"] == pytest.approx(0.07305)
    assert info["dtype"] == "float32"


def test_roundtrip_geographic():
    rng = np.random.default_rng(11)
    arr = rng.integers(-300, 1700, (25, 20)).astype(np.int16)
    arr[4, 7] = usgsdem.NODATA
    buf = usgsdem.write_usgsdem(arr, sw_lon=-67.0, sw_lat=49.0,
                                datum="WGS84")
    arr2, info = usgsdem.read_usgsdem(buf)
    assert np.array_equal(arr, arr2)
    assert info["datum"] == "WGS84"
    assert info["geotransform"] == pytest.approx(
        (-67.5, 1.0, 0.0, 73.5, 0.0, -1.0))


def test_roundtrip_subdegree_spacing():
    arr = (np.arange(9 * 6).reshape(9, 6) * 3 - 20).astype(np.int16)
    buf = usgsdem.write_usgsdem(arr, sw_lon=12.0, sw_lat=-5.0,
                                dx_arcsec=900.0, dy_arcsec=450.0)
    arr2, info = usgsdem.read_usgsdem(buf)
    assert np.array_equal(arr, arr2)
    gt = info["geotransform"]
    assert gt[1] == pytest.approx(0.25)
    assert gt[5] == pytest.approx(-0.125)
    assert gt[0] == pytest.approx(12.0 - 0.125)


def test_not_a_dem():
    with pytest.raises(ValueError):
        usgsdem.read_usgsdem(b"\x00" * 4096)
