"""ILWIS codec vs the reference's published oracle values
(``autotest/gdrivers/ilwis.py`` over the shipped fixtures)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import ilwis
from gdal_spark.raster.checksum import checksum_band

D = "/root/reference/autotest/gdrivers/data/ilwis"
GCORE = "/root/reference/autotest/gcore/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")


@pytest.fixture(scope="module")
def fixture_files():
    return {f: open(os.path.join(D, f), "rb").read()
            for f in os.listdir(D)}


def _as_bytes(files):
    return {k: (v.encode() if isinstance(v, str) else v)
            for k, v in files.items()}


@needs_ref
def test_landuse_small(fixture_files):
    """test_ilwis_1: class-domain Byte map, checksum 2351, with the
    GeoRefCorners (CornersOfCorners=Yes) geotransform."""
    arr, info = ilwis.read_ilwis(fixture_files, "LanduseSmall.mpr")
    assert checksum_band(arr) == 2351
    assert info["dtype"] == "uint8"
    assert (info["w"], info["h"]) == (75, 75)
    assert info["geotransform"] == pytest.approx(
        (795480.0, 20.0, 0.0, 8090520.0, 0.0, -20.0))


@needs_ref
def test_real_store_value_domain(fixture_files):
    """test_ilwis_read_real_store_value_domain: Real store + system
    value domain with Range=0:255:1 → UInt8 band, checksum 350."""
    arr, info = ilwis.read_ilwis(fixture_files,
                                 "real_store_value_domain.mpr")
    assert checksum_band(arr) == 350
    assert info["dtype"] == "uint8"
    assert info["store_type"] == "real"
    assert (info["w"], info["h"]) == (8, 4)


@needs_ref
def test_byte_roundtrip_4672():
    """test_ilwis_2/5: byte.tif → ILWIS → checksum 4672, georef
    preserved."""
    from gdal_spark.raster import tiff

    src, _ = tiff.decode_full(open(f"{GCORE}/byte.tif", "rb").read())
    src = src.squeeze()
    gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    files = _as_bytes(ilwis.write_ilwis(src, "byte", gt))
    arr, info = ilwis.read_ilwis(files, "byte.mpr")
    assert checksum_band(arr) == 4672
    assert np.array_equal(arr, src)
    assert info["geotransform"] == pytest.approx(gt)


@needs_ref
def test_rgb_maplist_roundtrip_21053():
    """test_ilwis_4: rgbsmall through the MapList multi-band layout,
    band 2 checksum 21053."""
    from gdal_spark.raster import tiff

    src, _ = tiff.decode_full(
        open(f"{GCORE}/rgbsmall.tif", "rb").read())
    files = _as_bytes(ilwis.write_ilwis(src, "rgb"))
    arr, info = ilwis.read_ilwis(files, "rgb.mpl")
    assert info["bands"] == 3
    assert checksum_band(arr[:, :, 1]) == 21053
    assert np.array_equal(arr, src)


def test_float_and_int_roundtrips():
    """test_ilwis_3 semantics: Float/Int stores survive exactly and
    carry the ILWIS per-type nodata."""
    rng = np.random.default_rng(3)
    f32 = (rng.random((9, 7)) * 1000 - 500).astype(np.float32)
    files = _as_bytes(ilwis.write_ilwis(f32, "f"))
    arr, info = ilwis.read_ilwis(files, "f.mpr")
    assert info["dtype"] == "float32"
    assert np.array_equal(arr, f32)
    assert info["nodata"] == pytest.approx(-1e38, rel=1e-6)

    i16 = rng.integers(-30000, 30000, (5, 6)).astype(np.int16)
    files = _as_bytes(ilwis.write_ilwis(i16, "i"))
    arr, info = ilwis.read_ilwis(files, "i.mpr")
    assert info["dtype"] == "int16"
    assert np.array_equal(arr, i16)
    assert info["nodata"] == -32767.0


def test_value_range_conversion():
    """ValueRange raw→value semantics (rValue: (raw+r0)*step with
    range clamping to rUNDEF)."""
    vr = ilwis.ValueRange("0:255:1")
    raw = np.array([0, 10, 255], np.int64)
    assert vr.r_value(raw).tolist() == [0.0, 10.0, 255.0]
    vr2 = ilwis.ValueRange("0:100:0.5,offset=3")
    assert vr2.r0 == 3.0
    assert vr2.r_value(np.array([7], np.int64))[0] == pytest.approx(5.0)
    out = vr2.r_value(np.array([100000], np.int64))[0]
    assert out == ilwis.R_UNDEF
