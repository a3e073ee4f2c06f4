"""DTED codec vs the reference's published oracle values.

Every assertion pins a value published in
``autotest/gdrivers/dted.py`` (GDAL band checksums, geotransforms,
datum strings) over the shipped autotest fixtures — an oracle fully
independent of this repo's kernels.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import dted
from gdal_spark.raster.checksum import checksum_band

GCORE = "/root/reference/autotest/gdrivers/data"
GDRV = "/root/reference/autotest/gdrivers/data/dted"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(GDRV), reason="reference autotest data absent")

N43_GT = (-80.004166666666663, 0.0083333333333333332, 0,
          44.00416666666667, 0, -0.0083333333333333332)


def _load(path):
    return open(path, "rb").read()


@needs_ref
def test_n43_checksum_and_georef():
    """autotest dted.py test_dted_1/2: checksum 49187, the published
    geotransform, WGS-84 WKT, nodata -32767, Int16."""
    arr, info = dted.read_dted(_load(f"{GCORE}/n43.dt0"))
    assert (info.w, info.h, info.level) == (121, 121, 0)
    assert arr.dtype == np.int16
    assert checksum_band(arr) == 49187
    assert info.geotransform == pytest.approx(N43_GT, abs=1e-6)
    assert info.nodata == -32767
    assert info.projection_wkt == dted.WKT_WGS84
    assert not info.datum_warning


@needs_ref
def test_n43_subwindow():
    """test_dted_4: checksum of the (5,5,5,5) window is 305."""
    arr, _ = dted.read_dted(_load(f"{GCORE}/n43.dt0"))
    assert checksum_band(arr[5:10, 5:10]) == 305


@needs_ref
def test_wgs72_warning():
    """test_dted_7: WGS72 horizontal datum detected with a warning."""
    _, info = dted.read_dted(_load(f"{GDRV}/n43_wgs72.dt0"))
    assert info.datum.upper() == "WGS72"
    assert info.datum_warning
    assert info.projection_wkt.startswith('GEOGCS["WGS 72"')


@needs_ref
def test_bad_crc_raises_only_when_verifying():
    """test_dted_8: checksum errors surface under DTED_VERIFY_CHECKSUM."""
    buf = _load(f"{GDRV}/n43_bad_crc.dt0")
    dted.read_dted(buf)  # default: no verification, no raise
    with pytest.raises(ValueError, match="checksum"):
        dted.read_dted(buf, verify_checksum=True)


@needs_ref
def test_coord_inverted():
    """test_dted_11: MIL-D-89020 original-edition lat/long inversion
    is detected and the geotransform still comes out right."""
    arr, info = dted.read_dted(_load(f"{GDRV}/n43_coord_inverted.dt0"))
    assert info.geotransform == pytest.approx(N43_GT, abs=1e-6)
    assert info.nodata == -32767


@needs_ref
def test_hdr_prefixed_file_opens():
    """test_dted_12: a file that begins with an HDR record (#2951)."""
    arr, info = dted.read_dted(_load(f"{GDRV}/w118n033_trunc.dt1"))
    assert info.w > 0 and info.h > 0


@needs_ref
def test_partial_cols():
    """test_dted_13: sequential partial-column variant, checksum 56006."""
    arr, info = dted.read_dted(_load(f"{GDRV}/n43_partial_cols.dt0"))
    assert info.partial
    assert checksum_band(arr) == 56006


@needs_ref
def test_sparse_cols():
    """test_dted_14: non-sequential sparse columns, checksum 56369."""
    arr, info = dted.read_dted(_load(f"{GDRV}/n43_sparse_cols.dt0"))
    assert info.partial
    assert checksum_band(arr) == 56369


@needs_ref
def test_pixel_is_point():
    """test_dted_16: DTED_APPLY_PIXEL_IS_POINT shifts the origin to
    the record posts themselves."""
    _, info = dted.read_dted(_load(f"{GCORE}/n43.dt0"),
                             pixel_is_point=True)
    assert info.geotransform == pytest.approx(
        (-80.0, 1 / 120.0, 0, 44.0, 0, -1 / 120.0), abs=1e-6)


@needs_ref
def test_createcopy_roundtrip():
    """test_dted_3/10: CreateCopy of n43.dt0 re-reads with checksum
    49187, identical geotransform and SRS."""
    arr, info = dted.read_dted(_load(f"{GCORE}/n43.dt0"))
    out = dted.write_dted(arr, ll_lon=-80.0, ll_lat=43.0)
    arr2, info2 = dted.read_dted(out)
    assert checksum_band(arr2) == 49187
    assert np.array_equal(arr, arr2)
    assert info2.geotransform == pytest.approx(info.geotransform, abs=1e-9)
    assert info2.projection_wkt == dted.WKT_WGS84
    # the writer's records carry valid checksums
    dted.read_dted(out, verify_checksum=True)


@needs_ref
def test_geotiff_twin_pixel_identity():
    """autotest ships n43.tif as the GeoTIFF twin of n43.dt0: the two
    decoders must agree pixel-for-pixel (cross-format oracle)."""
    from gdal_spark.raster import tiff

    arr, _ = dted.read_dted(_load(f"{GCORE}/n43.dt0"))
    twin, _ = tiff.decode_full(_load(f"{GCORE}/n43.tif"))
    assert np.array_equal(arr, twin.squeeze().astype(np.int16))


def test_synthetic_roundtrip_negative_and_nodata():
    """Signed-magnitude handling: negatives and the -32767 nodata
    survive a write→read round trip bit-exactly."""
    rng = np.random.default_rng(7)
    arr = rng.integers(-500, 9000, (121, 121), dtype=np.int16)
    arr[3, 4] = dted.NODATA
    arr[0, 0] = -1
    out = dted.write_dted(arr, ll_lon=12.0, ll_lat=-34.0)
    arr2, info = dted.read_dted(out, verify_checksum=True)
    assert np.array_equal(arr, arr2)
    assert info.geotransform[0] == pytest.approx(12.0 - 0.5 / 120.0)
    assert info.geotransform[3] == pytest.approx(-34.0 + 121 / 120.0
                                                 - 0.5 / 120.0)


def test_zone_width_validation():
    """dted_create.c:122-130 zone-reduced widths above 50° latitude."""
    arr = np.zeros((121, 61), np.int16)
    out = dted.write_dted(arr, ll_lon=10.0, ll_lat=53.0)
    arr2, info = dted.read_dted(out)
    assert (info.w, info.h) == (61, 121)
    with pytest.raises(ValueError, match="requires 61"):
        dted.write_dted(np.zeros((121, 121), np.int16),
                        ll_lon=10.0, ll_lat=53.0)
