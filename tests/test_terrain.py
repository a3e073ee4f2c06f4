"""Terrain-grid formats vs the reference's published oracle values.

Pins from ``autotest/gdrivers/{srtmhgt,gsg,bt}.py``: checksums 60918
(SRTMHGT from the n43.dt0 upsample), 3636 (SRTMSWBD all-spaces), and
4672 for all three Golden Software fixtures and the BT round trip
(the byte.tif / float32.tif 20x20 grid).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from gdal_spark.raster import terrain
from gdal_spark.raster.checksum import checksum_band

GDRV = "/root/reference/autotest/gdrivers/data"
GCORE = "/root/reference/autotest/gcore/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(GDRV), reason="reference autotest data absent")

BYTE_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def _load(path):
    return open(path, "rb").read()


# ------------------------------------------------------------- SRTMHGT

@needs_ref
def test_hgt_checksum_60918():
    """autotest srtmhgt.py test_srtmhgt_1: n43.dt0 nearest-upsampled
    121→1201 and written as N43W080.hgt reads back at checksum 60918
    (also pins GDAL's RasterIO nearest rule and the write path)."""
    from gdal_spark.raster import dted

    src, _ = dted.read_dted(_load(f"{GDRV}/n43.dt0"))
    idx = terrain.gdal_nearest_indices(121, 1201)
    up = src[np.ix_(idx, idx)]
    buf = terrain.write_hgt(up)
    arr, info = terrain.read_hgt(buf, terrain.hgt_name(43, -80))
    assert arr.dtype == np.dtype(">i2")
    assert checksum_band(arr) == 60918
    assert info["geotransform"] == pytest.approx(
        (-80 - 0.5 / 1200, 1 / 1200, 0, 44 + 0.5 / 1200, 0, -1 / 1200),
        abs=1e-12)
    assert info["nodata"] == -32768


def test_swbd_raw_checksum_3636():
    """test_srtmhgt_4: a 3601x3601 all-0x20 SRTMSWBD byte raster has
    checksum 3636."""
    buf = b" " * (3601 * 3601)
    arr, info = terrain.read_hgt(buf, "N43W080.raw")
    assert arr.dtype == np.uint8
    assert checksum_band(arr) == 3636
    assert info["nodata"] is None


def test_hgts_float32():
    """test_srtmhgt_hgts: .hgts float32 variant."""
    buf = struct.pack(">f", 1.25) * (3601 * 3601)
    arr, _ = terrain.read_hgt(buf, "n00e006.hgts")
    assert arr.dtype == np.dtype(">f4")
    assert float(arr.min()) == 1.25 and float(arr.max()) == 1.25


@pytest.mark.parametrize("w,h,nb", [(1201, 1201, 2), (1801, 3601, 2),
                                    (3601, 3601, 1), (3601, 3601, 2),
                                    (3601, 3601, 4), (7201, 7201, 2)])
def test_hgt_all_supported_sizes(w, h, nb):
    """test_srtmhgt_all_supported_sizes: size→dims/dtype dispatch."""
    arr, info = terrain.read_hgt(bytes(w * h * nb), "n00e000.hgt")
    assert (info["w"], info["h"]) == (w, h)
    assert info["geotransform"][1] == pytest.approx(1.0 / (w - 1),
                                                    rel=1e-8)
    want = np.uint8 if nb == 1 else (np.dtype(">i2") if nb == 2
                                     else np.dtype(">f4"))
    assert arr.dtype == want


def test_hgt_corner_parse():
    assert terrain.hgt_corner("S09E120.hgt") == (-9, 120)
    assert terrain.hgt_corner("/x/N00W180.SRTMGL1.hgt") == (0, -180)
    with pytest.raises(ValueError):
        terrain.hgt_corner("X43W080.hgt")


# ------------------------------------------- Golden Software GSBG/GSAG/GS7BG

@needs_ref
@pytest.mark.parametrize("name,reader", [
    ("gsg_binary.grd", terrain.read_gsbg),
    ("gsg_ascii.grd", terrain.read_gsag),
    ("gsg_7binary.grd", terrain.read_gs7bg),
])
def test_gsg_fixture_checksums(name, reader):
    """autotest gsg.py: every Surfer fixture decodes at checksum 4672
    with byte.tif's geotransform."""
    arr, info = reader(_load(f"{GDRV}/gsg/{name}"))
    assert (info["w"], info["h"]) == (20, 20)
    assert checksum_band(arr.astype(np.int64)) == 4672
    assert info["geotransform"] == pytest.approx(BYTE_GT, abs=1e-6)
    assert (info["zmin"], info["zmax"]) == (74.0, 255.0)


@needs_ref
@pytest.mark.parametrize("reader,writer", [
    (terrain.read_gsbg, terrain.write_gsbg),
    (terrain.read_gsag, terrain.write_gsag),
    (terrain.read_gs7bg, terrain.write_gs7bg),
])
def test_gsg_createcopy_roundtrip(reader, writer):
    """gsg.py tests 4-8: CreateCopy keeps checksum 4672."""
    arr, info = terrain.read_gsbg(_load(f"{GDRV}/gsg/gsg_binary.grd"))
    out = writer(arr, info["geotransform"])
    arr2, info2 = reader(out)
    assert checksum_band(arr2.astype(np.int64)) == 4672
    assert np.allclose(arr2, arr)
    assert info2["geotransform"] == pytest.approx(BYTE_GT, abs=1e-6)


def test_gsg_blank_value_roundtrip():
    arr = np.full((5, 4), 7.5, np.float64)
    arr[2, 1] = terrain.GSG_BLANK
    gt = (0.0, 1.0, 0.0, 5.0, 0.0, -1.0)
    for writer, reader in [(terrain.write_gsag, terrain.read_gsag),
                           (terrain.write_gs7bg, terrain.read_gs7bg)]:
        arr2, info = reader(writer(arr, gt))
        assert arr2[2, 1] == info["nodata"]
        assert np.allclose(arr2[arr != terrain.GSG_BLANK],
                           arr[arr != terrain.GSG_BLANK])


# ----------------------------------------------------------------- BT

@needs_ref
def test_bt_float32_roundtrip_4672():
    """autotest bt.py test_bt_1/2: float32.tif → BT → checksum 4672,
    column-major bottom-up profile layout."""
    from gdal_spark.raster import tiff

    src, _ = tiff.decode_full(_load(f"{GCORE}/float32.tif"))
    src = src.squeeze().astype(np.float32)
    buf = terrain.write_bt(src, BYTE_GT, utm_zone=11, datum=6267)
    arr, info = terrain.read_bt(buf)
    assert arr.dtype == np.dtype("<f4")
    assert checksum_band(arr.astype(np.int64)) == 4672
    assert np.array_equal(arr, src)
    assert info["geotransform"] == pytest.approx(BYTE_GT, abs=1e-9)
    assert (info["utm_zone"], info["datum"]) == (11, 6267)
    assert info["version"] == "1.3"


@needs_ref
def test_bt_int16_and_int32():
    """bt.py test_bt_3/4 via int16.tif/int32.tif twins of byte.tif."""
    from gdal_spark.raster import tiff

    for fx, dt in [("int16.tif", "<i2"), ("int32.tif", "<i4")]:
        src, _ = tiff.decode_full(_load(f"{GCORE}/{fx}"))
        src = src.squeeze()
        arr, _ = terrain.read_bt(terrain.write_bt(src, BYTE_GT))
        assert arr.dtype == np.dtype(dt)
        assert checksum_band(arr.astype(np.int64)) == 4672
