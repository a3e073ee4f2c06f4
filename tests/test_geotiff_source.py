"""GeoTIFF directory source: binaryFile scan + in-repo TIFF codec."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import tiff
from gdal_spark.raster.checksum import checksum_bands
from gdal_spark.sources.geotiff import read_geotiff_metadata, read_geotiffs

REF_DATA = "/root/reference/autotest/gcore/data"


@pytest.fixture(scope="module")
def tif_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tifs")
    rng = np.random.default_rng(42)
    for i in range(6):
        arr = (rng.random((40 + i, 30 + 2 * i)) * 255).astype(np.uint8)
        buf = tiff.encode_geotiff(
            arr,
            geotransform=(100.0 * i, 0.5, 0.0, 50.0 * i, 0.0, -0.5),
            epsg=32633,
            block=(16, 16),
            compression="deflate",
            overviews=1,
        )
        (d / f"img_{i}.tif").write_bytes(buf)
    return str(d)


def test_metadata_scan(spark, tif_dir):
    rows = {r.image_id: r for r in read_geotiff_metadata(spark, tif_dir).collect()}
    assert len(rows) == 6
    r3 = rows["img_3"]
    assert (r3.w, r3.h, r3.bands, r3.dtype) == (36, 43, 1, "u1")
    assert r3.compression == 8 and r3.tiled and r3.n_ifds == 2
    assert (r3.gt_x0, r3.gt_px, r3.gt_y0, r3.gt_py) == (300.0, 0.5, 150.0, -0.5)
    assert r3.epsg == 32633


def test_full_scan_feeds_pipeline(spark, tif_dir):
    from gdal_spark.raster.pipeline import with_checksums

    imgs = read_geotiffs(spark, tif_dir)
    out = {r.image_id: r for r in with_checksums(imgs).collect()}
    assert len(out) == 6
    # distributed checksum equals the local single-process value
    rng = np.random.default_rng(42)
    for i in range(6):
        arr = (rng.random((40 + i, 30 + 2 * i)) * 255).astype(np.uint8)
        assert out[f"img_{i}"].checksum_b0 == checksum_bands(np.atleast_3d(arr))[0]


def test_overview_level_scan(spark, tif_dir):
    ov = {r.image_id: r for r in read_geotiffs(spark, tif_dir, ifd_index=1).collect()}
    assert ov["img_0"].w == 15 and ov["img_0"].h == 20


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference fixtures absent")
def test_scan_reads_gdal_produced_files(spark, tmp_path):
    import shutil

    for name in ["byte.tif", "rgbsmall.tif", "int16.tif"]:
        shutil.copy(os.path.join(REF_DATA, name), tmp_path / name)
    meta = {r.image_id: r for r in read_geotiff_metadata(spark, str(tmp_path)).collect()}
    assert meta["byte"].w == 20 and meta["byte"].epsg == 26711
    assert meta["rgbsmall"].bands == 3
    from gdal_spark.raster.pipeline import with_checksums

    cs = {r.image_id: r for r in with_checksums(read_geotiffs(spark, str(tmp_path))).collect()}
    assert cs["byte"].checksum_b0 == 4672
    assert [cs["rgbsmall"].checksum_b0, cs["rgbsmall"].checksum_b1, cs["rgbsmall"].checksum_b2] == [
        21212, 21053, 21349,
    ]
    assert cs["int16"].checksum_b0 == 4672
