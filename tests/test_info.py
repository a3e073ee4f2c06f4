"""gdalinfo/ogrinfo analogues: header-only sniff vs the encoders
(apps/gdalinfo_lib.cpp identify+size probe; apps/ogrinfo_lib.cpp -so).
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster import codec


@pytest.mark.parametrize(
    "fmt,shape,bands",
    [
        ("png", (13, 21, 3), 3),
        ("png", (8, 5), 1),
        ("jpeg", (16, 24, 3), 3),
        ("webp", (9, 7, 3), 3),
        ("tiff", (12, 10, 3), 3),
        ("pnm", (6, 11, 3), 3),
        ("pnm", (6, 11), 1),
    ],
)
def test_sniff_matches_encoder(fmt, shape, bands):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 255, shape, dtype=np.uint8)
    buf = codec.encode_image(arr, fmt)
    drv, w, h, b = codec.sniff_info(buf)
    canon = {"tif": "tiff"}.get(fmt, fmt)
    assert drv == canon
    assert (w, h, b) == (shape[1], shape[0], bands)


def test_sniff_rejects_garbage():
    with pytest.raises(NotImplementedError):
        codec.sniff_info(b"\x00" * 64)


def test_sniff_jpeg_skips_app_segments():
    """SOF must be found past APPn/DQT/DHT segments (T.81 B.2.2)."""
    arr = np.full((4, 6, 3), 128, dtype=np.uint8)
    buf = codec.encode_image(arr, "jpeg")
    # inject an APP1 segment right after SOI
    app1 = b"\xff\xe1" + (10).to_bytes(2, "big") + b"Exif\x00\x00\x01\x02"
    patched = buf[:2] + app1 + buf[2:]
    drv, w, h, b = codec.sniff_info(patched)
    assert (drv, w, h, b) == ("jpeg", 6, 4, 3)


def test_layer_summary(spark):
    from gdal_spark.operators.info import layer_summary

    df = spark.createDataFrame(
        [
            (0.0, 0.0, 2.0, 2.0, "a", 5),
            (1.0, -1.0, 3.0, 1.0, "b", None),
            (4.0, 4.0, 5.0, 9.0, "a", 5),
        ],
        "lon_min double, lat_min double, lon_max double, lat_max double,"
        " category string, population int",
    )
    r = layer_summary(df, fields=("category", "population")).collect()[0]
    assert r.feature_count == 3
    assert (r.ext_lon_min, r.ext_lat_min, r.ext_lon_max, r.ext_lat_max) == (
        0.0,
        -1.0,
        5.0,
        9.0,
    )
    assert (r.null_category, r.distinct_category) == (0, 2)
    assert (r.null_population, r.distinct_population) == (1, 1)


_WEBP_REF = "/root/reference/autotest/gdrivers/data/webp"
_GCORE_REF = "/root/reference/autotest/gcore/data"


def _ref_bytes(path):
    import os

    if not os.path.exists(path):
        pytest.skip("reference autotest data not present")
    with open(path, "rb") as f:
        return f.read()


def test_sniff_lossy_vp8_and_vp8x():
    """Wild-web WebP variants: lossy VP8 key-frame header (RFC 6386
    §9.1) and VP8X canvas size + alpha flag."""
    d = _ref_bytes(f"{_WEBP_REF}/rgbsmall.webp")
    assert codec.sniff_info(d) == ("webp", 50, 50, 3)
    d = _ref_bytes(f"{_WEBP_REF}/rgbsmall_with_xmp.webp")  # VP8X wrap
    assert codec.sniff_info(d) == ("webp", 50, 50, 3)


@pytest.mark.parametrize(
    "name,w,h",
    [
        ("bigtiff_one_block_long8.tif", 1, 1),
        ("bigtiff_one_block_be_long8.tif", 1, 1),
        ("bigtiff_four_strip_be_short.tif", 1, 4),
    ],
)
def test_sniff_bigtiff(name, w, h):
    """BigTIFF (magic 43): 8-byte offsets, 20-byte entries, LONG8 dims
    — against the reference's own gcore fixtures, both endians."""
    d = _ref_bytes(f"{_GCORE_REF}/{name}")
    drv, sw, sh, sb = codec.sniff_info(d)
    assert (drv, sw, sh) == ("tiff", w, h)
