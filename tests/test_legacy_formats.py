"""Legacy-format pins (``autotest/gdrivers/{lan,gtx,doq2,terragen,
isis2}.py`` published values over the shipped fixtures)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import legacy_formats as lf
from gdal_spark.raster.checksum import checksum_band

D = "/root/reference/autotest/gdrivers/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")


def _load(rel):
    return open(os.path.join(D, rel), "rb").read()


def _band(a):
    return a if a.ndim == 2 else a[:, :, 0]


@needs_ref
def test_lan_byte_and_4bit():
    """lan.py test_lan_1/2: both fixtures checksum 10."""
    arr, info = lf.read_lan(_load("lan/fakelan.lan"))
    assert checksum_band(_band(arr)) == 10
    assert info["magic"] == "HEAD74"
    arr4, info4 = lf.read_lan(_load("lan/fakelan4bit.lan"))
    assert checksum_band(_band(arr4)) == 10
    assert info4["four_bit"]


@needs_ref
def test_lan_roundtrip():
    rng = np.random.default_rng(8)
    cube = rng.integers(-2000, 2000, (12, 10, 2)).astype(np.int16)
    gt = (100.0, 30.0, 0.0, 900.0, 0.0, -30.0)
    arr, info = lf.read_lan(lf.write_lan(cube, gt))
    assert np.array_equal(arr, cube)
    assert info["geotransform"] == pytest.approx(gt)


@needs_ref
def test_gtx_hydroc1():
    """gtx.py: checksum 64183; south-to-north storage flips to
    north-first rows; half-pixel-shifted geotransform."""
    arr, info = lf.read_gtx(_load("gtx/hydroc1.gtx"))
    assert checksum_band(arr) == 64183
    assert info["dtype"] == "float32"
    gt = info["geotransform"]
    assert gt[1] > 0 and gt[5] < 0


@needs_ref
def test_gtx_roundtrip():
    rng = np.random.default_rng(2)
    grid = (rng.random((6, 9)) * 10 - 5).astype(np.float32)
    gt = (-77.0, 0.25, 0.0, 40.0, 0.0, -0.25)
    arr, info = lf.read_gtx(lf.write_gtx(grid, gt))
    assert np.array_equal(arr, grid)
    assert info["geotransform"] == pytest.approx(gt)


@needs_ref
def test_doq2_published_values():
    """doq2.py test_doq2_1: the three per-row checksums, the exact
    geotransform, and the QUADRANGLE_NAME metadata join."""
    arr, info = lf.read_doq2(_load("doq2/C3607614_truncated.NWS"))
    assert [checksum_band(arr[0:1, :, k]) for k in range(3)] == \
        [4201, 4010, 5820]
    assert info["geotransform"] == (377054.0, 1.0, 0.0,
                                    4082205.0, 0.0, -1.0)
    assert info["metadata"]["QUADRANGLE_NAME"] == \
        "NORFOLK SOUTH 3.45 or 7.5-min. name*"
    assert info["organization"] == "BIP"


@needs_ref
def test_terragen_float32_ter():
    """terragen.py test_terragen_1: checksum 1128 over the raw Int16
    samples (bottom-up rows)."""
    arr, info = lf.read_terragen(_load("terragen/float32.ter"))
    assert checksum_band(arr) == 1128
    assert (info["w"], info["h"]) == (20, 20)


@needs_ref
def test_terragen_roundtrip():
    rng = np.random.default_rng(4)
    grid = rng.integers(-5000, 5000, (15, 20)).astype(np.int16)
    arr, info = lf.read_terragen(
        lf.write_terragen(grid, scal=25.0, height_scale=1000,
                          base_height=7))
    assert np.array_equal(arr, grid)
    assert info["scal"] == 25.0
    assert info["height_scale"] == 1000
    assert info["base_height"] == 7
    assert info["scale"] == pytest.approx(25.0 * 1000 / 65536.0)
    assert info["offset"] == pytest.approx(175.0)


@needs_ref
def test_isis2_arvidson():
    """isis2.py: checksum 382; SUN_REAL big-endian Float32 with the
    hex-float CORE_NULL."""
    arr, info = lf.read_isis2(
        _load("isis2/arvidson_original_truncated.cub"))
    assert checksum_band(_band(arr)) == 382
    assert info["dtype"] == "float32"
    assert info["nodata"] == pytest.approx(-3.40282265508890445e38,
                                           rel=1e-6)
    assert info["target"] == "VENUS"
