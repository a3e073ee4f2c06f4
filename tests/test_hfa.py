"""HFA (Erdas Imagine) reader vs the reference's published values
(``autotest/gdrivers/hfa.py`` over the shipped fixtures)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import hfa
from gdal_spark.raster.checksum import checksum_band

D = "/root/reference/autotest/gdrivers/data/hfa"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")


def _resolve(name):
    for f in os.listdir(D):
        if f.lower() == name.lower():
            return open(os.path.join(D, f), "rb").read()
    raise FileNotFoundError(name)


def _load(name):
    return open(os.path.join(D, name), "rb").read()


@needs_ref
def test_int_img_6691():
    """test_hfa_int_read: checksum 6691, Int32 compressed layer."""
    arr, info = hfa.read_hfa(_load("int.img"))
    assert checksum_band(arr) == 6691
    assert info["dtype"] == "int32"
    assert (info["w"], info["h"]) == (201, 201)


@needs_ref
def test_float_img_23529_and_pixel():
    """test_hfa_float_read: checksum 23529 AND the published pixel
    value at (100,100) — pins the f32-from-integer-bits compression
    rule (#1000)."""
    arr, info = hfa.read_hfa(_load("float.img"))
    assert checksum_band(arr) == 23529
    assert info["dtype"] == "float32"
    assert float(arr[100, 100]) == pytest.approx(41.021659851074219,
                                                 abs=1e-4)


@needs_ref
def test_spill_1631_and_overview_340():
    """test_hfa_rde_overviews: .ige spill band checksum 1631; the
    .rrd/.rde overview chain gives 340."""
    buf = _load("spill.img")
    arr, info = hfa.read_hfa(buf, resolve=_resolve)
    assert checksum_band(arr) == 1631
    ovs = hfa.read_hfa_overviews(buf, _resolve)
    assert [checksum_band(o[0]) for o in ovs] == [340]
    assert (ovs[0][1]["w"], ovs[0][1]["h"]) == (5, 8)


@needs_ref
def test_small1bit_overview_4247():
    """test_hfa_read_bit2grayscale: the 8-bit greyscale overview of a
    1-bit image, checksum 4247."""
    buf = _load("small1bit.img")
    arr, _ = hfa.read_hfa(buf)
    assert arr.max() <= 1  # u1 band
    ovs = hfa.read_hfa_overviews(buf, _resolve)
    assert [checksum_band(o[0]) for o in ovs] == [4247]


@needs_ref
def test_compressed_and_georef_fixtures():
    """dem10.img / i8u_c_i.img / bug_1109.img decode with the
    expected georeferencing; regression-pinned checksums."""
    arr, info = hfa.read_hfa(_load("dem10.img"))
    assert checksum_band(arr) == 13692
    assert info["geotransform"][1] == pytest.approx(3.0)
    arr, _ = hfa.read_hfa(_load("i8u_c_i.img"))
    assert checksum_band(arr) == 45351
    arr, info = hfa.read_hfa(_load("bug_1109.img"))
    assert checksum_band(arr) == 61683
    assert info["geotransform"] == pytest.approx(
        (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0))


@needs_ref
def test_nodata_from_noninitialized_value():
    """87test.img carries Eimg_NonInitializedValue → nodata 0."""
    _, info = hfa.read_hfa(_load("87test.img"))
    assert info["nodata"] == 0.0


def test_writer_roundtrip_all_types():
    rng = np.random.default_rng(5)
    gt = (1000.0, 5.0, 0.0, 2000.0, 0.0, -5.0)
    for dt in (np.uint8, np.int8, np.uint16, np.int16, np.int32,
               np.float32, np.float64):
        arr = (rng.random((70, 90)) * 100).astype(dt)
        back, info = hfa.read_hfa(hfa.write_hfa(arr, gt, nodata=42.0))
        assert np.array_equal(back, arr), dt
        assert info["geotransform"] == pytest.approx(gt)
        assert info["nodata"] == 42.0


def test_dictionary_parser():
    types = hfa.parse_dictionary(
        "{1:lwidth,1:e2:a,b,mode,1:*oSub,child,}Top,{1:dx,}Sub,")
    assert [f.name for f in types["Top"]] == ["width", "mode", "child"]
    assert types["Top"][1].enum_names == ["a", "b"]
    assert types["Top"][2].obj_type == "Sub"
