"""PDS3 reader vs the reference's published oracle values.

Every checksum/geotransform/scale/nodata below is published in
``autotest/gdrivers/pds.py`` over the shipped fixtures, spanning
attached and detached labels, record- and byte-offset pointers, the
UNCOMPRESSED_FILE / FILE object prefixes, LINE_INTERLEAVED storage,
the ZIP container, hex-float nodata, and the rotated
oblique-cylindrical geotransform.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import pds
from gdal_spark.raster.checksum import checksum_band

D = "/root/reference/autotest/gdrivers/data/pds"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")


def _resolve(name):
    for f in os.listdir(D):
        if f.lower() == name.lower():
            return open(os.path.join(D, f), "rb").read()
    raise FileNotFoundError(name)


def _rd(name, **kw):
    return pds.read_pds(open(os.path.join(D, name), "rb").read(),
                        resolve=_resolve, **kw)


def _band(a):
    return a if a.ndim == 2 else a[:, :, 0]


@needs_ref
@pytest.mark.parametrize("name,cs", [
    ("mc02_truncated.img", 47151),          # test_pds_1
    ("fl73n003_truncated.img", 34962),      # test_pds_2
    ("EN0001426030M_truncated.IMG", 1367),  # test_pds_3
    ("pds_3177.lbl", 3418),                 # test_pds_4
    ("pds_3355.lbl", 2748),                 # test_pds_5 (detached+offset)
    ("ESP_013951_1955_RED.LBL", 4672),      # test_pds_6 (delegated file)
    ("map_000_038_truncated.lbl", 14019),   # line offset != record mult
    ("hsp00017ba0_01_ra218s_trr3_truncated.lbl", 64740),  # LINE_INTERLEAVED
    ("PDS_WITH_ZIP_IMG.LBL", 0),            # test_pds_9 (ZIP container)
])
def test_published_checksums(name, cs):
    arr, _ = _rd(name)
    assert checksum_band(_band(arr)) == cs


@needs_ref
def test_ldem4_window():
    """test_pds_7: the 2-row window of the truncated LDEM_4 detached
    image, checksum 50938; Int16 LSB with scale 0.5 / offset
    1737400."""
    arr, info = _rd("LDEM_4.LBL", window=(0, 0, 1440, 2))
    assert checksum_band(arr) == 50938
    assert info["dtype"] == "int16"
    assert info["scale"] == 0.5
    assert info["offset"] == 1737400.0


@needs_ref
def test_scale_offset_nodata():
    """test_pds_2 attributes: nodata 7, scale 0.2, offset -20.2."""
    _, info = _rd("fl73n003_truncated.img", header_only=True)
    assert info["nodata"] == 7.0
    assert info["scale"] == pytest.approx(0.2)
    assert info["offset"] == pytest.approx(-20.2)
    _, info = _rd("EN0001426030M_truncated.IMG", header_only=True)
    assert info["nodata"] == 0.0


@needs_ref
def test_pds4_geotransform_with_negative_shifts():
    """test_pds_4: PDS_SampleProjOffset_Shift=-0.5 equivalents give
    the published geotransform exactly."""
    _, info = _rd("pds_3177.lbl", header_only=True,
                  sample_shift=-0.5, line_shift=-0.5)
    assert info["geotransform"] == pytest.approx(
        (6119184.3590369327, 1.0113804322107001, 0.0,
         -549696.39009125973, 0.0, -1.0113804322107001), abs=1e-4)


@needs_ref
def test_pds8_magellan_shifts():
    """test_pds_8: MAGELLAN shift/mult overrides; the autotest
    compares with gdaltest's pixel-relative epsilon."""
    _, info = _rd("mc02_truncated.img", header_only=True,
                  sample_shift=1.5, line_shift=1.5,
                  sample_mult=1.0, line_mult=-1.0)
    gt = info["geotransform"]
    want = (10670237.134337425, 926.11527442932129, 0.0,
            -3854028.7145376205, 0.0, -926.11527442932129)
    eps = (abs(want[1]) + abs(want[2])) / 100.0  # gdaltest gt epsilon
    for a, b in zip(gt, want):
        assert abs(a - b) <= eps


@needs_ref
def test_zip_hex_nodata():
    """test_pds_9: nodata from MISSING_CONSTANT = "16#FF7FFFFB#"."""
    _, info = _rd("PDS_WITH_ZIP_IMG.LBL", header_only=True)
    expected = -3.40282265508890445e38
    assert abs((info["nodata"] - expected) / expected) <= 1e-5


@needs_ref
def test_oblique_cylindrical_rotated_gt():
    """test_pds_oblique_cylindrical_read: MAP_PROJECTION_ROTATION=90
    produces the published rotated geotransform."""
    _, info = _rd("BIBQH03N123_D101_T020S03_V03_truncated.IMG",
                  header_only=True)
    assert info["geotransform"] == pytest.approx(
        (-5347774.07796, 0, 351.11116, -2561707.02336, 351.11116, 0),
        abs=1e-3)


@needs_ref
def test_band_storage_line_interleaved_is_bil():
    _, info = _rd("hsp00017ba0_01_ra218s_trr3_truncated.lbl",
                  header_only=True)
    assert info["layout"] == "BIL"
    assert info["dtype"] == "float32"


def test_label_parser_nested_arrays():
    """test_pds_10 semantics (#6970): nested list values survive."""
    kv = pds.parse_label(
        'PDS_VERSION_ID = "PDS3"\n'
        "NOTE = ((1, 2, 3))\n"
        "PRODUCT_ID = ({1, 2}, {3,4})\n"
        "OBJECT = IMAGE\n LINES = 2\nEND_OBJECT\nEND\n")
    assert kv["NOTE"] == "((1, 2, 3))"
    assert kv["PRODUCT_ID"] == "({1, 2}, {3,4})"
    assert kv["IMAGE.LINES"] == "2"


def test_not_a_label():
    with pytest.raises(ValueError):
        pds.read_pds(b"GIF89a not a label at all")
