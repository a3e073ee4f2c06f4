"""NITF reader vs the reference's published oracle values
(``autotest/gdrivers/nitf.py`` over the shipped fixtures)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import nitf
from gdal_spark.raster.checksum import checksum_band

D = "/root/reference/autotest/gdrivers/data/nitf"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")


def _load(name):
    return open(os.path.join(D, name), "rb").read()


@needs_ref
def test_rgb_checksum_and_adjusted_igeolo_gt():
    """test_nitf_6: band 3 checksum 21349, WGS84, and the published
    'adjusted IGEOLO interp' geotransform (half-pixel corner GCPs
    through the least-squares affine)."""
    arr, info = nitf.read_nitf(_load("rgb.ntf"))
    assert info["bands"] == 3
    assert checksum_band(arr[:, :, 2]) == 21349
    assert info["srs"] == "WGS84"
    gt = info["geotransform"]
    assert gt[0] == pytest.approx(-44.842029478458, abs=1e-10)
    assert gt[1] == pytest.approx(0.003503401360, abs=1e-10)
    assert gt[3] == pytest.approx(-22.930748299319, abs=1e-9)


@needs_ref
@pytest.mark.parametrize("name", ["i_3034c.ntf", "i_3034f.ntf",
                                  "ns3034d.nsf"])
def test_1bit_images_170(name):
    """test_nitf_11/38/61-ish: 1-bit NITF 2.1 + NSIF variants (plain
    and masked NM) all checksum 170."""
    arr, info = nitf.read_nitf(_load(name))
    assert checksum_band(arr) == 170
    assert info["nbpp"] == 1
    assert (info["w"], info["h"]) == (35, 18)


@needs_ref
def test_c1_bilevel_65024():
    """test_nitf_19: BILEVEL (C1) decompression of U_1050A.NTF —
    decoded exactly as the reference does, by wrapping the stream in
    a CCITT G3 TIFF for the real libtiff."""
    arr, info = nitf.read_nitf(_load("U_1050A.NTF"))
    assert info["ic"] == "C1"
    assert checksum_band(arr) == 65024
    assert (info["w"], info["h"]) == (1024, 1024)


@needs_ref
def test_nitf20_header_only():
    """U_1050A (NITF 2.0): the 2.0 header path parses header-only."""
    _, info = nitf.read_nitf(_load("U_1050A.NTF"), header_only=True)
    assert info["version"].startswith("NITF02.0")
    assert (info["w"], info["h"]) == (1024, 1024)
    assert info["ic"] == "C1"


def test_nitf1x_rejected():
    """NITF 1.x stays an explicit raise (the reference handles it via
    a separate legacy path we do not claim)."""
    buf = b"NITF01.10" + b" " * 400
    with pytest.raises(ValueError):
        nitf.read_nitf(buf)
