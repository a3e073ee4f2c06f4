"""JDEM / PAux / TIL / NDF pins (``autotest/gdrivers/{jdem,paux,til,
ndf}.py`` published values over the shipped fixtures)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import micro_formats as mf
from gdal_spark.raster.checksum import checksum_band

D = "/root/reference/autotest/gdrivers/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")


@needs_ref
def test_jdem_checksum_15():
    """jdem.py test_jdem_1."""
    arr, info = mf.read_jdem(open(f"{D}/jdem/fakejdem.mem",
                                  "rb").read())
    assert checksum_band(arr) == 15
    assert info["dtype"] == "float32"


@needs_ref
def test_paux_band2_12816():
    """paux.py test_paux_1: band 2 of the two-channel 16U raw, with
    the Swapped-means-native quirk and byte.tif's georeferencing."""
    arr, info = mf.read_paux(
        open(f"{D}/paux/small16.aux").read(),
        open(f"{D}/paux/small16.raw", "rb").read())
    assert info["bands"] == 2
    assert checksum_band(arr[:, :, 1]) == 12816
    assert info["geotransform"] == pytest.approx(
        (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0))


@needs_ref
def test_til_mosaic_4672():
    """til.py test_til_1: the single-tile TIL resolves its TIFF and
    reads at checksum 4672."""
    arr, info = mf.read_til(
        open(f"{D}/til/testtil.til").read(),
        lambda n: open(f"{D}/til/{n}", "rb").read())
    assert checksum_band(arr) == 4672
    assert info["tiles"] == 1


@needs_ref
def test_ndf_gt_and_window_6510():
    """ndf.py test_ndf_1: the published geotransform and the
    15620x1 window checksum 6510."""
    arr, info = mf.read_ndf(
        open(f"{D}/ndf/LE7134052000500350.H3").read(),
        lambda n: open(f"{D}/ndf/{n.rsplit('/', 1)[-1]}",
                       "rb").read())
    assert info["geotransform"] == pytest.approx(
        (320325.75, 14.25, 0, 1383062.25, 0, -14.25))
    assert checksum_band(arr[0:1, 0:15620]) == 6510
    assert info["band_names"] == ["ETM+_BAND_8"]
    assert info["zone"] == 46
