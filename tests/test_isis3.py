"""ISIS3 + VICAR readers vs the reference's published values
(``autotest/gdrivers/isis.py`` and ``vicar.py``)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import isis3
from gdal_spark.raster.checksum import checksum_band

D = "/root/reference/autotest/gdrivers/data/isis3"
V = "/root/reference/autotest/gdrivers/data/vicar"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")


def _resolve(name):
    return open(os.path.join(D, name), "rb").read()


@needs_ref
def test_detached_9978_with_published_gt():
    """test_isis_1: detached .lbl+.cub, checksum 9978 and the
    published geotransform."""
    arr, info = isis3.read_isis3(_resolve("isis3_detached.lbl"),
                                 resolve=_resolve)
    assert checksum_band(arr) == 9978
    # the autotest compares with gdaltest's pixel-relative epsilon
    want = (-4766.96484375, 10.102499961853027, 0.0,
            -872623.625, 0.0, -10.102499961853027)
    eps = (abs(want[1]) + abs(want[2])) / 100.0
    got = info["geotransform"]
    for a, b in zip(got, want):
        assert abs(a - b) <= eps


@needs_ref
def test_tiled_unit_cube_42403():
    """test_isis_3: tiled SignedWord cube, checksum 42403, with the
    Base/Multiplier scaling exposed."""
    arr, info = isis3.read_isis3(_resolve("isis3_unit_test.cub"))
    assert checksum_band(arr) == 42403
    assert info["dtype"] == "int16"
    assert info["format"] == "tile"
    assert info["scale"] == pytest.approx(0.25006486667989)
    assert info["offset"] == pytest.approx(8190.1245134999)
    assert info["nodata"] == -32768.0


@needs_ref
def test_geotiff_core_9978():
    """test_isis_5: Format=GeoTIFF core delegates to the TIFF codec,
    same checksum 9978."""
    arr, _ = isis3.read_isis3(_resolve("isis3_geotiff.lbl"),
                              resolve=_resolve)
    assert checksum_band(arr) == 9978


@needs_ref
def test_vicar_truncated_published_values():
    """vicar.py test_vicar_1: checksum 0 on the truncated file, the
    published geotransform, nodata 0, scale 2.34 / offset 4.56, and
    the nested json:VICAR label values."""
    buf = open(os.path.join(V, "test_vicar_truncated.bin"),
               "rb").read()
    arr, info = isis3.read_vicar(buf)
    assert checksum_band(arr) == 0
    assert info["geotransform"] == pytest.approx(
        (-53985.0, 25.0, 0.0, -200805.0, 0.0, -25.0), abs=1e-8)
    assert info["nodata"] == 0.0
    assert info["scale"] == pytest.approx(2.34, abs=1e-5)
    assert info["offset"] == pytest.approx(4.56, abs=1e-5)
    lbl = info["label"]
    assert lbl["LBLSIZE"] == 9680
    assert lbl["FORMAT"] == "BYTE"
    assert lbl["PROPERTY"]["M94_ORBIT"]["ASCENDING_NODE_LONGITUDE"] \
        == 118.46
    assert lbl["PROPERTY"]["M94_ORBIT"]["SPACECRAFT_ORIENTATION"] \
        == [0.0, -1.0, 0.0]
    assert lbl["TASK"]["HRCONVER"]["SPICE_FILE_NAME"] == ["foo"]
    assert lbl["TASK"]["HRORTHO"]["EXTORI_FILE_NAME"] \
        == "extori'_file_name"
    assert info["metadata"]["M94_ORBIT.STOP_TIME"] == "stop_time"


def test_synthetic_isis3_roundtrip():
    """Attached BandSequential + Tile layouts reconstruct exactly
    from a hand-built label (the gate query's shape)."""
    rng = np.random.default_rng(6)
    arr = rng.integers(-3000, 3000, (40, 60)).astype(np.int16)
    for fmt, extra in [("BandSequential", ""),
                       ("Tile", "    TileSamples = 32\n"
                                "    TileLines = 16\n")]:
        label = (
            "Object = IsisCube\n  Object = Core\n"
            "    StartByte = 1025\n"
            f"    Format = {fmt}\n{extra}"
            "    Group = Dimensions\n      Samples = 60\n"
            "      Lines = 40\n      Bands = 1\n    End_Group\n"
            "    Group = Pixels\n      Type = SignedWord\n"
            "      ByteOrder = Lsb\n      Base = 0.0\n"
            "      Multiplier = 1.0\n    End_Group\n"
            "  End_Object\nEnd_Object\nEnd\n").encode()
        label += b" " * (1024 - len(label))
        if fmt == "Tile":
            tiles = []
            for ty in range(3):
                for tx in range(2):
                    t = np.zeros((16, 32), np.int16)
                    sub = arr[ty * 16:(ty + 1) * 16,
                              tx * 32:(tx + 1) * 32]
                    t[:sub.shape[0], :sub.shape[1]] = sub
                    tiles.append(t.astype("<i2").tobytes())
            data = b"".join(tiles)
        else:
            data = arr.astype("<i2").tobytes()
        back, info = isis3.read_isis3(label + data)
        assert np.array_equal(back, arr), fmt
