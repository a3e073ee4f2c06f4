"""RMF codec vs the reference's published oracle values.

Every checksum below is published in ``autotest/gdrivers/rmf.py``
over the shipped fixtures: uncompressed / LZW / DEM / JPEG tiles,
little- and big-endian, 1/4/8/16/24-bit RSW, Int32/Float64 MTW, the
overview chain, and the cycled/invalid/corrupted-subheader
robustness set.
"""

from __future__ import annotations

import ctypes
import gzip
import os
import subprocess
import tempfile

import numpy as np
import pytest

from gdal_spark.raster import rmf
from gdal_spark.raster.checksum import checksum_band

D = "/root/reference/autotest/gdrivers/data/rmf"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")


def _load(name):
    return open(os.path.join(D, name), "rb").read()


def _band(a, k=0):
    return a if a.ndim == 2 else a[:, :, k]


@needs_ref
@pytest.mark.parametrize("name,cs,comp,dtype", [
    ("byte.rsw", 4672, "NONE", "uint8"),
    ("byte-lzw.rsw", 40503, "LZW", "uint8"),
    ("float64.mtw", 4672, "NONE", "float64"),
    ("t100.mtw", 6388, "RMF_DEM", "int32"),
    ("1bit.rsw", 34325, "NONE", "uint8"),
    ("4bit.rsw", 55221, "NONE", "uint8"),
    ("4bit-lzw.rsw", 55221, "LZW", "uint8"),
])
def test_single_band_checksums(name, cs, comp, dtype):
    arr, info = rmf.read_rmf(_load(name))
    assert checksum_band(_band(arr)) == cs
    assert info["compression"] == comp
    assert info["dtype"] == dtype


@needs_ref
@pytest.mark.parametrize("name,cs", [
    ("rgbsmall.rsw", [21212, 21053, 21349]),
    ("rgbsmall-lzw.rsw", [40503, 41429, 40238]),
    ("big-endian.rsw", [7782, 8480, 4195]),
])
def test_rgb_checksums(name, cs):
    arr, info = rmf.read_rmf(_load(name))
    assert [checksum_band(arr[:, :, k]) for k in range(3)] == cs
    assert info["bands"] == 3


@needs_ref
def test_big_endian_flag():
    _, info = rmf.read_rmf(_load("big-endian.rsw"))
    assert info["big_endian"]


@needs_ref
@pytest.mark.parametrize("name", [
    "cucled-1.rsw", "cucled-2.rsw",
    "invalid-subheader.rsw", "corrupted-subheader.rsw"])
def test_robustness_fixtures(name):
    """test_rmf_12a-d: files with cycled/invalid subheaders still
    read the main layer at checksum 4672."""
    arr, _ = rmf.read_rmf(_load(name))
    assert checksum_band(_band(arr)) == 4672


@needs_ref
def test_overview_chain():
    """test_rmf_11: three overviews at the published sizes and
    checksums."""
    buf = gzip.decompress(_load("overviews.rsw.gz"))
    ovrs = rmf.read_rmf_overviews(buf)
    assert [(o[1]["w"], o[1]["h"]) for o in ovrs] == \
        [(256, 256), (64, 64), (16, 16)]
    assert [checksum_band(_band(o[0])) for o in ovrs] == \
        [32756, 51233, 3192]


@pytest.fixture(scope="module")
def libjpeg():
    src = os.path.join(os.path.dirname(__file__), "..", "tools",
                       "jpeg_shim.c")
    so = os.path.join(tempfile.mkdtemp(), "shim.so")
    r = subprocess.run(["gcc", "-shared", "-fPIC", "-O2", src,
                        "-o", so, "-ljpeg"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"shim compile failed: {r.stderr[:200]}")
    return ctypes.CDLL(so)


@needs_ref
def test_jpeg_tiles_published_checksums(libjpeg):
    """test_rmf_27: with the real libjpeg decoding the tiles, the RMF
    layer reproduces GDAL's published band checksums exactly —
    pinning the B,G,R tile order and the band map {3,2,1}
    (rmfjpeg.cpp:95).  The in-repo JPEG codec differs only in IDCT
    rounding: its decode must stay within the 40 dB PSNR bar."""
    from tests.test_jpeg_oracle import _lj_decode

    buf = _load("jpeg-in-rmf.rsw")
    arr, info = rmf.read_rmf(buf, jpeg_decode=lambda b: _lj_decode(
        libjpeg, b))
    assert info["compression"] == "JPEG"
    cs = [checksum_band(arr[:, :, k]) for k in range(3)]
    assert cs in ([50553, 27604, 36652], [51009, 27640, 37765])
    ours, _ = rmf.read_rmf(buf)
    diff = arr.astype(np.float64) - ours.astype(np.float64)
    mse = float((diff ** 2).mean())
    psnr = 10 * np.log10(255.0 ** 2 / mse) if mse else np.inf
    assert psnr >= 40.0


@needs_ref
def test_createcopy_roundtrips():
    """tests 13-24 semantics: byte.rsw round-trips at 4672 through
    RSW and MTW, normal and huge versions, NONE and LZW."""
    src, _ = rmf.read_rmf(_load("byte.rsw"))
    for huge in (False, True):
        for comp in ("NONE", "LZW"):
            out = rmf.write_rmf(src, pixel_size=60.0, llx=440720.0,
                                lly=3750120.0, huge=huge,
                                compression=comp, tile_size=(16, 16))
            arr, info = rmf.read_rmf(out)
            assert checksum_band(_band(arr)) == 4672, (huge, comp)
            assert np.array_equal(_band(arr), src)
            assert info["version"] == (0x0201 if huge else 0x0200)
            assert info["compression"] == comp if comp != "LZW" else True


@needs_ref
def test_mtw_roundtrip_with_dem_compression():
    """test_rmf_31d: t100.mtw re-encoded with COMPRESS=RMF_DEM keeps
    checksum 6388."""
    src, sinfo = rmf.read_rmf(_load("t100.mtw"))
    out = rmf.write_rmf(src, mtw=True, compression="RMF_DEM",
                        pixel_size=sinfo["geotransform"][1]
                        if sinfo["geotransform"] else 1.0,
                        nodata=sinfo["nodata"])
    arr, info = rmf.read_rmf(out)
    assert checksum_band(_band(arr)) == 6388
    assert np.array_equal(_band(arr), src)
    assert info["compression"] == "RMF_DEM"


def test_mtw_metadata_and_nodata():
    """tests 25/26 semantics: nodata and elevation units round-trip;
    null tiles fill with nodata; elevation min/max skip nodata."""
    arr = np.full((32, 32), 33, np.int32)
    arr[0:16, 0:16] = 33  # stays nodata
    arr[16:, 16:] = 7
    out = rmf.write_rmf(arr, mtw=True, nodata=33.0,
                        elevation_unit="cm", tile_size=(16, 16))
    back, info = rmf.read_rmf(out)
    assert info["nodata"] == 33.0
    assert info["elev_unit"] == "cm"
    assert np.array_equal(back, arr)
    assert info["elev_min"] == 7.0 and info["elev_max"] == 7.0


def test_lzw_codec_roundtrip_property():
    rng = np.random.default_rng(5)
    for n in (1, 2, 17, 1000, 4096):
        data = rng.integers(0, 40, n).astype(np.uint8).tobytes()
        enc = rmf.lzw_compress(data)
        assert rmf.lzw_decompress(enc, len(data)) == data


def test_dem_codec_roundtrip_property():
    rng = np.random.default_rng(9)
    flat = np.cumsum(rng.integers(-2000, 2000, 500)).astype(np.int32)
    flat[10:40] = flat[9]  # zero-diff run
    data = flat.astype("<i4").tobytes()
    enc = rmf.dem_compress(data)
    assert rmf.dem_decompress(enc, len(data)) == data


def test_palette_roundtrip():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (20, 20)).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    out = rmf.write_rmf(arr, palette=pal)
    back, info = rmf.read_rmf(out)
    assert np.array_equal(back, arr)
    assert np.array_equal(info["palette"][:, :3], pal)


def test_rgb_roundtrip_epsg():
    """test_rmf_29 semantics: EPSG code survives (pinned 3388)."""
    rng = np.random.default_rng(4)
    cube = rng.integers(0, 256, (30, 40, 3)).astype(np.uint8)
    out = rmf.write_rmf(cube, pixel_size=10.0, llx=100.0, lly=200.0,
                        epsg=3388, compression="LZW")
    back, info = rmf.read_rmf(out)
    assert np.array_equal(back, cube)
    assert info["epsg"] == 3388
    assert info["geotransform"] == pytest.approx(
        (100.0, 10.0, 0.0, 200.0 + 30 * 10.0, 0.0, -10.0))
