"""EHdr (ESRI .hdr raw) codec vs the reference's published values.

Pins from ``autotest/gdrivers/ehdr.py``: float32.bil checksum 27,
ehdr10.bil / ehdr11.flt 8202 (msbfirst + size-inferred NBITS),
worldclim Int16 promotion + MinValue -191, byte/int32 CreateCopy
round trips at 4672, and rgba16.png band 2 at 2042.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import ehdr
from gdal_spark.raster.checksum import checksum_band

D = "/root/reference/autotest/gdrivers/data/ehdr"
GCORE = "/root/reference/autotest/gcore/data"
GDRV = "/root/reference/autotest/gdrivers/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")

BYTE_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def _rd(base, ext, **kw):
    data = open(f"{D}/{base}.{ext}", "rb").read()
    hdr = open(f"{D}/{base}.hdr").read()
    return ehdr.read_ehdr(data, hdr, ext=ext, **kw)


@needs_ref
def test_float32_bil():
    """test_ehdr_3: float32.bil checksum 27, ULXMAP center
    registration recovers byte.tif's geotransform."""
    arr, info = _rd("float32", "bil")
    assert info["dtype"] == "float32"
    assert checksum_band(arr) == 27
    assert info["geotransform"] == pytest.approx(BYTE_GT)


@needs_ref
def test_ehdr10_msbfirst_inferred_nbits():
    """test_ehdr_10: no NBITS key — inferred from file size; byteorder
    msbfirst; xllcorner corner registration."""
    arr, info = _rd("ehdr10", "bil")
    assert (info["dtype"], info["byteorder"]) == ("float32", "big")
    assert checksum_band(arr) == 8202
    assert info["geotransform"][0] == pytest.approx(-17973801.662435)


@needs_ref
def test_ehdr11_flt_extension():
    """test_ehdr_11: .flt extension selects Float32."""
    arr, info = _rd("ehdr11", "flt")
    assert info["dtype"] == "float32"
    assert checksum_band(arr) == 8202


@needs_ref
def test_worldclim_signed_promotion():
    """test_ehdr_9: negative NODATA promotes unknown pixel type to
    signed Int16; MinValue -191 surfaces; WGS84 datum keys parse."""
    _, info = _rd("wc_10m_CCCMA_A2a_2020_tmin_9", "bil",
                  header_only=True)
    assert info["dtype"] == "int16"
    assert info["min"] == -191.0
    assert info["nodata"] == -9999.0
    assert info["datum"].upper() == "WGS84"


@needs_ref
def test_byte_roundtrip_4672():
    """test_ehdr_2: byte.tif → EHdr → checksum 4672."""
    from gdal_spark.raster import tiff

    src, _ = tiff.decode_full(open(f"{GCORE}/byte.tif", "rb").read())
    src = src.squeeze()
    data, hdr = ehdr.write_ehdr(src, BYTE_GT)
    arr, info = ehdr.read_ehdr(data, hdr)
    assert checksum_band(arr) == 4672
    assert np.array_equal(arr, src)
    assert info["geotransform"] == pytest.approx(BYTE_GT)


@needs_ref
def test_int32_roundtrip_4672():
    """test_ehdr_7: int32.tif → EHdr → checksum 4672, SIGNEDINT."""
    from gdal_spark.raster import tiff

    src, _ = tiff.decode_full(open(f"{GCORE}/int32.tif", "rb").read())
    src = src.squeeze()
    data, hdr = ehdr.write_ehdr(src, BYTE_GT)
    arr, info = ehdr.read_ehdr(data, hdr)
    assert info["dtype"] == "int32"
    assert checksum_band(arr) == 4672


@needs_ref
def test_rgba16_png_band2_2042():
    """test_ehdr_1: 16-bit RGBA PNG → 4-band UInt16 EHdr, band 2
    checksum 2042."""
    from gdal_spark.raster import codec

    g = codec.decode_image(open(f"{GDRV}/png/rgba16.png", "rb").read())
    px = g["pixels"] if isinstance(g, dict) else g
    px = np.asarray(px)
    assert px.dtype == np.uint16 and px.shape[2] == 4
    data, hdr = ehdr.write_ehdr(px, BYTE_GT)
    arr, info = ehdr.read_ehdr(data, hdr)
    assert info["bands"] == 4 and info["dtype"] == "uint16"
    assert checksum_band(arr[:, :, 1]) == 2042
    assert np.array_equal(arr, px)


def test_subbyte_unpack():
    """test_ehdr_8 semantics: NBITS 1/2/4 packed rows, MSB-first,
    rows not byte-aligned by default."""
    # 2 rows x 5 cols at 4 bits = 40 bits = 5 bytes
    vals = np.array([[1, 2, 3, 4, 5], [15, 14, 13, 12, 11]], np.uint8)
    bits = np.unpackbits(vals.reshape(-1, 1), axis=1)[:, 4:]
    packed = np.packbits(bits.ravel())
    hdr = "NROWS 2\nNCOLS 5\nNBITS 4\n"
    arr, info = ehdr.read_ehdr(packed.tobytes(), hdr)
    assert info["nbits"] == 4
    assert np.array_equal(arr, vals)
    # 1-bit
    v1 = np.array([[1, 0, 1, 1, 0, 0, 1, 0, 1]], np.uint8)
    packed1 = np.packbits(v1.ravel())
    arr1, _ = ehdr.read_ehdr(packed1.tobytes(), "NROWS 1\nNCOLS 9\nNBITS 1\n")
    assert np.array_equal(arr1, v1)


def test_clr_color_table():
    """test_ehdr_rat companion: .clr parses into an RGBA table."""
    table = ehdr.parse_clr("0 0 0 0\n1 255 0 0\n4 0 255 0\n")
    assert table[1].tolist() == [255, 0, 0, 255]
    assert table[4].tolist() == [0, 255, 0, 255]


def test_yllcenter_registration():
    hdr = ("NROWS 3\nNCOLS 2\nNBITS 8\nxllcenter 10\nyllcenter 20\n"
           "cellsize 2\n")
    arr, info = ehdr.read_ehdr(bytes(6), hdr)
    gt = info["geotransform"]
    # center registration: origin shifted half a pixel out
    assert gt[0] == pytest.approx(9.0)
    assert gt[3] == pytest.approx(20 + 2 * 2 + 1.0)
