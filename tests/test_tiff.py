"""(Geo)TIFF codec tests.

The decode tests are **external oracles**: the fixture files were
produced by GDAL itself (``autotest/gcore/data``) and the expected
checksums are the values the reference's own test suite publishes
(``autotest/gcore/tiff_read.py:45-77``, band-1 checksum table;
``autotest/gcore/libertiff.py:345-500``, compression x predictor x
layout matrices).  Nothing in this repo generated either side of the
comparison, so a green run pins the TIFF reader AND the
``GDALChecksumImage`` reimplementation against the reference at once —
unlike the golden-parquet oracles, which pin distribution-determinism
only.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import tiff
from gdal_spark.raster.checksum import checksum_bands

DATA = "/root/reference/autotest/gcore/data"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference autotest fixtures not present"
)


def _load(name: str) -> bytes:
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


# tiff_read.py init_list — every entry our feature subset covers
BAND1_4672 = [
    "byte.tif",
    "int16.tif",
    "uint16.tif",
    "int32.tif",
    "uint32.tif",
    "float32.tif",
    "float64.tif",
]

# libertiff.py byte_* matrix (compression x tiled x planar), all 4672
BYTE_VARIANTS = [
    "gtiff/byte_NONE.tif",
    "gtiff/byte_NONE_tiled.tif",
    "gtiff/byte_NONE_separate.tif",
    "gtiff/byte_NONE_tiled_separate.tif",
    "gtiff/byte_DEFLATE.tif",
    "gtiff/byte_DEFLATE_tiled.tif",
    "gtiff/byte_DEFLATE_separate.tif",
    "gtiff/byte_DEFLATE_tiled_separate.tif",
    "gtiff/byte_LZW.tif",
    "gtiff/byte_LZW_tiled.tif",
    "gtiff/byte_LZW_separate.tif",
    "gtiff/byte_LZW_tiled_separate.tif",
    "gtiff/byte_LZW_predictor_2.tif",
]

# libertiff.py predictor matrix, all 4672
PREDICTOR_VARIANTS = [
    "gtiff/byte_LZW_predictor_2.tif",
    "gtiff/float32_LZW_predictor_2.tif",
    "gtiff/float32_LZW_predictor_3.tif",
    "gtiff/float32_lzw_predictor_3_big_endian.tif",
    "gtiff/float64_LZW_predictor_2.tif",
    "gtiff/float64_LZW_predictor_3.tif",
    "gtiff/uint16_LZW_predictor_2.tif",
    "gtiff/uint32_LZW_predictor_2.tif",
    "gtiff/uint64_LZW_predictor_2.tif",
]

# libertiff.py rgbsmall matrix -> [21212, 21053, 21349]
RGBSMALL_VARIANTS = [
    "rgbsmall.tif",
    "gtiff/rgbsmall_NONE.tif",
    "gtiff/rgbsmall_NONE_tiled.tif",
    "gtiff/rgbsmall_NONE_separate.tif",
    "gtiff/rgbsmall_NONE_tiled_separate.tif",
    "gtiff/rgbsmall_DEFLATE.tif",
    "gtiff/rgbsmall_DEFLATE_tiled.tif",
    "gtiff/rgbsmall_DEFLATE_separate.tif",
    "gtiff/rgbsmall_DEFLATE_tiled_separate.tif",
    "gtiff/rgbsmall_LZW.tif",
    "gtiff/rgbsmall_LZW_tiled.tif",
    "gtiff/rgbsmall_LZW_separate.tif",
    "gtiff/rgbsmall_LZW_tiled_separate.tif",
    "gtiff/rgbsmall_byte_LZW_predictor_2.tif",
    "gtiff/rgbsmall_uint16_LZW_predictor_2.tif",
    "gtiff/rgbsmall_uint32_LZW_predictor_2.tif",
]

# partial final strip/tile fixtures (reference issue #1179): band 2 = 15234
PARTIAL_BLOCK = [
    "contig_strip.tif",
    "contig_tiled.tif",
    "separate_tiled.tif",
    "seperate_strip.tif",
]


@needs_ref
@pytest.mark.parametrize("name", BAND1_4672 + BYTE_VARIANTS + PREDICTOR_VARIANTS)
def test_decode_band1_4672(name):
    if not os.path.exists(os.path.join(DATA, name)):
        pytest.skip(f"{name} absent in this reference checkout")
    arr = tiff.decode(_load(name))
    assert checksum_bands(np.atleast_3d(arr))[0] == 4672


@needs_ref
@pytest.mark.parametrize("name", RGBSMALL_VARIANTS)
def test_decode_rgbsmall(name):
    if not os.path.exists(os.path.join(DATA, name)):
        pytest.skip(f"{name} absent in this reference checkout")
    arr = tiff.decode(_load(name))
    assert checksum_bands(arr) == [21212, 21053, 21349]


@needs_ref
@pytest.mark.parametrize("name", PARTIAL_BLOCK)
def test_decode_partial_blocks(name):
    arr = tiff.decode(_load(name))
    assert checksum_bands(arr)[1] == 15234


@needs_ref
def test_decode_greyalpha_two_bands():
    # libertiff.py test_libertiff_check_predictor_2_bands: [1970, 10807]
    name = "gtiff/stefan_full_greyalpha_byte_LZW_predictor_2.tif"
    if not os.path.exists(os.path.join(DATA, name)):
        pytest.skip("fixture absent")
    arr = tiff.decode(_load(name))
    assert checksum_bands(arr) == [1970, 10807]


@needs_ref
@pytest.mark.parametrize(
    "name,expected_offsets",
    [
        # tiff_read.py:3838-3860 test_tiff_read_stripoffset_types — published
        # BLOCK_OFFSET values across StripOffsets datatypes x endianness x
        # classic/BigTIFF
        ("classictiff_one_block_long.tif", [158]),
        ("classictiff_one_block_be_long.tif", [158]),
        ("classictiff_one_strip_long.tif", [146]),
        ("classictiff_one_strip_be_long.tif", [146]),
        ("classictiff_two_strip_short.tif", [162, 163]),
        ("classictiff_two_strip_be_short.tif", [162, 163]),
        ("classictiff_four_strip_short.tif", [178, 179, 180, 181]),
        ("classictiff_four_strip_be_short.tif", [178, 179, 180, 181]),
        ("bigtiff_four_strip_short.tif", [316, 317, 318, 319]),
        ("bigtiff_four_strip_be_short.tif", [316, 317, 318, 319]),
        ("bigtiff_one_block_long8.tif", [272]),
        ("bigtiff_one_block_be_long8.tif", [272]),
        ("bigtiff_one_strip_long.tif", [252]),
        ("bigtiff_one_strip_be_long.tif", [252]),
        ("bigtiff_one_strip_long8.tif", [252]),
        ("bigtiff_one_strip_be_long8.tif", [252]),
        ("bigtiff_two_strip_long.tif", [284, 285]),
        ("bigtiff_two_strip_be_long.tif", [284, 285]),
        ("bigtiff_two_strip_long8.tif", [284, 285]),
        ("bigtiff_two_strip_be_long8.tif", [284, 285]),
    ],
)
def test_stripoffset_tag_datatypes(name, expected_offsets):
    buf = _load(name)
    bo, big, off = tiff._read_header(buf)
    tags, _ = tiff._read_ifd(buf, bo, big, off)
    got = tags[324] if 324 in tags else tags[273]  # "one_block" files are tiled
    assert (got if isinstance(got, list) else [got]) == expected_offsets
    arr, _ = tiff.decode_full(buf)  # and the blocks decode
    assert arr.size > 0


@needs_ref
def test_byte_tif_georeferencing():
    # gcore/tiff_read & many utilities tests pin this geotransform + NAD27
    # UTM 11N for byte.tif
    _, info = tiff.decode_full(_load("byte.tif"))
    assert info["geotransform"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert info["epsg"] == 26711
    assert (info["w"], info["h"], info["bands"]) == (20, 20, 1)


@needs_ref
def test_unsupported_compressions_raise_loudly():
    for name in ["gtiff/byte_LERC.tif"]:
        if not os.path.exists(os.path.join(DATA, name)):
            continue
        with pytest.raises(NotImplementedError) as ei:
            tiff.decode(_load(name))
        assert "cluster" in str(ei.value) or "not supported" in str(ei.value)


@needs_ref
def test_lzma_zstd_autotest_fixtures_decode():
    # autotest/gcore/tiff_read.py pins byte-content parity with byte.tif
    # (checksum 4672) for every recompressed byte_*.tif variant
    from gdal_spark.raster.checksum import checksum_band

    for name, code in [("gtiff/byte_ZSTD.tif", 50000),
                       ("gtiff/byte_LZMA.tif", 34925)]:
        if not os.path.exists(os.path.join(DATA, name)):
            continue
        arr, info = tiff.decode_full(_load(name))
        assert info["compression"] == code
        assert checksum_band(arr) == 4672


# ---------------------------------------------------------------------------
# Encoder round-trips (self-consistency; decode side is externally pinned)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dt", ["u1", "u2", "i2", "u4", "i4", "u8", "f4", "f8"])
@pytest.mark.parametrize("comp", ["none", "deflate", "packbits"])
def test_roundtrip_dtypes(dt, comp):
    rng = np.random.default_rng(int.from_bytes(dt.encode(), "little"))
    arr = (rng.random((37, 53)) * 250).astype(np.dtype(dt))
    buf = tiff.encode_geotiff(
        arr,
        geotransform=(440720, 60, 0, 3751320, 0, -60),
        epsg=26711,
        block=(16, 16),
        compression=comp,
    )
    out, info = tiff.decode_full(buf)
    assert np.array_equal(out, arr)
    assert info["geotransform"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert info["epsg"] == 26711


@pytest.mark.parametrize("pred", [1, 2])
@pytest.mark.parametrize("big", [False, True])
def test_roundtrip_multiband_predictor_bigtiff(pred, big):
    rng = np.random.default_rng(11)
    arr = (rng.random((41, 29, 3)) * 255).astype(np.uint8)
    buf = tiff.encode_geotiff(
        arr, block=(16, 16), compression="deflate", predictor=pred, bigtiff=big
    )
    assert buf[:4] == (b"II+\x00" if big else b"II*\x00")
    out, _ = tiff.decode_full(buf)
    assert np.array_equal(out, arr)


def test_our_encoding_reproduces_reference_pixels():
    """Re-encode byte.tif through every writer config; checksum must stay 4672."""
    if not os.path.isdir(DATA):
        pytest.skip("reference fixtures not present")
    arr = tiff.decode(_load("byte.tif"))
    for comp in ["none", "deflate", "packbits"]:
        for pred in [1, 2]:
            buf = tiff.encode_geotiff(arr, block=(8, 8), compression=comp, predictor=pred)
            assert checksum_bands(np.atleast_3d(tiff.decode(buf)))[0] == 4672


def test_cog_structure_and_overviews():
    rng = np.random.default_rng(3)
    arr = (rng.random((211, 173)) * 255).astype(np.uint8)
    cog = tiff.encode_geotiff(
        arr,
        geotransform=(0, 1, 0, 0, 0, -1),
        epsg=3857,
        block=(64, 64),
        compression="deflate",
        overviews=3,
    )
    offs = tiff.ifd_offsets(cog)
    assert len(offs) == 4
    shapes = [tiff.decode_full(cog, k)[0].shape for k in range(4)]
    assert shapes == [(211, 173), (106, 87), (53, 44), (27, 22)]
    assert np.array_equal(tiff.decode_full(cog, 0)[0], arr)

    # COG layout contract: all IFDs precede all payloads; overview payloads
    # precede full-resolution payloads
    bo, big, _ = tiff._read_header(cog)

    def tile_offsets(o):
        t = tiff._read_ifd(cog, bo, big, o)[0][324]
        return t if isinstance(t, list) else [t]

    min_payload = min(min(tile_offsets(o)) for o in offs)
    assert max(offs) < min_payload
    assert min(tile_offsets(offs[0])) > max(tile_offsets(offs[-1]))

    # overview pixels = independent odd-edge-aware 2:1 average
    lvl1 = tiff.decode_full(cog, 1)[0]
    expect = np.zeros((106, 87))
    a = arr.astype(np.float64)
    for i in range(106):
        for j in range(87):
            expect[i, j] = a[2 * i : 2 * i + 2, 2 * j : 2 * j + 2].mean()
    assert np.array_equal(lvl1, np.round(expect).astype(np.uint8))


def test_codec_dispatch_handles_tiff():
    from gdal_spark.raster.codec import decode_image, encode_image

    rng = np.random.default_rng(5)
    arr = (rng.random((24, 31)) * 255).astype(np.uint8)
    assert np.array_equal(decode_image(encode_image(arr, "gtiff")), arr)


@needs_ref
def test_jpeg_in_tiff():
    """Compression 7 (new-style JPEG) with JPEGTables merging, decoded by
    the in-repo baseline JPEG codec: grayscale, RGB (untransformed
    components per PHOTOMETRIC_RGB), YCbCr-subsampled and separate-plane
    variants; fidelity vs the lossless twins (GDAL writes these at
    quality 75)."""
    from gdal_spark.raster.codec import psnr

    ref = tiff.decode(_load("byte.tif")).astype(np.float64)
    for name in ["gtiff/byte_JPEG.tif", "gtiff/byte_JPEG_tiled.tif"]:
        a = tiff.decode(_load(name)).astype(np.float64)
        assert a.shape == (20, 20)
        assert psnr(ref, a) > 28.0

    ref3 = tiff.decode(_load("rgbsmall.tif")).astype(np.float64)
    for name, floor in [
        ("gtiff/rgbsmall_JPEG.tif", 30.0),
        ("gtiff/rgbsmall_JPEG_tiled.tif", 30.0),
        ("gtiff/rgbsmall_JPEG_ycbcr.tif", 28.0),
        ("gtiff/rgbsmall_JPEG_separate.tif", 30.0),
        ("gtiff/rgbsmall_JPEG_tiled_separate.tif", 30.0),
    ]:
        if not os.path.exists(os.path.join(DATA, name)):
            continue
        a = tiff.decode(_load(name)).astype(np.float64)
        assert a.shape == (50, 50, 3), name
        assert psnr(ref3, a) > floor, name
