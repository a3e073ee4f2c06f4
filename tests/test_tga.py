"""TGA codec vs the reference's published oracle values.

Every assertion below pins a value published in
``autotest/gdrivers/tga.py`` (GDAL band checksums, metadata strings,
color-table entries) over the shipped ``autotest/gdrivers/data/tga``
fixtures — an oracle fully independent of this repo's kernels.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster import tga
from gdal_spark.raster.checksum import checksum_band

DATA = "/root/reference/autotest/gdrivers/data/tga"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference autotest data absent")


def _load(name):
    return open(os.path.join(DATA, name), "rb").read()


@needs_ref
def test_rle_grey_level_and_footer_metadata():
    g = tga.decode_full(_load("ref_test_suite/cbw8.tga"))
    assert (g.bands, g.w, g.h) == (1, 128, 128)
    assert g.metadata["AUTHOR_NAME"] == "Ricky True"
    assert g.metadata["COMMENTS"] == (
        "Sample 8 bit run length compressed black and white image")
    assert g.metadata["IMAGE_ID"] == "Truevision(R) Sample Image"
    assert g.palette is None
    assert checksum_band(g.index) == 43089


@needs_ref
@pytest.mark.parametrize("name", ["ref_test_suite/ccm8.tga",
                                  "ref_test_suite/ucm8.tga"])
def test_color_table(name):
    g = tga.decode_full(_load(name))
    assert g.palette is not None and len(g.palette) == 256
    assert g.palette[0].tolist() == [0, 0, 0, 255]
    assert g.palette[1].tolist() == [8, 8, 8, 255]
    assert g.palette[64].tolist() == [248, 0, 0, 255]
    assert checksum_band(g.index) == 38151


@needs_ref
@pytest.mark.parametrize("name,want", [
    ("ref_test_suite/ctc24.tga", (9797, 9952, 9848)),
    ("ref_test_suite/utc24.tga", (9797, 9952, 9848)),
    ("ref_test_suite/utc16.tga", (64747, 64839, 64796)),
])
def test_true_color(name, want):
    g = tga.decode_full(_load(name))
    assert g.bands == 3
    assert tuple(checksum_band(g.pixels[..., i]) for i in range(3)) == want


@needs_ref
def test_uncompressed_grey():
    g = tga.decode_full(_load("ref_test_suite/ubw8.tga"))
    assert checksum_band(g.index) == 43089


@needs_ref
def test_32bit_attr_type_2_fourth_not_alpha():
    g = tga.decode_full(_load("ref_test_suite/utc32.tga"))
    assert g.bands == 4 and g.alpha is False
    assert [checksum_band(g.pixels[..., i]) for i in range(4)] == [
        9797, 9952, 9848, 0]


@needs_ref
def test_32bit_alpha():
    g = tga.decode_full(_load("stefan_full_rgba.tga"))
    assert (g.w, g.h, g.bands, g.alpha) == (162, 150, 4, True)
    assert [checksum_band(g.pixels[..., i]) for i in range(4)] == [
        12603, 58561, 36064, 10807]


@needs_ref
def test_rle_runs_crossing_scanlines():
    g = tga.decode_full(_load("from_ffmpeg_samples/test1g.tga"))
    assert checksum_band(g.index) == 13077


@needs_ref
def test_rle_24bit_ffmpeg_sample():
    g = tga.decode_full(_load("from_ffmpeg_samples/TEST24rle.tga"))
    assert g.pixels is not None and g.pixels.shape[2] >= 3


# --- writer round-trips -------------------------------------------------------


@pytest.mark.parametrize("rle", [False, True])
def test_roundtrip_gray(rle):
    rng = np.random.default_rng(5)
    a = (rng.integers(0, 5, (60, 77)) * 50).astype(np.uint8)
    g = tga.decode_full(tga.encode(a, rle=rle))
    assert np.array_equal(g.index, a)


@pytest.mark.parametrize("rle", [False, True])
def test_roundtrip_rgb_rgba(rle):
    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
    g = tga.decode_full(tga.encode(rgb, rle=rle))
    assert np.array_equal(g.pixels, rgb)
    rgba = rng.integers(0, 256, (33, 47, 4)).astype(np.uint8)
    g = tga.decode_full(tga.encode(rgba, rle=rle, image_id="xyz"))
    assert np.array_equal(g.pixels, rgba)
    assert g.metadata["IMAGE_ID"] == "xyz"
    assert g.alpha is True


def test_rle_run_crossing_rows_roundtrip():
    # one long constant run spanning many rows exercises cross-scanline
    # packets in the writer AND reader
    a = np.full((40, 100), 7, np.uint8)
    a[20, 50] = 9
    buf = tga.encode(a, rle=True)
    assert len(buf) < 200  # actually RLE-compressed
    assert np.array_equal(tga.decode_full(buf).index, a)
