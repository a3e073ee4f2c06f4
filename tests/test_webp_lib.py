"""libwebp binding (native/webp_lib.py) — the cluster codec library as
wild-file fallback AND as an external oracle for the in-repo VP8L
codec pair.

External pins: the reference autotest's lossy fixture
(``autotest/gdrivers/webp.py`` test_webp_2: rgbsmall.webp band-1
checksum in {21464, 21450, 21459}, libwebp-version dependent) decodes
to one of GDAL's accepted checksums through our dispatch.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.native.webp_lib import decode_rgba, encode_rgb, get_libwebp
from gdal_spark.raster import webp

needs_lib = pytest.mark.skipif(
    get_libwebp() is None, reason="libwebp not available"
)
REF = "/root/reference/autotest/gdrivers/data/webp"


def _cart(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy // 8) % 4 * 60, (xx // 16) % 3 * 80, ((yy + xx) // 12) % 5 * 50],
        -1,
    ).astype(np.uint8)


@needs_lib
@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data absent")
def test_lossy_vp8_autotest_checksum():
    from gdal_spark.raster.checksum import checksum_band

    buf = open(f"{REF}/rgbsmall.webp", "rb").read()
    arr = webp.decode(buf)  # dispatches to the library for VP8
    assert arr.shape == (50, 50, 3)
    assert checksum_band(arr[:, :, 0]) in (21464, 21450, 21459)


@needs_lib
def test_libwebp_decodes_our_vp8l_streams_exactly():
    """THE external oracle for the hand-rolled VP8L encoder: the real
    decoder must reproduce the pixels from every stream shape we emit
    — literals, LZ77 with 2-D plane codes, 1-D distances, color cache.
    This empirically pins the 120-entry distance table and the cache
    hash against libwebp itself."""
    cart = _cart()
    streams = [
        webp.encode(cart),
        webp.encode_lz77(cart, cache_bits=8, use_plane_codes=True),
        webp.encode_lz77(cart, cache_bits=4, use_plane_codes=False),
        webp.encode_lz77(cart, cache_bits=0),
    ]
    for buf in streams:
        out = decode_rgba(buf)
        assert (out[:, :, :3] == cart).all()
        assert (out[:, :, 3] == 255).all()
    # noise content (literal-heavy) too
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 255, (31, 29, 3), dtype=np.uint8)
    assert (decode_rgba(webp.encode_lz77(noise))[:, :, :3] == noise).all()


@needs_lib
def test_our_decoder_matches_libwebp_on_our_streams():
    cart = _cart()
    buf = webp.encode_lz77(cart, cache_bits=8)
    ours = webp.decode(buf)
    theirs = decode_rgba(buf)[:, :, :3]
    assert (ours == theirs).all()


@needs_lib
def test_transform_streams_fall_back_to_library():
    cart = _cart()
    lls = encode_rgb(cart, lossless=True)  # libwebp applies transforms
    out = webp.decode(lls)  # pure-NumPy subset raises → library path
    assert (out == cart).all()


@needs_lib
def test_lossy_roundtrip_psnr():
    from gdal_spark.raster.codec import psnr

    yy, xx = np.mgrid[0:128, 0:256]
    g = np.stack(
        [(yy * 255 // 128), (xx * 255 // 256), ((yy + xx) * 255 // 384)], -1
    ).astype(np.uint8)
    blob = encode_rgb(g, 95.0)
    out = webp.decode(blob)
    assert out.shape == g.shape
    assert psnr(g, out) >= 40.0


@needs_lib
def test_encode_rejects_bad_shapes():
    with pytest.raises(ValueError):
        encode_rgb(np.zeros((4, 4), np.uint8))
