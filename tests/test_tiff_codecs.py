"""LZMA(34925) / ZSTD(50000) / WebP-in-TIFF(50001) codecs against the
system libtiff as external oracle (the same library GDAL's GTiff
driver links; ``frmts/gtiff/libtiff/tif_lzma.c``, ``tif_zstd.c``,
``tif_webp.c``).

Both directions are pinned via ctypes, no headers needed:

* **we write → libtiff reads**: ``TIFFOpen``/``TIFFReadTile`` over the
  in-repo encoder's tiled output must reproduce every pixel;
* **libtiff writes → we read**: ``TIFFSetField``/``TIFFWriteEncodedStrip``
  produce a stripped file per codec that ``tiff.decode`` must match.

Skips cleanly when libtiff is absent or a codec isn't configured in
the host build (``TIFFIsCODECConfigured``).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from gdal_spark.raster import tiff


def _libtiff():
    names = ["libtiff.so.6", "libtiff.so.5", "libtiff.so"]
    found = ctypes.util.find_library("tiff")
    if found:
        names.insert(0, found)
    for n in names:
        try:
            lib = ctypes.CDLL(n)
            lib.TIFFOpen.restype = ctypes.c_void_p
            lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.TIFFReadTile.restype = ctypes.c_ssize_t
            lib.TIFFReadEncodedStrip.restype = ctypes.c_ssize_t
            lib.TIFFWriteEncodedStrip.restype = ctypes.c_ssize_t
            lib.TIFFIsCODECConfigured.restype = ctypes.c_int
            return lib
        except OSError:
            continue
    return None


LIB = _libtiff()

# TIFF tag ids used below
TW, TL, BPS, COMP, PHOTO, SPP, RPS, PLANAR, SFMT, PRED = (
    256, 257, 258, 259, 262, 277, 278, 284, 339, 317)


def _needs(code):
    return pytest.mark.skipif(
        LIB is None or not LIB.TIFFIsCODECConfigured(code),
        reason=f"libtiff codec {code} unavailable",
    )


def _read_with_libtiff(path: str, h, w, spp, itemsize, bw, bh):
    """Read a tiled file tile-by-tile via TIFFReadTile."""
    tif = LIB.TIFFOpen(path.encode(), b"r")
    assert tif, "libtiff failed to open our file"
    tif = ctypes.c_void_p(tif)
    out = np.zeros((h, w, spp), dtype=np.uint8 if itemsize == 1 else np.uint16)
    tsz = bw * bh * spp * itemsize
    buf = ctypes.create_string_buffer(tsz)
    for y0 in range(0, h, bh):
        for x0 in range(0, w, bw):
            n = LIB.TIFFReadTile(
                tif, buf, ctypes.c_uint32(x0), ctypes.c_uint32(y0),
                ctypes.c_uint32(0), ctypes.c_uint16(0))
            assert n > 0, f"TIFFReadTile failed at {x0},{y0}"
            t = np.frombuffer(buf.raw, dtype=out.dtype).reshape(bh, bw, spp)
            ys, xs = min(bh, h - y0), min(bw, w - x0)
            out[y0:y0 + ys, x0:x0 + xs] = t[:ys, :xs]
    LIB.TIFFClose(tif)
    return out[:, :, 0] if spp == 1 else out


def _write_with_libtiff(path: str, arr: np.ndarray, comp_code: int,
                        predictor: int = 1):
    """Write a stripped file via TIFFWriteEncodedStrip (varargs SetField)."""
    a = arr if arr.ndim == 3 else arr[:, :, None]
    h, w, spp = a.shape
    tif = ctypes.c_void_p(LIB.TIFFOpen(path.encode(), b"w"))
    assert tif
    sf = LIB.TIFFSetField
    sf(tif, ctypes.c_uint32(TW), ctypes.c_int(w))
    sf(tif, ctypes.c_uint32(TL), ctypes.c_int(h))
    sf(tif, ctypes.c_uint32(BPS), ctypes.c_int(a.dtype.itemsize * 8))
    sf(tif, ctypes.c_uint32(SPP), ctypes.c_int(spp))
    sf(tif, ctypes.c_uint32(PHOTO), ctypes.c_int(2 if spp >= 3 else 1))
    sf(tif, ctypes.c_uint32(PLANAR), ctypes.c_int(1))
    sf(tif, ctypes.c_uint32(COMP), ctypes.c_int(comp_code))
    if comp_code == 50001:
        sf(tif, ctypes.c_uint32(65569), ctypes.c_int(1))  # WEBP_LOSSLESS
    sf(tif, ctypes.c_uint32(SFMT), ctypes.c_int(1))
    rows = 16
    sf(tif, ctypes.c_uint32(RPS), ctypes.c_int(rows))
    if predictor != 1:
        sf(tif, ctypes.c_uint32(PRED), ctypes.c_int(predictor))
    le = a.astype(a.dtype.newbyteorder("<"))
    strip = 0
    for y0 in range(0, h, rows):
        chunk = np.ascontiguousarray(le[y0:y0 + rows]).tobytes()
        n = LIB.TIFFWriteEncodedStrip(
            tif, ctypes.c_uint32(strip), chunk, ctypes.c_ssize_t(len(chunk)))
        assert n > 0, f"TIFFWriteEncodedStrip failed (strip {strip})"
        strip += 1
    LIB.TIFFClose(tif)


def _rgb(h=70, w=90):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(3 * yy + 5 * xx) % 256, (yy * xx) % 256, (7 * yy + xx // 2) % 256],
        -1,
    ).astype(np.uint8)


# --- we write, libtiff reads -----------------------------------------------


@pytest.mark.parametrize("comp,code", [
    ("lzma", 34925), ("zstd", 50000), ("webp", 50001), ("lzw", 5)])
def test_libtiff_reads_our_encoding(tmp_path, comp, code):
    if LIB is None or not LIB.TIFFIsCODECConfigured(code):
        pytest.skip(f"libtiff codec {code} unavailable")
    rgb = _rgb()
    buf = tiff.encode_geotiff(rgb, block=(64, 64), compression=comp)
    p = tmp_path / f"{comp}.tif"
    p.write_bytes(buf)
    got = _read_with_libtiff(str(p), 70, 90, 3, 1, 64, 64)
    assert np.array_equal(got, rgb)


@pytest.mark.parametrize("comp,code", [
    ("lzma", 34925), ("zstd", 50000), ("lzw", 5)])
def test_libtiff_reads_our_u16_predictor2(tmp_path, comp, code):
    if LIB is None or not LIB.TIFFIsCODECConfigured(code):
        pytest.skip(f"libtiff codec {code} unavailable")
    u16 = ((np.mgrid[0:70, 0:90][0] * 697 + 13) % 65536).astype(np.uint16)
    buf = tiff.encode_geotiff(u16, block=(64, 64), compression=comp,
                              predictor=2)
    p = tmp_path / f"{comp}16.tif"
    p.write_bytes(buf)
    got = _read_with_libtiff(str(p), 70, 90, 1, 2, 64, 64)
    assert np.array_equal(got, u16)


# --- libtiff writes, we read ------------------------------------------------


@pytest.mark.parametrize("code", [34925, 50000, 50001, 5])
def test_we_read_libtiff_encoding(tmp_path, code):
    if LIB is None or not LIB.TIFFIsCODECConfigured(code):
        pytest.skip(f"libtiff codec {code} unavailable")
    rgb = _rgb()
    p = tmp_path / f"lt{code}.tif"
    _write_with_libtiff(str(p), rgb, code)
    arr, info = tiff.decode_full(p.read_bytes())
    assert info["compression"] == code
    assert np.array_equal(arr, rgb)


@pytest.mark.parametrize("code", [34925, 50000])
def test_we_read_libtiff_u16_predictor2(tmp_path, code):
    if LIB is None or not LIB.TIFFIsCODECConfigured(code):
        pytest.skip(f"libtiff codec {code} unavailable")
    u16 = ((np.mgrid[0:41, 0:53][1] * 911 + 5) % 65536).astype(np.uint16)
    p = tmp_path / f"lt{code}p2.tif"
    _write_with_libtiff(str(p), u16, code, predictor=2)
    arr, _ = tiff.decode_full(p.read_bytes())
    assert np.array_equal(arr, u16)


# --- pure in-repo roundtrips (always run) ------------------------------------


def test_lzma_roundtrip_no_lib():
    rgb = _rgb(33, 47)
    buf = tiff.encode_geotiff(rgb, block=(32, 32), compression="lzma")
    arr, info = tiff.decode_full(buf)
    assert info["compression"] == 34925
    assert np.array_equal(arr, rgb)


def test_lzw_roundtrip_wide_codes():
    # enough distinct 2-grams to push code width through 10/11/12 bits
    # and force a table reset at 4094 — the early-change edge both ways
    rng = np.random.default_rng(3)
    arr = (rng.integers(0, 40, (300, 400)) * 6).astype(np.uint8)
    for pred in (1, 2):
        buf = tiff.encode_geotiff(arr, block=(256, 256),
                                  compression="lzw", predictor=pred)
        out, info = tiff.decode_full(buf)
        assert info["compression"] == 5
        assert np.array_equal(out, arr)


def test_webp_rgba_roundtrip():
    rng = np.random.default_rng(11)
    rgba = rng.integers(0, 256, (50, 60, 4)).astype(np.uint8)
    buf = tiff.encode_geotiff(rgba, block=(32, 32), compression="webp")
    arr, _ = tiff.decode_full(buf)
    assert np.array_equal(arr, rgba)


def test_webp_encoder_guards():
    with pytest.raises(ValueError):
        tiff.encode_geotiff(np.zeros((8, 8), np.uint8), compression="webp")
    with pytest.raises(ValueError):
        tiff.encode_geotiff(np.zeros((8, 8, 3), np.uint8),
                            compression="webp", predictor=2)
