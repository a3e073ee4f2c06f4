"""Progressive/baseline JPEG vs the REAL libjpeg (external oracle).

Compiles ``tools/jpeg_shim.c`` against the system libjpeg at test time
(the compile-the-reference device from tests/test_pmtiles.py) and
cross-validates both directions:

- libjpeg decodes OUR progressive and baseline streams (entropy coding
  must be spec-exact; remaining differences are IDCT/color rounding,
  bounded to a few codes);
- OUR decoder reads libjpeg's ``jpeg_simple_progression`` output — the
  true wild-file generator of SOF2 streams with multi-block EOB runs,
  successive approximation, and per-scan optimized Huffman tables.

Skips when gcc or jpeglib.h is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from gdal_spark.raster import jpeg

SRC = os.path.join(os.path.dirname(__file__), "..", "tools", "jpeg_shim.c")


@pytest.fixture(scope="module")
def shim():
    if shutil.which("gcc") is None or not os.path.exists("/usr/include/jpeglib.h"):
        pytest.skip("gcc or jpeglib.h unavailable")
    d = tempfile.mkdtemp(prefix="jshim_")
    so = os.path.join(d, "libjshim.so")
    r = subprocess.run(
        ["gcc", "-O2", "-shared", "-fPIC", SRC, "-o", so, "-ljpeg"],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"shim compile failed: {r.stderr[:200]}")
    lib = ctypes.CDLL(so)
    lib.jshim_decode.restype = ctypes.c_int
    lib.jshim_encode.restype = ctypes.c_int
    return lib


def _lj_decode(lib, buf: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    nc = ctypes.c_int()
    out = np.empty(1 << 24, dtype=np.uint8)
    rc = lib.jshim_decode(
        buf, len(buf), out.ctypes.data_as(ctypes.c_char_p), out.size,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(nc),
    )
    assert rc == 0, f"libjpeg decode rc={rc}"
    n = h.value * w.value * nc.value
    arr = out[:n].copy().reshape(h.value, w.value, nc.value)
    return arr[:, :, 0] if nc.value == 1 else arr


def _lj_encode(lib, arr: np.ndarray, quality: int, progressive: bool) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    nc = 1 if arr.ndim == 2 else arr.shape[2]
    h, w = arr.shape[:2]
    out = ctypes.POINTER(ctypes.c_ubyte)()
    ln = ctypes.c_ulong()
    rc = lib.jshim_encode(
        arr.ctypes.data_as(ctypes.c_char_p), w, h, nc, quality,
        1 if progressive else 0,
        ctypes.byref(out), ctypes.byref(ln),
    )
    assert rc == 0
    try:
        return ctypes.string_at(out, ln.value)
    finally:
        lib.jshim_free(out)


def _imgs():
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:64, 0:96]
    # non-wrapping gradients: chroma stays smooth, so nearest-neighbor
    # vs libjpeg's fancy bilinear chroma upsampling differ by a couple
    # of codes instead of half an edge step
    smooth = np.stack(
        [yy * 255 // 64, xx * 255 // 96, (yy + xx) * 255 // 160], -1
    ).astype(np.uint8)
    noisy = rng.integers(0, 255, (48, 56, 3), dtype=np.uint8)
    gray = ((yy * 3 + xx) % 256).astype(np.uint8)
    return [("smooth", smooth), ("noisy", noisy), ("gray", gray)]


def _close(theirs, ours, name, chroma_subsampled):
    """Tolerance compare: full-RGB for smooth/gray, luma-domain for
    noisy color under 4:2:0 (replicate vs fancy-bilinear chroma
    upsampling differs per pixel there; an entropy bug would still be
    structural garbage in luma)."""
    d = np.abs(theirs.astype(int) - ours.astype(int))
    if chroma_subsampled and name == "noisy" and theirs.ndim == 3:
        wy = np.array([0.299, 0.587, 0.114])
        ly = (theirs.astype(float) @ wy) - (ours.astype(float) @ wy)
        assert np.abs(ly).mean() < 1.5 and np.abs(ly).max() < 20, (
            name, np.abs(ly).max(), np.abs(ly).mean())
    else:
        assert d.max() <= 8 and d.mean() < 1.2, (name, d.max(), d.mean())


@pytest.mark.parametrize("sub", ["444", "420"])
def test_libjpeg_decodes_our_progressive(shim, sub):
    """Entropy coding must be spec-exact: the real decoder's pixels may
    differ from ours only by IDCT/color rounding (small bounded diff,
    never structural garbage)."""
    for name, arr in _imgs():
        kw = {} if arr.ndim == 2 else {"subsampling": sub}
        buf = jpeg.encode_progressive(arr, 90, **kw)
        theirs = _lj_decode(shim, buf)
        ours = jpeg.decode(buf)
        assert theirs.shape == ours.shape, name
        d = np.abs(theirs.astype(int) - ours.astype(int))
        # 4:2:0 noise content: replicate vs libjpeg's fancy-bilinear
        # chroma upsampling disagree per pixel, so compare in the LUMA
        # domain (unaffected by chroma upsampling) — an entropy bug
        # would still blow this up
        if sub == "420" and name == "noisy":
            wy = np.array([0.299, 0.587, 0.114])
            ly = (theirs.astype(float) @ wy) - (ours.astype(float) @ wy)
            assert np.abs(ly).mean() < 1.5 and np.abs(ly).max() < 20, (
                name, sub, np.abs(ly).max(), np.abs(ly).mean())
        else:
            assert d.max() <= 8 and d.mean() < 1.2, (
                name, sub, d.max(), d.mean())


def test_libjpeg_decodes_our_baseline(shim):
    for name, arr in _imgs():
        kw = {} if arr.ndim == 2 else {"subsampling": "444"}
        buf = jpeg.encode(arr, 90, **kw)
        theirs = _lj_decode(shim, buf)
        ours = jpeg.decode(buf)
        d = np.abs(theirs.astype(int) - ours.astype(int))
        assert d.max() <= 6 and d.mean() < 1.0, (name, d.max(), d.mean())


def test_our_decoder_reads_real_libjpeg_progressive(shim):
    """jpeg_simple_progression output: multi-block EOB runs, successive
    approximation, optimized per-scan tables — the wild-file shape.
    Our decode must agree with libjpeg's own decode of the same stream
    up to IDCT/color rounding."""
    for name, arr in _imgs():
        buf = _lj_encode(shim, arr, 85, progressive=True)
        assert b"\xff\xc2" in buf  # really SOF2
        ours = jpeg.decode(buf)
        theirs = _lj_decode(shim, buf)
        assert ours.shape == theirs.shape, name
        _close(theirs, ours, name, chroma_subsampled=True)  # libjpeg defaults to 4:2:0


def test_our_decoder_reads_real_libjpeg_baseline(shim):
    for name, arr in _imgs():
        buf = _lj_encode(shim, arr, 85, progressive=False)
        ours = jpeg.decode(buf)
        theirs = _lj_decode(shim, buf)
        _close(theirs, ours, name, chroma_subsampled=True)


# ---------------------------------------------------------------------------
# CMYK / YCCK (frmts/jpeg/jpgdataset.cpp:3582-3615 + 1808-1840)

_CMYK_FIXTURE = "/root/reference/autotest/gdrivers/data/jpeg/rgb_ntf_cmyk.jpg"


def _lj_encode_cmyk(lib, arr: np.ndarray, quality: int, ycck: bool) -> bytes:
    """4-component encode; mode 2 writes YCCK (Adobe transform 2)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    out = ctypes.POINTER(ctypes.c_ubyte)()
    ln = ctypes.c_ulong()
    rc = lib.jshim_encode(
        arr.ctypes.data_as(ctypes.c_char_p), w, h, 4, quality,
        2 if ycck else 0,
        ctypes.byref(out), ctypes.byref(ln),
    )
    assert rc == 0
    try:
        return ctypes.string_at(out, ln.value)
    finally:
        lib.jshim_free(out)


def _cmyk_smooth():
    yy, xx = np.mgrid[0:64, 0:96]
    return np.stack(
        [yy * 255 // 64, xx * 255 // 96, (yy + xx) * 255 // 160,
         255 - yy * 200 // 64],
        -1,
    ).astype(np.uint8)


def test_cmyk_collapse_matches_gdal_checksums(shim):
    """GDAL's autotest pins band checksums 20385/20865/19441 for
    rgb_ntf_cmyk.jpg read as RGB (autotest/gdrivers/jpeg.py::
    test_jpeg_8).  Applying our R=C*K/255 collapse to the REAL
    libjpeg's CMYK output must reproduce them exactly — pinning the
    collapse math itself; our own decode then differs only by IDCT
    rounding."""
    import os as _os

    from gdal_spark.raster.checksum import checksum_bands

    if not _os.path.exists(_CMYK_FIXTURE):
        pytest.skip("reference autotest data not present")
    data = open(_CMYK_FIXTURE, "rb").read()
    theirs = _lj_decode(shim, data)
    assert theirs.shape == (50, 50, 4)
    i32 = theirs.astype(np.int32)
    rgb = ((i32[..., :3] * i32[..., 3:4]) // 255).astype(np.uint8)
    assert checksum_bands(rgb) == [20385, 20865, 19441]
    # CMYK-as-is view pinned too (autotest test_jpeg_9, first 2 bands)
    cs4 = checksum_bands(theirs)
    assert cs4[0] == 21187 and cs4[1] == 21054
    # our full path: same collapse on planes within IDCT rounding
    ours = jpeg.decode(data)
    assert ours.shape == (50, 50, 3)
    d = np.abs(ours.astype(int) - rgb.astype(int))
    assert d.max() <= 2 and d.mean() < 0.1
    ours4 = jpeg.decode(data, cmyk_to_rgb=False)
    assert ours4.shape == (50, 50, 4)
    assert np.abs(ours4.astype(int) - theirs.astype(int)).max() <= 1


def test_our_decoder_reads_libjpeg_cmyk(shim):
    """Adobe transform 0: stored CMYK planes pass through."""
    arr = _cmyk_smooth()
    buf = _lj_encode_cmyk(shim, arr, 92, ycck=False)
    i = buf.find(b"Adobe")
    assert i >= 0 and buf[i + 11] == 0
    ours = jpeg.decode(buf, cmyk_to_rgb=False)
    theirs = _lj_decode(shim, buf)
    assert ours.shape == theirs.shape == arr.shape
    d = np.abs(ours.astype(int) - theirs.astype(int))
    assert d.max() <= 2 and d.mean() < 0.1


def test_our_decoder_reads_libjpeg_ycck(shim):
    """Adobe transform 2: YCbCr-inverted-then-complemented planes
    (libjpeg ycck_cmyk_convert) with K untouched; smooth content keeps
    the replicate-vs-fancy chroma upsampling difference to a few
    codes."""
    arr = _cmyk_smooth()
    buf = _lj_encode_cmyk(shim, arr, 92, ycck=True)
    i = buf.find(b"Adobe")
    assert i >= 0 and buf[i + 11] == 2
    ours = jpeg.decode(buf, cmyk_to_rgb=False)
    theirs = _lj_decode(shim, buf)
    assert ours.shape == theirs.shape == arr.shape
    d = np.abs(ours.astype(int) - theirs.astype(int))
    assert d.max() <= 8 and d.mean() < 1.2
    # K plane is never chroma-subsampled: exact to IDCT rounding
    assert d[..., 3].max() <= 1
    # and the RGB collapse agrees with collapsing libjpeg's planes
    t32 = theirs.astype(np.int32)
    rgb_ref = ((t32[..., :3] * t32[..., 3:4]) // 255).astype(np.uint8)
    rgb_ours = jpeg.decode(buf)
    dd = np.abs(rgb_ours.astype(int) - rgb_ref.astype(int))
    assert dd.max() <= 8 and dd.mean() < 1.2
