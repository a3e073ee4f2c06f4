"""Capability-probed libwebp binding — the cluster codec library.

The reference decodes WebP through libwebp (``frmts/webp/
webpdataset.cpp:1210``); every raise in ``raster/webp.py`` names this
library as the swap-in. The container ships ``libwebp.so.7``, so the
probe usually succeeds — and on any real cluster node it always will.

Roles:
- **wild-file fallback**: lossy VP8, VP8X-wrapped files, and VP8L
  features outside the pure-NumPy decoder's subset (transforms, meta
  prefix images) decode through ``WebPDecodeRGBA``;
- **external oracle**: the real decoder cross-checks the in-repo VP8L
  encoder/decoder pair byte-for-byte (tests/test_webp_lib.py) — in
  particular it empirically pins the 120-entry distance plane-code
  table and the color-cache hash;
- **lossy encode**: ``WebPEncodeRGB`` produces real VP8 streams for
  the PSNR>=40 lossy invariant (BASELINE per-row rule) on the same
  footing as the JPEG codec.

Same posture as ``native/_csrc.py`` (gcc + ctypes): probe once, cache,
degrade to the documented NotImplementedError when absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_CACHE: list = []


def get_libwebp():
    """The loaded library or None (probe once, cached)."""
    if _CACHE:
        return _CACHE[0]
    lib = None
    names = ["libwebp.so.7", "libwebp.so", "libwebp.dylib"]
    found = ctypes.util.find_library("webp")
    if found:
        names.insert(0, found)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is not None:
        try:
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPGetInfo.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPDecodeRGBA.restype = u8p
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            lib.WebPEncodeRGB.restype = ctypes.c_size_t
            lib.WebPEncodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
            ]
            lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p),
            ]
        except AttributeError:
            lib = None
    _CACHE.append(lib)
    return lib


def decode_rgba(buf: bytes) -> np.ndarray:
    """Any WebP (lossy VP8, VP8L, VP8X) → (h, w, 4) uint8."""
    lib = get_libwebp()
    if lib is None:
        raise NotImplementedError("libwebp not available on this host")
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(buf, len(buf), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp could not decode the stream")
    try:
        n = w.value * h.value * 4
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return arr.reshape(h.value, w.value, 4)


def encode_rgb(arr: np.ndarray, quality: float = 90.0, lossless: bool = False) -> bytes:
    """(h, w, 3) uint8 → WebP bytes (lossy VP8 or lossless VP8L)."""
    lib = get_libwebp()
    if lib is None:
        raise NotImplementedError("libwebp not available on this host")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_rgb expects (h, w, 3)")
    h, w = arr.shape[:2]
    out = ctypes.c_void_p()
    data = arr.tobytes()
    if lossless:
        size = lib.WebPEncodeLosslessRGB(data, w, h, w * 3, ctypes.byref(out))
    else:
        size = lib.WebPEncodeRGB(data, w, h, w * 3, quality, ctypes.byref(out))
    if not size or not out.value:
        raise ValueError("libwebp encode failed")
    try:
        buf = ctypes.string_at(out, size)
    finally:
        lib.WebPFree(out)
    return buf
