"""Capability-probed libzstd binding — the cluster codec library.

The reference's GTiff driver compresses with ZSTD through libzstd
(``frmts/gtiff/libtiff/tif_zstd.c``, COMPRESSION_ZSTD = 50000).  Same
posture as ``native/webp_lib.py``: probe the shared library once via
ctypes, cache, and degrade to a documented ``NotImplementedError``
naming the library when absent.  Only the stable simple API is used
(``ZSTD_compress`` / ``ZSTD_decompress`` / ``ZSTD_compressBound``),
which exists in every libzstd >= 1.0.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_CACHE: list = []


def get_libzstd():
    """The loaded library or None (probe once, cached)."""
    if _CACHE:
        return _CACHE[0]
    lib = None
    names = ["libzstd.so.1", "libzstd.so", "libzstd.dylib"]
    found = ctypes.util.find_library("zstd")
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
            sz = ctypes.c_size_t
            lib.ZSTD_compressBound.restype = sz
            lib.ZSTD_compressBound.argtypes = [sz]
            lib.ZSTD_compress.restype = sz
            lib.ZSTD_compress.argtypes = [
                ctypes.c_char_p, sz, ctypes.c_char_p, sz, ctypes.c_int,
            ]
            lib.ZSTD_decompress.restype = sz
            lib.ZSTD_decompress.argtypes = [
                ctypes.c_char_p, sz, ctypes.c_char_p, sz,
            ]
            lib.ZSTD_isError.restype = ctypes.c_uint
            lib.ZSTD_isError.argtypes = [sz]
        except AttributeError:
            lib = None
    _CACHE.append(lib)
    return lib


def available() -> bool:
    return get_libzstd() is not None


def _require():
    lib = get_libzstd()
    if lib is None:
        raise NotImplementedError(
            "ZSTD requires libzstd (the cluster codec library; "
            "reference frmts/gtiff/libtiff/tif_zstd.c) — not on this host"
        )
    return lib


def compress(data: bytes, level: int = 9) -> bytes:
    """One-shot ZSTD_compress at the given level (tif_zstd default 9)."""
    lib = _require()
    data = bytes(data)
    bound = lib.ZSTD_compressBound(len(data))
    out = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(out, bound, data, len(data), int(level))
    if lib.ZSTD_isError(n):
        raise ValueError("ZSTD_compress failed")
    return out.raw[:n]


def decompress(data: bytes, out_len: int) -> bytes:
    """One-shot ZSTD_decompress into a caller-sized buffer."""
    lib = _require()
    data = bytes(data)
    out = ctypes.create_string_buffer(out_len)
    n = lib.ZSTD_decompress(out, out_len, data, len(data))
    if lib.ZSTD_isError(n):
        raise ValueError("ZSTD_decompress failed (corrupt stream?)")
    return out.raw[:n]
