"""Capability-probed liblz4 binding — the cluster codec library.

Zarr v2 stores compressed with numcodecs' LZ4 codec frame chunks as a
4-byte little-endian original-size prefix followed by one LZ4 block
(``numcodecs/lz4.pyx``); GDAL's Zarr driver reads them through
liblz4 (``frmts/zarr/zarr_v2_array.cpp``).  Same posture as
``native/zstd_lib.py``: probe once via ctypes, cache, degrade to a
documented ``NotImplementedError`` naming the library when absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

_CACHE: list = []


def get_liblz4():
    """The loaded library or None (probe once, cached)."""
    if _CACHE:
        return _CACHE[0]
    lib = None
    names = ["liblz4.so.1", "liblz4.so", "liblz4.dylib"]
    found = ctypes.util.find_library("lz4")
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
            ci = ctypes.c_int
            lib.LZ4_compressBound.restype = ci
            lib.LZ4_compressBound.argtypes = [ci]
            lib.LZ4_compress_default.restype = ci
            lib.LZ4_compress_default.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ci, ci]
            lib.LZ4_decompress_safe.restype = ci
            lib.LZ4_decompress_safe.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ci, ci]
        except AttributeError:
            lib = None
    _CACHE.append(lib)
    return lib


def available() -> bool:
    return get_liblz4() is not None


def _require():
    lib = get_liblz4()
    if lib is None:
        raise NotImplementedError(
            "LZ4 requires liblz4 (the cluster codec library; reference "
            "frmts/zarr reads numcodecs LZ4 chunks through it) — not on "
            "this host"
        )
    return lib


def compress_frame(data: bytes) -> bytes:
    """numcodecs LZ4 frame: <u4 original size, then one LZ4 block."""
    lib = _require()
    data = bytes(data)
    bound = lib.LZ4_compressBound(len(data))
    out = ctypes.create_string_buffer(bound)
    n = lib.LZ4_compress_default(data, out, len(data), bound)
    if n <= 0:
        raise ValueError("LZ4_compress_default failed")
    return struct.pack("<I", len(data)) + out.raw[:n]


def decompress_frame(data: bytes) -> bytes:
    """Inverse of :func:`compress_frame`."""
    lib = _require()
    data = bytes(data)
    (size,) = struct.unpack_from("<I", data, 0)
    out = ctypes.create_string_buffer(size) if size else b""
    if size:
        n = lib.LZ4_decompress_safe(data[4:], out, len(data) - 4, size)
        if n != size:
            raise ValueError("LZ4_decompress_safe failed (corrupt chunk?)")
        return out.raw
    return b""
