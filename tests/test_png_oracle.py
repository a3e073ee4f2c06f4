"""PNG encoder conformance vs the REAL libpng (external oracle).

Compiles ``tools/png_shim.c`` at test time; the system libpng must
reproduce the exact pixels from every stream the in-repo encoder
emits (all filter choices, gray and RGB) — lossless, so bit-equality.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from gdal_spark.raster import codec

SRC = os.path.join(os.path.dirname(__file__), "..", "tools", "png_shim.c")


@pytest.fixture(scope="module")
def shim():
    if shutil.which("gcc") is None or not os.path.exists("/usr/include/png.h"):
        pytest.skip("gcc or png.h unavailable")
    d = tempfile.mkdtemp(prefix="pshim_")
    so = os.path.join(d, "libpshim.so")
    r = subprocess.run(
        ["gcc", "-O2", "-shared", "-fPIC", SRC, "-o", so, "-lpng"],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"shim compile failed: {r.stderr[:200]}")
    lib = ctypes.CDLL(so)
    lib.pshim_decode.restype = ctypes.c_int
    return lib


def _lp_decode(lib, buf: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    nc = ctypes.c_int()
    out = np.empty(1 << 24, dtype=np.uint8)
    rc = lib.pshim_decode(
        buf, len(buf), out.ctypes.data_as(ctypes.c_char_p), out.size,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(nc),
    )
    assert rc == 0, f"libpng decode rc={rc}"
    n = h.value * w.value * nc.value
    arr = out[:n].copy().reshape(h.value, w.value, nc.value)
    return arr[:, :, 0] if nc.value == 1 else arr


def test_libpng_reads_our_encodes_exactly(shim):
    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:40, 0:56]
    cases = [
        rng.integers(0, 255, (33, 47, 3), dtype=np.uint8),
        rng.integers(0, 255, (21, 17), dtype=np.uint8),
        ((yy * 4 + xx) % 256).astype(np.uint8),  # gradient → filter-heavy
        np.full((16, 16, 3), 128, np.uint8),
    ]
    for arr in cases:
        for level in (1, 6):
            buf = codec.png_encode(arr, compress_level=level)
            got = _lp_decode(shim, buf)
            assert got.shape == arr.shape
            assert (got == arr).all()


def test_libpng_reads_synth_fixture_bytes(shim):
    from gdal_spark.sources.synth import synth_pixels

    arr = synth_pixels("img000000000042", 128, 64)
    buf = codec.encode_image(arr, "png", 1)
    got = _lp_decode(shim, buf)
    assert (got == arr).all()
