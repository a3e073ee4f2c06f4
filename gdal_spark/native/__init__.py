"""Optional native (C) fast path for the bit-serial codec loops.

Capability-probed, never required: at first use the C source in
``_csrc.py`` is compiled with whatever ``cc``/``gcc`` the host has
into a content-hashed shared object under a per-user cache dir and
loaded via ``ctypes``. Any failure — no compiler, read-only disk,
exotic platform — silently yields ``None`` and the callers keep
using their pure-NumPy fallbacks, which remain the oracle
(``tests/test_native.py`` pins bit-identical output both ways).

Executor-process semantics: every Python worker process probes
independently; the content-hashed filename plus write-to-temp +
``os.replace`` (atomic on POSIX) makes concurrent compiles across
the 32+ workers of a node race-free — losers overwrite with an
identical file or just load the winner's.

Set ``GDAL_SPARK_NATIVE=0`` to force the fallbacks (used by the
parity tests and available as an operational kill switch).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

from gdal_spark.native._csrc import C_SOURCE

_PROBED = False
_LIB: ctypes.CDLL | None = None


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(base, "gdal_spark")
    try:
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:
        return tempfile.gettempdir()


def _compile() -> ctypes.CDLL | None:
    tag = hashlib.sha256(C_SOURCE.encode()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"fastcodec_{tag}.so")
    if not os.path.exists(so_path):
        cc = os.environ.get("CC") or "cc"
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "fastcodec.c")
            tmp_so = os.path.join(td, "fastcodec.so")
            with open(src, "w") as f:
                f.write(C_SOURCE)
            # -ffp-contract=off: no FMA contraction — the IDCT/color
            # kernels' FP op sequence must match the NumPy fallbacks
            # bit-for-bit (see _csrc.py jpeg_idct_plane contract)
            subprocess.run(
                [cc, "-O2", "-ffp-contract=off", "-shared", "-fPIC",
                 "-o", tmp_so, src, "-lm"],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp_so, so_path)
    lib = ctypes.CDLL(so_path)
    p = ctypes.c_void_p
    l = ctypes.c_long
    lib.jpeg_walk.restype = l
    lib.jpeg_walk.argtypes = [p, l, p, p, l, l, l, l, p, p]
    lib.vp8l_literals.restype = l
    lib.vp8l_literals.argtypes = [
        p, l, l,
        p, p, l,
        p, p, l,
        p, p, l,
        p, p, l,
        l, p,
    ]
    lib.lsb_pack.restype = None
    lib.lsb_pack.argtypes = [p, p, l, p]
    lib.jpeg_idct_plane.restype = None
    lib.jpeg_idct_plane.argtypes = [p, p, p, p, l, l, p]
    lib.jpeg_color.restype = None
    lib.jpeg_color.argtypes = [
        p, l, l, l,
        p, l, l, l,
        p, l, l, l,
        l, l, p,
    ]
    return lib


def get_lib() -> ctypes.CDLL | None:
    """The compiled kernel library, or ``None`` when unavailable."""
    global _PROBED, _LIB
    if _PROBED:
        return _LIB
    _PROBED = True
    if os.environ.get("GDAL_SPARK_NATIVE", "1") == "0":
        _LIB = None
        return None
    try:
        _LIB = _compile()
    except Exception:  # no cc, sandboxed fs, unsupported platform, ...
        _LIB = None
        if os.environ.get("GDAL_SPARK_NATIVE_DEBUG"):
            import traceback

            traceback.print_exc(file=sys.stderr)
    return _LIB
