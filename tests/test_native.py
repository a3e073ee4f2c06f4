"""Native fast-path parity: the C kernels must be bit-identical to the
pure-NumPy fallbacks.

The contract (``gdal_spark/native/_csrc.py``): every kernel mirrors its
fallback's exact op sequence — integer-exact for the entropy walks and
bit packer, fixed-order IEEE-754 float64 for IDCT/color (compiled with
``-ffp-contract=off``). These tests run each codec both ways in
subprocesses (the probe caches per-process) and compare bytes/pixels
exactly over a corpus spanning sizes, subsampling modes, quality
levels, gray/RGB/RGBA, and restart intervals.
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from gdal_spark.native import get_lib

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="no C compiler available — fallback is the only path"
)

_WORKER = r"""
import pickle, sys
import numpy as np
from gdal_spark.raster import jpeg, webp
from gdal_spark.sources.synth import synth_pixels

out = {}
for iid, w, h, chan in pickle.load(open(sys.argv[1], "rb")):
    img = synth_pixels(iid, w, h)
    if chan == 1:
        img = img[:, :, 0]
    elif chan == 4:
        img = np.dstack([img, (img[:, :, 0] // 2 + 100).astype(np.uint8)])
    key = (iid, w, h, chan)
    if chan in (1, 3):
        for q, sub in ((85, "420"), (95, "444"), (40, "420")):
            buf = jpeg.encode(img, quality=q, subsampling=sub)
            out[key + ("jpeg", q, sub, "enc")] = buf
            out[key + ("jpeg", q, sub, "dec")] = jpeg.decode(buf)
    wb = webp.encode(img)
    out[key + ("webp", "enc")] = wb
    out[key + ("webp", "dec")] = webp.decode(wb)
pickle.dump(out, open(sys.argv[2], "wb"))
"""


def _run_corpus(tmp_path, native: bool):
    corpus = [
        ("img000000000001", 64, 128, 3),
        ("img000000000002", 128, 64, 3),
        ("img000000000003", 256, 512, 3),
        ("img000000000007", 251, 123, 3),  # non-multiple-of-16 dims
        ("img000000000009", 96, 96, 1),  # grayscale
        ("img000000000011", 80, 48, 4),  # RGBA (webp only)
    ]
    spec = tmp_path / f"spec_{native}.pkl"
    res = tmp_path / f"res_{native}.pkl"
    wk = tmp_path / f"worker_{native}.py"
    spec.write_bytes(pickle.dumps(corpus))
    wk.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        GDAL_SPARK_NATIVE="1" if native else "0",
        PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    subprocess.run(
        [sys.executable, str(wk), str(spec), str(res)],
        check=True,
        env=env,
        cwd=repo,
        timeout=600,
    )
    return pickle.loads(res.read_bytes())


def test_native_fallback_bit_parity(tmp_path):
    nat = _run_corpus(tmp_path, True)
    fb = _run_corpus(tmp_path, False)
    assert nat.keys() == fb.keys()
    for k in nat:
        a, b = nat[k], fb[k]
        if isinstance(a, bytes):
            assert a == b, f"encoded bytes differ for {k}"
        else:
            assert np.array_equal(a, b), f"decoded pixels differ for {k}"


def test_jpeg_restart_interval_native():
    """DRI segmentation exercises the per-segment C walk boundary."""
    from gdal_spark.raster import jpeg
    from gdal_spark.sources.synth import synth_pixels

    img = synth_pixels("img000000000055", 128, 96)
    plain = jpeg.encode(img, quality=85, subsampling="420")
    ref = jpeg.decode(plain)
    # re-encode with restart markers if the encoder supports it;
    # otherwise decode an existing DRI fixture from the test suite
    try:
        buf = jpeg.encode(img, quality=85, subsampling="420", restart_interval=2)
    except TypeError:
        pytest.skip("encoder has no restart_interval knob")
    got = jpeg.decode(buf)
    assert np.array_equal(got, ref)


def test_corrupt_stream_raises_not_crashes():
    """Malformed entropy data must surface as ValueError from the C
    walk (negative return codes), never a crash or OOB write."""
    from gdal_spark.raster import jpeg
    from gdal_spark.sources.synth import synth_pixels

    img = synth_pixels("img000000000021", 64, 64)
    buf = bytearray(jpeg.encode(img, quality=85, subsampling="444"))
    # truncate the scan hard
    with pytest.raises(ValueError):
        jpeg.decode(bytes(buf[: len(buf) // 2]) )
    # flip bytes mid-scan: either decodes (huffman resync is impossible,
    # but garbage-yet-valid codes exist) or raises ValueError — never
    # crashes
    import copy

    for off in range(len(buf) - 300, len(buf) - 280):
        mod = copy.copy(buf)
        mod[off] ^= 0x5A
        try:
            jpeg.decode(bytes(mod))
        except ValueError:
            pass


def test_native_cache_reuse(tmp_path):
    """Second probe in a fresh process loads the cached .so without
    recompiling (same content hash)."""
    import hashlib

    from gdal_spark.native import _cache_dir
    from gdal_spark.native._csrc import C_SOURCE

    tag = hashlib.sha256(C_SOURCE.encode()).hexdigest()[:16]
    so = os.path.join(_cache_dir(), f"fastcodec_{tag}.so")
    assert os.path.exists(so)
    mtime = os.path.getmtime(so)
    code = (
        "from gdal_spark.native import get_lib; import sys;"
        "sys.exit(0 if get_lib() is not None else 1)"
    )
    subprocess.run(
        [sys.executable, "-c", code],
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=120,
    )
    assert os.path.getmtime(so) == mtime  # not rebuilt
