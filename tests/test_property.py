"""Property-based tests (hypothesis) for the pure kernels that
everything else leans on: the slab-difference decomposition, the WKB
codec, MVT protobuf primitives, and the snap/reverse geometry ops.

These complement the example-based suites: hypothesis explores the
degenerate corners (zero-area boxes, touching edges, negative deltas,
single-vertex parts) that hand-written fixtures miss.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.functions import geometry as G
from gdal_spark.operators.layer_algebra import _slab_subtract
from gdal_spark.sources import mvt

# keep CI wall-time bounded; these kernels are microseconds per case
_FAST = settings(max_examples=200, deadline=None)


def _scalar_slab(X0, Y0, X1, Y1, boxes):
    """The original reference scan (kept verbatim as the oracle)."""
    xs = sorted({X0, X1, *(b[0] for b in boxes), *(b[2] for b in boxes)})
    out = []
    for sa, sb in zip(xs[:-1], xs[1:]):
        ivals = sorted((b[1], b[3]) for b in boxes if b[0] <= sa and b[2] >= sb)
        cur = Y0
        for a, bb in ivals:
            if a > cur:
                out.append((sa, cur, sb, a))
            cur = max(cur, bb)
        if cur < Y1:
            out.append((sa, cur, sb, Y1))
    return out


_coord = st.floats(
    min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False
)


@st.composite
def _boxes_in_rect(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    boxes = []
    for _ in range(n):
        x0 = draw(st.floats(min_value=0.0, max_value=9.0))
        y0 = draw(st.floats(min_value=0.0, max_value=7.0))
        w = draw(st.floats(min_value=0.0, max_value=10.0))
        h = draw(st.floats(min_value=0.0, max_value=8.0))
        cx0, cy0 = max(x0, 0.0), max(y0, 0.0)
        cx1, cy1 = min(x0 + w, 10.0), min(y0 + h, 8.0)
        if cx0 < cx1 and cy0 < cy1:  # clip_boxes only feeds strict overlaps
            boxes.append((cx0, cy0, cx1, cy1))
    return boxes


@given(_boxes_in_rect())
@_FAST
def test_slab_subtract_matches_scalar_scan(boxes):
    got = sorted(_slab_subtract(0.0, 0.0, 10.0, 8.0, boxes))
    exp = sorted(_scalar_slab(0.0, 0.0, 10.0, 8.0, boxes))
    assert got == exp  # bit-identical piece set


@given(
    st.lists(st.tuples(_coord, _coord), min_size=2, max_size=30),
)
@_FAST
def test_wkb_linestring_roundtrip(pts):
    arr = np.array(pts, dtype=np.float64)
    g = G.parse_wkb(G.wkb_linestring(arr))
    assert np.array_equal(g.coords[0], arr)


@given(
    st.lists(st.tuples(_coord, _coord, _coord), min_size=2, max_size=12),
)
@_FAST
def test_wkb_linestring_z_roundtrip(pts):
    arr = np.array(pts, dtype=np.float64)
    g = G.parse_wkb(G.wkb_linestring(arr))
    assert g.has_z
    assert np.array_equal(g.full[0], arr)


@given(st.integers(min_value=0, max_value=(1 << 63) - 1))
@_FAST
def test_varint_roundtrip(n):
    buf = mvt._varint(n)
    out, i = mvt._read_varint(buf, 0)
    assert out == n and i == len(buf)


@given(st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1))
@_FAST
def test_zigzag_roundtrip(n):
    assert mvt._unzigzag(mvt._zigzag(n)) == n


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-5000, max_value=9000),
            st.integers(min_value=-5000, max_value=9000),
        ),
        min_size=2,
        max_size=20,
    )
)
@_FAST
def test_mvt_linestring_commands_roundtrip(pts):
    arr = np.array(pts, dtype=np.int64)
    back = mvt.decode_geometry(
        mvt.encode_geometry([arr], mvt.LINESTRING), mvt.LINESTRING
    )
    assert np.array_equal(back[0], arr)


# ---------------------------------------------------------------------------
# round-5 codecs: GIF LZW, BMP RLE-free paths, EXIF build/parse


@given(
    st.integers(2, 40), st.integers(2, 40), st.integers(1, 8),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_gif_lzw_roundtrip(w, h, nbits_pal, seed):
    """Any index grid over any palette size survives GIF encode →
    decode exactly (LZW width growth, dictionary reset, interlace
    off)."""
    from gdal_spark.raster import gif

    rng = np.random.default_rng(seed)
    n = 1 << max(1, min(nbits_pal, 8))
    idx = rng.integers(0, n, (h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    g = gif.decode_indices(gif.encode(idx, pal))
    assert np.array_equal(g.index, idx)
    assert np.array_equal(g.palette[:n], pal)


@given(st.integers(1, 50), st.integers(1, 50), st.integers(0, 2**32 - 1),
       st.booleans())
@settings(max_examples=25, deadline=None)
def test_bmp_roundtrip_property(w, h, seed, rgb):
    from gdal_spark.raster import bmp

    rng = np.random.default_rng(seed)
    if rgb:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(bmp.decode(bmp.encode(arr)), arr)
    else:
        idx = rng.integers(0, 256, (h, w), dtype=np.uint8)
        g = bmp.decode_full(bmp.encode(idx))
        assert np.array_equal(g.index, idx)


@given(
    st.integers(1, 8),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0, max_size=40,
    ),
    st.integers(1, 10**6), st.integers(1, 10**6),
)
@settings(max_examples=30, deadline=None)
def test_exif_build_parse_property(orientation, make, num, den):
    """Arbitrary ASCII/short/rational tags survive the APP1 build →
    parse loop with GDAL string formatting."""
    from gdal_spark.raster import exif as E

    md = {
        "EXIF_Make": make,
        "EXIF_Orientation": orientation,
        "EXIF_ExposureTime": (num, den),
    }
    jpeg = b"\xff\xd8" + E.build_exif_app1(md) + b"\xff\xd9"
    out = E.parse_exif(jpeg)
    assert out["EXIF_Orientation"] == str(orientation)
    # EXIFPrintData strips trailing spaces/NULs from ASCII
    assert out["EXIF_Make"] == make.rstrip(" ")
    assert out["EXIF_ExposureTime"] == "(%g)" % (num / den)
    raw = E.parse_exif_raw(jpeg)
    assert raw["EXIF_ExposureTime"][1][0] == (num, den)


@given(st.integers(1, 16), st.integers(1, 16), st.integers(0, 2**32 - 1),
       st.sampled_from([1, 2, 4]))
@settings(max_examples=25, deadline=None)
def test_png_low_depth_property(w, h, seed, depth):
    """Hand-packed low-depth PNGs decode to the exact sample grid for
    every width (row-end bit padding)."""
    from tests.test_png_full import _build_png

    from gdal_spark.raster import codec

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << depth, (h, w))
    a = codec.png_decode(_build_png(w, h, depth, 0, vals))
    assert np.array_equal(a, vals.astype(np.uint8))
