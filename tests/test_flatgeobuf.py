"""FlatGeobuf source/sink tests.

Reference surface: ``ogr/ogrsf_frmts/flatgeobuf/`` (driver +
``packedrtree.h:120``). The Hilbert oracle below is an independent
longhand implementation of the textbook xy2d algorithm — NOT the
codec's bit-twiddling routine — so the curve is pinned to public
knowledge, the way the MVT tests pin the spec's worked examples.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gdal_spark.functions import geometry as G
from gdal_spark.sources import flatgeobuf as FGB


# ---------------------------------------------------------------------------
# Hilbert curve vs an independent textbook implementation
# ---------------------------------------------------------------------------


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_textbook_xy2d():
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 65536, 300).astype(np.uint32)
    ys = rng.integers(0, 65536, 300).astype(np.uint32)
    got = FGB.hilbert_u16(xs, ys)
    for x, y, g in zip(xs, ys, got):
        assert int(g) == _xy2d(65536, int(x), int(y))
    for (x, y), want in [((0, 0), 0), ((1, 0), 1), ((0, 1), 3)]:
        assert int(FGB.hilbert_u16(np.array([x]), np.array([y]))[0]) == want


# ---------------------------------------------------------------------------
# FlatBuffers wire format invariants
# ---------------------------------------------------------------------------


def test_fb_builder_roundtrip_table():
    fb = FGB._FB()
    s = fb.string("hello")
    v = fb.vector_scalars(np.arange(4, dtype="<f8").tobytes(), 4, 8)
    fb.start_table(4)
    fb.slot_offset(0, s)
    fb.slot_scalar(1, "<B", 7, 1, default=0)
    fb.slot_offset(3, v)
    root = fb.end_table()
    buf = fb.finish(root)
    tpos = FGB._fb_indirect(buf, 0)
    assert FGB._fb_string(buf, tpos, 0) == "hello"
    assert FGB._fb_scalar(buf, tpos, 1, "<B", 0) == 7
    assert FGB._fb_field(buf, tpos, 2) is None  # absent slot
    start, n = FGB._fb_vector(buf, tpos, 3)
    assert n == 4
    arr = np.frombuffer(buf, dtype="<f8", count=4, offset=start)
    assert (arr == np.arange(4)).all()
    # default-suppressed scalar reads back as default
    assert FGB._fb_scalar(buf, tpos, 2, "<B", 99) == 99


def test_fb_alignment():
    fb = FGB._FB()
    v = fb.vector_scalars(np.arange(3, dtype="<f8").tobytes(), 3, 8)
    fb.start_table(1)
    fb.slot_offset(0, v)
    buf = fb.finish(fb.end_table())
    tpos = FGB._fb_indirect(buf, 0)
    start, _ = FGB._fb_vector(buf, tpos, 0)
    assert start % 8 == 0  # f64 vector data 8-aligned


# ---------------------------------------------------------------------------
# Packed R-tree
# ---------------------------------------------------------------------------


def test_rtree_level_bounds_and_size():
    # mirrors PackedRTree::generateLevelBounds for 179 items, node 16
    b = FGB._level_bounds(179, 16)
    # leaves last: 179 leaves, then 12, then 1 (root first in storage)
    assert b[0][1] - b[0][0] == 179
    assert b[1][1] - b[1][0] == 12
    assert b[2] == (0, 1)
    assert FGB._rtree_size(179, 16) == (179 + 12 + 1) * 40


def test_rtree_search_exact():
    rng = np.random.default_rng(3)
    n = 300
    xs = rng.uniform(0, 100, n)
    ys = rng.uniform(0, 50, n)
    boxes = np.stack([xs, ys, xs, ys], axis=1)
    offsets = np.arange(n, dtype=np.uint64) * 100
    tree = FGB._build_rtree(boxes, offsets, 16)
    q = (20.0, 10.0, 60.0, 30.0)
    hits = FGB._rtree_search(tree, n, 16, q)
    got = sorted(h[1] for h in hits)
    want = sorted(
        int(i) for i in range(n)
        if q[0] <= xs[i] <= q[2] and q[1] <= ys[i] <= q[3]
    )
    assert got == want
    # offsets round-trip through the leaf nodes
    for off, idx in hits:
        assert off == idx * 100


# ---------------------------------------------------------------------------
# file-level round trips
# ---------------------------------------------------------------------------


def _mk_points(spark, n=150):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(n):
        x, y = float(rng.uniform(-50, 50)), float(rng.uniform(-30, 30))
        rows.append((G.wkb_point(x, y), i, f"p{i}", x + y, i % 3 == 0))
    return rows, spark.createDataFrame(
        rows, "geom binary, k long, name string, v double, flag boolean"
    )


def test_fgb_point_roundtrip(spark, tmp_path):
    rows, df = _mk_points(spark)
    path = str(tmp_path / "pts.fgb")
    info = FGB.write_fgb(df, path, geometry_type=FGB.GT_POINT)
    assert info["n"] == len(rows)
    with open(path, "rb") as f:
        assert f.read(8) == FGB.MAGIC
    back = {r.k: r for r in FGB.read_fgb(spark, path).collect()}
    assert len(back) == len(rows)
    for wkb, k, name, v, flag in rows:
        r = back[k]
        g0, g1 = G.parse_wkb(bytes(wkb)), G.parse_wkb(bytes(r.geom))
        assert (g0.coords[0] == g1.coords[0]).all()  # bit-exact doubles
        assert (r.name, r.flag) == (name, flag) and r.v == v


def test_fgb_bbox_read_prunes(spark, tmp_path):
    rows, df = _mk_points(spark)
    path = str(tmp_path / "pts.fgb")
    FGB.write_fgb(df, path, geometry_type=FGB.GT_POINT)
    box = (0.0, 0.0, 50.0, 30.0)
    got = {r.k for r in FGB.read_fgb(spark, path, bbox=box).collect()}
    want = set()
    for wkb, k, *_ in rows:
        x, y = G.parse_wkb(bytes(wkb)).coords[0][0]
        if box[0] <= x <= box[2] and box[1] <= y <= box[3]:
            want.add(k)
    assert want <= got  # R-tree may over-approximate, never miss
    assert got == want  # points: bbox == geometry, so exact here


def test_fgb_polygon_and_multipolygon(spark, tmp_path):
    sq = np.array([[0.0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])
    hole = np.array([[1.0, 1], [1, 2], [2, 2], [2, 1], [1, 1]])
    poly = G.wkb_polygon([sq, hole])
    mp = G.wkb_multipolygon([[sq + 10], [sq + 20, hole + 20]])
    line = G.wkb_linestring(np.array([[0.0, 0], [1, 2], [3, 5]]))
    df = spark.createDataFrame(
        [(poly, 1), (mp, 2), (line, 3)], "geom binary, k long"
    )
    path = str(tmp_path / "mixed.fgb")
    FGB.write_fgb(df, path)
    back = {r.k: G.parse_wkb(bytes(r.geom)) for r in FGB.read_fgb(spark, path).collect()}
    assert back[1].gtype == 3 and len(back[1].rings) == 2
    assert abs(G.geom_area(back[1]) - (16 - 1)) < 1e-12
    assert back[2].gtype == 6 and len(back[2].rings) == 3
    assert abs(G.geom_area(back[2]) - (16 + 15)) < 1e-12
    assert back[3].gtype == 2 and (back[3].coords[0][2] == [3, 5]).all()


def test_fgb_null_attrs_and_geometry(spark, tmp_path):
    df = spark.createDataFrame(
        [(G.wkb_point(1.0, 2.0), None, "a"), (G.wkb_point(3.0, 4.0), 7, None)],
        "geom binary, k long, name string",
    )
    path = str(tmp_path / "nulls.fgb")
    FGB.write_fgb(df, path)
    got = sorted(
        FGB.read_fgb(spark, path).collect(), key=lambda r: r.name or "z"
    )
    assert got[0].k is None and got[0].name == "a"
    assert got[1].k == 7 and got[1].name is None


def test_fgb_hilbert_descending_order(spark, tmp_path):
    """Features must land in descending-Hilbert order (packedrtree.cpp
    hilbertSort uses ha > hb)."""
    rows, df = _mk_points(spark, n=60)
    path = str(tmp_path / "order.fgb")
    FGB.write_fgb(df, path, geometry_type=FGB.GT_POINT)
    h = FGB.read_fgb_header(path)
    got = FGB.read_fgb(spark, path).collect()
    ext = h["envelope"]
    byfid = sorted(got, key=lambda r: r.fid)
    hv = []
    for r in byfid:
        x, y = G.parse_wkb(bytes(r.geom)).coords[0][0]
        hv.append(
            int(
                FGB.hilbert_bbox(
                    np.array([x]), np.array([y]), np.array([x]), np.array([y]),
                    tuple(ext),
                )[0]
            )
        )
    assert hv == sorted(hv, reverse=True)


def test_fgb_header_fields(spark, tmp_path):
    _, df = _mk_points(spark, n=20)
    path = str(tmp_path / "hdr.fgb")
    FGB.write_fgb(df, path, name="mylayer", geometry_type=FGB.GT_POINT)
    h = FGB.read_fgb_header(path)
    assert h["name"] == "mylayer"
    assert h["geometry_type"] == FGB.GT_POINT
    assert h["features_count"] == 20
    assert h["index_node_size"] == 16
    assert [c for c, _ in h["columns"]] == ["k", "name", "v", "flag"]
    assert [t for _, t in h["columns"]] == [
        FGB.CT_LONG, FGB.CT_STRING, FGB.CT_DOUBLE, FGB.CT_BOOL
    ]


def test_fgb_empty_raises(spark, tmp_path):
    df = spark.createDataFrame([], "geom binary, k long")
    with pytest.raises(ValueError, match="no features"):
        FGB.write_fgb(df, str(tmp_path / "e.fgb"))


def test_fgb_bad_magic(tmp_path):
    p = tmp_path / "bad.fgb"
    p.write_bytes(b"nope" * 10)
    with pytest.raises(ValueError, match="magic"):
        FGB.read_fgb_header(str(p))
