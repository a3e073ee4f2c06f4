"""OGRLayer::Update + layer-algebra method options (round 4,
VERDICT r03 item 5). Reference: ``ogr/ogrsf_frmts/ogrsf_frmts.h:
331-352``, impl ``ogrlayer.cpp:5711+``, options ``:5404-5410``;
tests ``autotest/pyscripts/test_ogr_layer_algebra.py``.

Invariant battery for the multi-box erase (the part a pairwise
identity can't express): area conservation against an independent
rasterized-coverage oracle, piece disjointness, and full coverage.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.layer_algebra import (
    _slab_subtract,
    identity_boxes,
    update_boxes,
)


def _grid_area(X0, Y0, X1, Y1, boxes, n=400):
    """Independent oracle: Monte-Carlo-free midpoint-grid measure of
    rect minus union(boxes)."""
    xs = X0 + (np.arange(n) + 0.5) * (X1 - X0) / n
    ys = Y0 + (np.arange(n) + 0.5) * (Y1 - Y0) / n
    gx, gy = np.meshgrid(xs, ys)
    covered = np.zeros_like(gx, dtype=bool)
    for bx0, by0, bx1, by1 in boxes:
        covered |= (gx > bx0) & (gx < bx1) & (gy > by0) & (gy < by1)
    cell = (X1 - X0) / n * (Y1 - Y0) / n
    return float((~covered).sum() * cell)


def test_slab_subtract_invariants():
    rng = np.random.default_rng(42)
    for _ in range(50):
        X0, Y0 = 0.0, 0.0
        X1, Y1 = 10.0, 8.0
        k = rng.integers(0, 6)
        boxes = []
        for _ in range(k):
            x0, y0 = rng.uniform(-2, 9, 2)
            w, h = rng.uniform(0.5, 6, 2)
            # pre-clip to the rect like clip_boxes' greatest/least does
            cx0, cy0 = max(x0, X0), max(y0, Y0)
            cx1, cy1 = min(x0 + w, X1), min(y0 + h, Y1)
            if cx0 < cx1 and cy0 < cy1:
                boxes.append((cx0, cy0, cx1, cy1))
        pieces = _slab_subtract(X0, Y0, X1, Y1, boxes)
        # pieces are inside the rect, positive area, pairwise disjoint
        area = 0.0
        for i, (a, b, c, d) in enumerate(pieces):
            assert X0 <= a < c <= X1 and Y0 <= b < d <= Y1
            area += (c - a) * (d - b)
            for a2, b2, c2, d2 in pieces[i + 1 :]:
                assert not (a < c2 and a2 < c and b < d2 and b2 < d), "overlap"
        expect = _grid_area(X0, Y0, X1, Y1, boxes)
        assert abs(area - expect) < 0.05 * max(expect, 1e-9) + 0.05
        # no piece overlaps any erased box
        for a, b, c, d in pieces:
            for bx0, by0, bx1, by1 in boxes:
                assert not (a < bx1 and bx0 < c and b < by1 and by0 < d)


def test_slab_subtract_full_cover_and_untouched():
    assert _slab_subtract(0, 0, 4, 4, [(0, 0, 4, 4)]) == []
    assert _slab_subtract(0, 0, 4, 4, []) == [(0, 0, 4, 4)]


@pytest.fixture(scope="module")
def tiny(spark):
    left = spark.createDataFrame(
        [
            ("f1", 0.0, 0.0, 10.0, 10.0),  # hit by two overlapping boxes
            ("f2", 20.0, 0.0, 24.0, 4.0),  # untouched
            ("f3", 40.0, 0.0, 42.0, 2.0),  # fully covered -> vanishes
        ],
        "fid string, lon_min double, lat_min double, lon_max double, lat_max double",
    )
    method = spark.createDataFrame(
        [
            ("m1", 2.0, 2.0, 6.0, 12.0),
            ("m2", 4.0, -1.0, 8.0, 6.0),
            ("m3", 39.0, -1.0, 43.0, 3.0),
        ],
        "mid string, lon_min double, lat_min double, lon_max double, lat_max double",
    )
    return left, method


def test_update_boxes_semantics(spark, tiny):
    left, method = tiny
    out = update_boxes(left, method, key="fid").collect()
    by_fid = {}
    for r in out:
        by_fid.setdefault(r.fid, []).append(r)
    # untouched passes through unchanged
    assert [r.part for r in by_fid["f2"]] == ["orig"]
    assert (by_fid["f2"][0].px0, by_fid["f2"][0].py1) == (20.0, 4.0)
    # fully covered vanishes
    assert "f3" not in by_fid
    # multi-box erase: remaining area == 100 - area(union(m1,m2) ∩ f1)
    # union area inside f1: m1 clip (2,2,6,10)=32, m2 clip (4,0,8,6)=24,
    # overlap (4,2,6,6)=8 -> 48 covered, 52 remain
    pieces = [r for r in by_fid["f1"] if r.part == "diff"]
    area = sum((r.px1 - r.px0) * (r.py1 - r.py0) for r in pieces)
    assert abs(area - 52.0) < 1e-9
    for i, r in enumerate(pieces):
        for r2 in pieces[i + 1 :]:
            assert not (
                r.px0 < r2.px1 and r2.px0 < r.px1 and r.py0 < r2.py1 and r2.py0 < r.py1
            )


def test_update_then_union_is_full_ogr_update(spark, tiny):
    """OGR Update output = erased input + method layer: schema-merged
    union keeps both layers' fields (NULL-padded)."""
    from gdal_spark.operators.layer_algebra import union_layers

    left, method = tiny
    up = update_boxes(left, method, key="fid")
    full = union_layers(up, method)
    rows = full.collect()
    assert any(r.mid == "m1" for r in rows if r.mid is not None)
    assert any(r.fid == "f2" for r in rows if r.fid is not None)


def test_identity_keep_lower_dims(spark):
    left = spark.createDataFrame(
        [("a", 0.0, 0.0, 2.0, 2.0)],
        "fid string, lon_min double, lat_min double, lon_max double, lat_max double",
    )
    # method touches left along x=2 (degenerate intersection line)
    method = spark.createDataFrame(
        [("m", 2.0, 0.0, 4.0, 2.0)],
        "mid string, lon_min double, lat_min double, lon_max double, lat_max double",
    )
    strict = identity_boxes(left, method).collect()
    assert strict == []  # touches contribute nothing by default
    kept = identity_boxes(left, method, keep_lower_dims=True).collect()
    parts = sorted(r.part for r in kept)
    assert parts == ["diff", "int"]
    line = [r for r in kept if r.part == "int"][0]
    assert line.px0 == line.px1 == 2.0  # zero-width: a line
    whole = [r for r in kept if r.part == "diff"][0]
    assert (whole.px0, whole.py0, whole.px1, whole.py1) == (0.0, 0.0, 2.0, 2.0)


def test_identity_promote_to_multi(spark):
    left = spark.createDataFrame(
        [("a", 0.0, 0.0, 4.0, 4.0)],
        "fid string, lon_min double, lat_min double, lon_max double, lat_max double",
    )
    method = spark.createDataFrame(
        [("m", 1.0, 1.0, 3.0, 3.0)],
        "mid string, lon_min double, lat_min double, lon_max double, lat_max double",
    )
    flat = identity_boxes(left, method).collect()
    multi = identity_boxes(left, method, promote_to_multi=True).collect()
    assert len(multi) == 1
    assert len(multi[0].pieces) == len(flat) == 5  # 1 int + 4 strips
    assert sorted(p.part for p in multi[0].pieces) == sorted(r.part for r in flat)


def test_symdifference_boxes(spark, tiny):
    """SymDifference area identity: Σ pieces(both sides) =
    area(A) + area(B) − 2·area(A∩B) for the hand fixture (all
    'orig' + 'diff' rectangles are disjoint within their side)."""
    from gdal_spark.operators.layer_algebra import symdifference_boxes

    left, method = tiny
    out = symdifference_boxes(
        left, method, a_key="fid", b_key="mid"
    ).collect()
    a_rows = [r for r in out if r.side == "a"]
    b_rows = [r for r in out if r.side == "b"]
    area = lambda rows: sum((r.px1 - r.px0) * (r.py1 - r.py0) for r in rows)
    # A = 100 + 16 + 4 = 120; covered-in-A = 48 (f1) + 4 (f3) = 52
    assert abs(area(a_rows) - (120.0 - 52.0)) < 1e-9
    # B = 40 + 28 + 16 = 84; covered-in-B: m1∩f1 (2,2,6,10)=32,
    # m2∩f1 (4,0,8,6)=24, overlap-within-f1 double count removed via
    # slab union per method feature: m1 minus {f1∩m1} = 40-32=8,
    # m2 minus {f1∩m2} = 28-24=4, m3 minus {f3∩m3}=16-4=12
    assert abs(area(b_rows) - (8.0 + 4.0 + 12.0)) < 1e-9
    # untouched features pass through as part='orig'
    assert any(r.part == "orig" and r.fid == "f2" for r in a_rows)
    # both directions label sides and NULL-pad the other schema
    assert all(r.mid is None for r in a_rows)
    assert all(r.fid is None for r in b_rows)
