"""ST_Polygonize face extraction (operators/polygonize_lines.py).

Cases mirror GEOS Polygonizer semantics the reference exposes through
``OGRGeometry::Polygonize`` (``ogr/ogr_geometry.h:602``): adjacent
faces over shared edges, nested components become holes, dangles and
cut lines drop, unbounded faces never pollute output.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions import geometry as G
from gdal_spark.operators.polygonize_lines import (
    polygonize_group,
    polygonize_rings,
    st_polygonize,
)


def box_lines(x0, y0, x1, y1):
    return [
        np.array([[x0, y0], [x1, y0]], dtype=float),
        np.array([[x1, y0], [x1, y1]], dtype=float),
        np.array([[x1, y1], [x0, y1]], dtype=float),
        np.array([[x0, y1], [x0, y0]], dtype=float),
    ]


def areas(polys):
    return sorted(
        round(sum(G.ring_signed_area(r) for r in p), 9) for p in polys
    )


def test_single_ring_from_one_linestring():
    polys = polygonize_rings([np.array([[0.0, 0], [4, 0], [2, 3], [0, 0]])])
    assert areas(polys) == [6.0]
    assert len(polys[0]) == 1  # no hole


def test_adjacent_squares_share_an_edge():
    polys = polygonize_rings(box_lines(0, 0, 1, 1) + box_lines(1, 0, 2, 1))
    assert areas(polys) == [1.0, 1.0]


def test_noded_split_box():
    lines = [
        np.array([[0.0, 0], [1, 0]]), np.array([[1.0, 0], [2, 0]]),
        np.array([[2.0, 0], [2, 1]]), np.array([[2.0, 1], [1, 1]]),
        np.array([[1.0, 1], [0, 1]]), np.array([[0.0, 1], [0, 0]]),
        np.array([[1.0, 0], [1, 1]]),
    ]
    assert areas(polygonize_rings(lines)) == [1.0, 1.0]


def test_nested_component_becomes_hole():
    polys = polygonize_rings(box_lines(0, 0, 4, 4) + box_lines(1, 1, 2, 2))
    a = areas(polys)
    assert a == [1.0, 15.0]  # inner square + outer-with-hole
    big = max(polys, key=lambda p: abs(G.ring_signed_area(p[0])))
    assert len(big) == 2  # shell + hole


def test_three_level_nesting():
    polys = polygonize_rings(
        box_lines(0, 0, 10, 10) + box_lines(2, 2, 8, 8) + box_lines(4, 4, 5, 5)
    )
    assert areas(polys) == [1.0, 35.0, 64.0]


def test_dangles_and_cut_lines_dropped():
    dangle = [np.array([[2.0, 1], [3, 2]])]
    cut = [np.array([[0.5, 0.5], [1.5, 0.5]])]  # not noded into the box;
    polys = polygonize_rings(box_lines(0, 0, 2, 1) + dangle)
    assert areas(polys) == [2.0]
    polys = polygonize_rings(dangle + cut)
    assert polys == []


def test_duplicate_segments_dedup():
    polys = polygonize_rings(box_lines(0, 0, 1, 1) + box_lines(0, 0, 1, 1))
    assert areas(polys) == [1.0]


def test_polygonize_group_wkb():
    wkbs = polygonize_group(box_lines(0, 0, 3, 2))
    assert len(wkbs) == 1
    g = G.parse_wkb(wkbs[0])
    assert g.gtype == G.WKB_POLYGON
    assert G.geom_area(g) == pytest.approx(6.0)


def test_st_polygonize_spark(spark):
    rows = []
    for grp, (x0, y0) in enumerate([(0, 0), (10, 0), (20, 5)]):
        # noded 2x1 box + vertical splitter → two unit faces
        segs = [
            [[x0, y0], [x0 + 1, y0]], [[x0 + 1, y0], [x0 + 2, y0]],
            [[x0 + 2, y0], [x0 + 2, y0 + 1]],
            [[x0 + 2, y0 + 1], [x0 + 1, y0 + 1]],
            [[x0 + 1, y0 + 1], [x0, y0 + 1]],
            [[x0, y0 + 1], [x0, y0]],
            [[x0 + 1, y0], [x0 + 1, y0 + 1]],
        ]
        for s in segs:
            rows.append((grp, G.wkb_linestring(np.array(s, dtype=float))))
    df = spark.createDataFrame(rows, "grp long, geom binary")
    out = st_polygonize(df, "grp").collect()
    assert len(out) == 6  # 2 faces per group
    import collections

    per = collections.Counter(r.grp for r in out)
    assert all(per[g] == 2 for g in range(3))
    assert all(abs(r.area - 1.0) < 1e-12 for r in out)
