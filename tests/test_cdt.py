"""Constrained Delaunay triangulation — operators/cdt.py.

Reference surface: ``OGRGeometry::ConstrainedDelaunayTriangulation``
(ogr/ogr_geometry.h:605, GEOS ConstrainedDelaunayTriangulator).
Pins: Euler triangle count (n + 2h - 2 for a polygon with n boundary
vertices and h holes), exact area preservation, every constraint edge
present in the output, holes excluded, and multipolygon WKB shape.
"""

import numpy as np
import pytest

from gdal_spark.functions import geometry as G
from gdal_spark.operators.cdt import (
    constrained_delaunay,
    polygon_cdt,
    st_constrained_delaunay,
)


def _tri_area_sum(tris):
    return sum(abs(G.ring_signed_area(t)) for t in tris)


def _edges_of_rings(tris):
    out = set()
    for r in tris:
        for i in range(len(r) - 1):
            a = (float(r[i][0]), float(r[i][1]))
            b = (float(r[i + 1][0]), float(r[i + 1][1]))
            out.add((a, b) if a < b else (b, a))
    return out


def test_rectangle_two_triangles():
    rect = G.wkb_polygon(
        [np.array([[0, 0], [4, 0], [4, 3], [0, 3], [0, 0]], dtype=float)]
    )
    tris = polygon_cdt(G.parse_wkb(rect))
    assert len(tris) == 2
    assert _tri_area_sum(tris) == pytest.approx(12.0)


def test_holed_rectangle_euler_count_and_area():
    outer = np.array([[0, 0], [8, 0], [8, 6], [0, 6], [0, 0]], dtype=float)
    hole = np.array([[3, 2], [3, 4], [5, 4], [5, 2], [3, 2]], dtype=float)
    g = G.parse_wkb(G.wkb_polygon([outer, hole]))
    tris = polygon_cdt(g)
    # n=8 vertices, h=1 hole -> n + 2h - 2 = 8 triangles
    assert len(tris) == 8
    assert _tri_area_sum(tris) == pytest.approx(48.0 - 4.0)
    # no triangle centroid inside the hole
    for t in tris:
        cx, cy = t[:3, 0].mean(), t[:3, 1].mean()
        assert not (3 < cx < 5 and 2 < cy < 4)


def test_concave_l_shape_constraints_present():
    L = np.array(
        [[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]],
        dtype=float,
    )
    g = G.parse_wkb(G.wkb_polygon([L]))
    tris = polygon_cdt(g)
    assert len(tris) == 4  # n=6, h=0 -> 4
    assert _tri_area_sum(tris) == pytest.approx(12.0)
    edges = _edges_of_rings(tris)
    for i in range(len(L) - 1):
        a = (float(L[i][0]), float(L[i][1]))
        b = (float(L[i + 1][0]), float(L[i + 1][1]))
        assert ((a, b) if a < b else (b, a)) in edges


def test_constraint_forced_through_delaunay():
    # a "bowtie-prone" quad whose unconstrained Delaunay prefers the
    # other diagonal: force the long diagonal as a constraint.
    pts = np.array([[0, 0], [10, 0], [10, 1], [0, 1]], dtype=float)
    # unconstrained picks short diagonals; constrain (0,0)-(10,1)
    tris = constrained_delaunay(pts, [(0, 2)])
    assert any(0 in t and 2 in t for t in tris)
    assert len(tris) == 2


def test_spiky_concave_polygon_area():
    # star-like concave outline: area must survive exactly
    ang = np.linspace(0.0, 2 * np.pi, 11)[:-1]
    rad = np.where(np.arange(10) % 2 == 0, 5.0, 2.0)
    ring = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
    ring = np.vstack([ring, ring[:1]])
    if G.ring_signed_area(ring) < 0:
        ring = ring[::-1]
    g = G.parse_wkb(G.wkb_polygon([ring]))
    tris = polygon_cdt(g)
    assert len(tris) == 8  # n=10, h=0
    assert _tri_area_sum(tris) == pytest.approx(abs(G.ring_signed_area(ring)))
    # every output triangle ring is closed and CCW
    for t in tris:
        assert np.allclose(t[0], t[-1])
        assert G.ring_signed_area(t) > 0


def test_wkb_wrapper_multipolygon():
    rect = G.wkb_polygon(
        [np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)]
    )
    out = G.parse_wkb(st_constrained_delaunay(rect))
    assert out.gtype == G.WKB_MULTIPOLYGON
    assert len(out.rings) == 2


def test_rejects_non_polygon():
    ln = G.wkb_linestring(np.array([[0, 0], [1, 1]], dtype=float))
    with pytest.raises(ValueError):
        polygon_cdt(G.parse_wkb(ln))


def test_sql_registration(spark):
    from gdal_spark.functions.st import register_st_functions

    register_st_functions(spark)
    rect = G.wkb_polygon(
        [np.array([[0, 0], [4, 0], [4, 3], [0, 3], [0, 0]], dtype=float)]
    )
    df = spark.createDataFrame([(bytearray(rect),)], "geom binary")
    df.createOrReplaceTempView("cdt_in")
    row = spark.sql(
        "SELECT ST_NumGeometries(ST_ConstrainedDelaunayTriangles(geom))"
        " AS n FROM cdt_in"
    ).collect()[0]
    assert row.n == 2
