"""Linear referencing kernels (ogrlineref / spatialite ST_Line_*).

Reference: ``apps/ogrlineref.cpp``,
``ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp``,
``OGRLineString::Value`` (ogr/ogrlinestring.cpp); tests
``autotest/utilities/test_ogrlineref.py``.
"""

import numpy as np

from gdal_spark.functions import geometry as G
from gdal_spark.functions import linear_ref as LR

L = G.parse_wkb(G.wkb_linestring([(0, 0), (10, 0), (10, 5), (0, 5)]))  # len 25


def _pt(wkb):
    g = G.parse_wkb(wkb)
    return tuple(g.coords[0][0])


def test_interpolate_knots_and_midpoints():
    assert _pt(LR.line_interpolate_point(L, 0.0)) == (0.0, 0.0)
    assert _pt(LR.line_interpolate_point(L, 1.0)) == (0.0, 5.0)
    assert _pt(LR.line_interpolate_point(L, 0.4)) == (10.0, 0.0)   # exactly at knot
    assert _pt(LR.line_interpolate_point(L, 0.2)) == (5.0, 0.0)
    assert _pt(LR.line_interpolate_point(L, 0.5)) == (10.0, 2.5)
    assert _pt(LR.line_interpolate_point(L, 0.8)) == (5.0, 5.0)
    # clamped out-of-range (spatialite clamps the same way)
    assert _pt(LR.line_interpolate_point(L, -3.0)) == (0.0, 0.0)
    assert _pt(LR.line_interpolate_point(L, 2.0)) == (0.0, 5.0)


def test_locate_inverts_interpolate():
    for f in (0.0, 0.1, 0.25, 0.4, 0.5, 0.77, 1.0):
        x, y = _pt(LR.line_interpolate_point(L, f))
        assert abs(LR.line_locate_point(L, x, y) - f) < 1e-12


def test_locate_off_line_projects():
    # above the first segment → projects straight down
    assert abs(LR.line_locate_point(L, 5.0, -7.0) - 0.2) < 1e-12
    # beyond the last vertex → clamps to the end
    assert LR.line_locate_point(L, -100.0, 5.0) == 1.0


def test_substring_lengths_and_endpoints():
    # f=0.6 → distance 15 = exactly the (10,5) vertex
    sub = G.parse_wkb(LR.line_substring(L, 0.1, 0.6))
    pts = sub.coords[0]
    assert tuple(pts[0]) == (2.5, 0.0) and tuple(pts[-1]) == (10.0, 5.0)
    assert abs(G.geom_length3d(sub) - 0.5 * 25.0) < 1e-12
    assert len(pts) == 3  # knot kept once, no duplicate at the cut
    # a cut strictly inside a segment
    sub2 = G.parse_wkb(LR.line_substring(L, 0.1, 0.5))
    assert tuple(sub2.coords[0][-1]) == (10.0, 2.5)
    assert len(sub2.coords[0]) == 3
    # degenerate zero-width request
    z = G.parse_wkb(LR.line_substring(L, 0.3, 0.3))
    assert G.geom_length3d(z) == 0.0


def test_mileposts_cover_line():
    mp = LR.mileposts(L, 0.25)
    assert [f for f, _ in mp] == [0.0, 0.25, 0.5, 0.75, 1.0]
    assert _pt(mp[2][1]) == (10.0, 2.5)


def test_polygon_boundary_accepted():
    ring = G.parse_wkb(G.wkb_polygon([[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]]))
    assert _pt(LR.line_interpolate_point(ring, 0.5)) == (4.0, 4.0)
