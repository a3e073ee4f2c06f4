"""Slab boolean kernel tests — closed-form area oracles.

Covers the four boolean ops on overlapping / disjoint / identical /
shared-edge / concave operands, hole creation, many-way union, and
the general-polygon buffer — the capability set of GEOS
``Intersection/Union/Difference/SymDifference/Buffer``
(``ogr/ogr_geometry.h:560-578``) that round 2 left as a documented
boundary. Ported case shapes follow the reference's layer-algebra
tests (``autotest/pyscripts/test_ogr_layer_algebra.py``: overlapping
squares → union 7 / intersection 1 / difference 3 / symdiff 6)."""

import math

import numpy as np
import pytest

from gdal_spark.functions import clipper
from gdal_spark.functions import geometry as G
from gdal_spark.functions import predicates as P


def ring(pts):
    return np.asarray(pts + [pts[0]], dtype=np.float64)


def sq(x0, y0, x1, y1):
    return ring([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])


def area_of(rings, roles):
    return sum(
        (1 if ro else -1) * abs(G.ring_signed_area(r)) for r, ro in zip(rings, roles)
    )


A = [sq(0, 0, 2, 2)]
B = [sq(1, 1, 3, 3)]


@pytest.mark.parametrize(
    "op,expect",
    [("union", 7.0), ("intersection", 1.0), ("difference", 3.0), ("symdifference", 6.0)],
)
def test_overlapping_squares_layer_algebra_cases(op, expect):
    rr, ro = clipper.boolean_rings([A, B], op)
    assert area_of(rr, ro) == pytest.approx(expect, abs=1e-9)


def test_disjoint_and_identical():
    assert clipper.boolean_rings([[sq(0, 0, 1, 1)], [sq(5, 5, 6, 6)]], "intersection") == ([], [])
    rr, ro = clipper.boolean_rings([[sq(0, 0, 1, 1)], [sq(5, 5, 6, 6)]], "union")
    assert len(rr) == 2 and area_of(rr, ro) == pytest.approx(2.0)
    rr, ro = clipper.boolean_rings([A, A], "union")
    assert area_of(rr, ro) == pytest.approx(4.0)
    assert clipper.boolean_rings([A, A], "difference") == ([], [])


def test_shared_edge_union_merges_to_minimal_ring():
    rr, ro = clipper.boolean_rings([[sq(0, 0, 1, 1)], [sq(1, 0, 2, 1)]], "union")
    assert len(rr) == 1 and len(rr[0]) - 1 == 4  # seam dissolved
    assert area_of(rr, ro) == pytest.approx(2.0)


def test_concave_difference_and_hole():
    L = [ring([(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3)])]
    rr, ro = clipper.boolean_rings([L, [sq(0, 0, 1, 1)]], "difference")
    assert area_of(rr, ro) == pytest.approx(4.0)
    rr, ro = clipper.boolean_rings([[sq(0, 0, 4, 4)], [sq(1, 1, 2, 2)]], "difference")
    assert sorted(ro) == [False, True]  # exterior + hole
    assert area_of(rr, ro) == pytest.approx(15.0)
    # WKB round trip preserves role-signed area
    g = G.parse_wkb(clipper.rings_to_wkb(rr, ro))
    assert G.geom_area(g) == pytest.approx(15.0)


def test_triangle_intersection_vs_independent_slab_area():
    T1 = [ring([(0, 0), (4, 0), (2, 4)])]
    T2 = [ring([(0, 3), (4, 3), (2, -1)])]
    rr, ro = clipper.boolean_rings([T1, T2], "intersection")
    got = area_of(rr, ro)
    # inclusion–exclusion against the independent area-only kernel
    g1 = G.parse_wkb(G.wkb_polygon(T1))
    g2 = G.parse_wkb(G.wkb_polygon(T2))
    union = P.union_area_polygons([g1, g2])
    assert got == pytest.approx(8.0 + 8.0 - union, abs=1e-9)


def test_many_way_union_inclusion_exclusion():
    sets = [[sq(i * 0.5, 0, i * 0.5 + 1, 1)] for i in range(6)]  # chain overlap
    rr, ro = clipper.boolean_rings(sets, "union")
    assert len(rr) == 1
    assert area_of(rr, ro) == pytest.approx(0.5 * 5 + 1.0)


def test_buffer_right_isoceles_closed_form():
    # axis-aligned right isoceles triangle: every vertex wedge boundary
    # lands on a 32-gon vertex, so buffer area has an EXACT closed form
    a, d = 4.0, 0.5
    tri = G.parse_wkb(G.wkb_polygon([ring([(0, 0), (a, 0), (0, a)])]))
    buf = P.buffer_geom(tri, d, quadsegs=8)
    got = G.geom_area(G.parse_wkb(buf))
    expect = a * a / 2 + (2 * a + a * math.sqrt(2)) * d + 16 * math.sin(math.pi / 16) * d * d
    assert got == pytest.approx(expect, abs=1e-9)


def test_buffer_concave_polygon_positive_and_contains_input():
    Lr = ring([(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3)])
    g = G.parse_wkb(G.wkb_polygon([Lr]))
    buf = G.parse_wkb(P.buffer_geom(g, 0.25, quadsegs=8))
    assert G.geom_area(buf) > G.geom_area(g)
    # all input vertices strictly inside the buffer
    assert np.all(G.points_in_rings(Lr[:-1, 0], Lr[:-1, 1], buf.rings))


def test_union_many_geoms_wkb():
    gs = [G.parse_wkb(G.wkb_polygon([sq(0, 0, 2, 2)])), G.parse_wkb(G.wkb_polygon([sq(1, 1, 3, 3)]))]
    out = clipper.union_many(gs)
    assert G.geom_area(G.parse_wkb(out)) == pytest.approx(7.0)


# ---------------------------------------------------------------------------
# negative buffer (erosion) — closed-form oracles
# ---------------------------------------------------------------------------


def test_negative_buffer_rect():
    import numpy as np
    from gdal_spark.functions import geometry as G, predicates as P

    r = G.parse_wkb(G.wkb_bbox_polygon(0, 0, 4, 2))
    out = G.parse_wkb(P.buffer_geom(r, -0.5))
    assert abs(G.geom_area(out) - 3.0) < 1e-12
    # full consumption → POLYGON EMPTY
    out = G.parse_wkb(P.buffer_geom(r, -1.5))
    assert not out.rings and G.geom_area(out) == 0.0


def test_negative_buffer_l_shape_reflex_arc():
    """Erosion of an L: the reflex corner leaves a round concave arc —
    area = 5 + 0.25 - quarter 32-gon(r), derived by hand from
    P \\ dilate(boundary, r)."""
    import math

    import numpy as np
    from gdal_spark.functions import geometry as G, predicates as P

    ring = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]], float)
    L = G.Geom(gtype=G.WKB_POLYGON, rings=[ring], ring_roles=[True])
    out = G.parse_wkb(P.buffer_geom(L, -0.5))
    n, r = 32, 0.5
    expect = 5.0 + 0.25 - (n / 8) * r * r * math.sin(2 * math.pi / n)
    assert abs(G.geom_area(out) - expect) < 1e-9


def test_negative_buffer_holed_polygon():
    """Square with a hole: erosion shrinks the shell and dilates the
    hole (round-cornered) — closed form via the dilated-hole area."""
    import math

    import numpy as np
    from gdal_spark.functions import geometry as G, predicates as P

    sq = G.Geom(
        gtype=G.WKB_POLYGON,
        rings=[
            np.array([[0, 0], [6, 0], [6, 6], [0, 6], [0, 0]], float),
            np.array([[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]], float),
        ],
        ring_roles=[True, False],
    )
    out = G.parse_wkb(P.buffer_geom(sq, -0.5))
    n, r = 32, 0.5
    ngon_full = (n / 2) * r * r * math.sin(2 * math.pi / n)
    expect = 25.0 - (4.0 + 4.0 * (2 * 0.5) + ngon_full)
    assert abs(G.geom_area(out) - expect) < 1e-9


def test_negative_buffer_triangle_exact():
    """Convex erosion is arc-free: right-isoceles triangle legs a,
    erode r → legs a - r(2+sqrt(2)), the st_general_boolean oracle."""
    import math

    from gdal_spark.functions import geometry as G, predicates as P

    tri = G.parse_wkb(P.parse_wkt("POLYGON ((0 0, 6 0, 0 6, 0 0))"))
    out = G.parse_wkb(P.buffer_geom(tri, -0.2))
    L = 6 - 0.2 * (2 + math.sqrt(2))
    assert abs(G.geom_area(out) - L * L / 2) < 1e-9
