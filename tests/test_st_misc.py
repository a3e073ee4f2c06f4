"""spatialite long-tail ST_ functions: Azimuth / Project / SnapToGrid /
Reverse / MakeLine (ogrsqlitesqlfunctions.cpp registration surface).

ST_Project's Vincenty DIRECT kernel is pinned against the published
Geoscience Australia worked example (Flinders Peak → Buninyong:
s = 54 972.271 m, α1 = 306°52'05.37" — the canonical Vincenty test
vector from the original 1975 paper's accompanying examples): driving
the direct formula with the published distance+azimuth must land on
the published destination coordinates.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.functions import geometry as G
from gdal_spark.functions.geodesic import vincenty_direct, vincenty_inverse
from gdal_spark.functions.st import _reverse_geom, _snap_geom


def _dms(d, m, s):
    return d + m / 60.0 + s / 3600.0


FLINDERS = (-_dms(37, 57, 3.72030), _dms(144, 25, 29.52440))  # lat, lon
BUNINYONG = (-_dms(37, 39, 10.15610), _dms(143, 55, 35.38390))
S12 = 54972.271
AZ1_DEG = _dms(306, 52, 5.37)


def test_vincenty_direct_published_vector():
    phi2, dlam = vincenty_direct(
        FLINDERS[0], FLINDERS[1], math.radians(AZ1_DEG), S12
    )
    lat2, lon2 = math.degrees(phi2), FLINDERS[1] + math.degrees(dlam)
    # published coordinates are given to 1e-5 arcsec ≈ 3e-9 deg; the
    # published s/az are rounded to mm/centisecond, so allow ~1e-7 deg
    assert lat2 == pytest.approx(BUNINYONG[0], abs=2e-7)
    assert lon2 == pytest.approx(BUNINYONG[1], abs=2e-7)


def test_direct_inverse_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(20):
        lat1 = float(rng.uniform(-70, 70))
        lon1 = float(rng.uniform(-179, 179))
        az = float(rng.uniform(0, 2 * math.pi))
        s = float(rng.uniform(10, 5e5))
        phi2, dlam = vincenty_direct(lat1, lon1, az, s)
        s2, az2 = vincenty_inverse(
            lat1, lon1, math.degrees(phi2), lon1 + math.degrees(dlam)
        )
        assert s2 == pytest.approx(s, abs=1e-6)
        assert math.sin(az2 - az) == pytest.approx(0.0, abs=1e-9)


def _az(x1, y1, x2, y2):
    a = math.atan2(x2 - x1, y2 - y1)
    return a + 2 * math.pi if a < 0 else a


def test_azimuth_quadrants():
    # north, east, south, west in plane coordinates
    assert _az(0, 0, 0, 1) == pytest.approx(0.0)
    assert _az(0, 0, 1, 0) == pytest.approx(math.pi / 2)
    assert _az(0, 0, 0, -1) == pytest.approx(math.pi)
    assert _az(0, 0, -1, 0) == pytest.approx(3 * math.pi / 2)
    assert _az(0, 0, 1, 1) == pytest.approx(math.pi / 4)


def test_snap_to_grid_semantics():
    line = G.parse_wkb(
        G.wkb_linestring(np.array([[0.026, 0.026], [0.03, 0.04], [0.12, 0.09]]))
    )
    snapped = _snap_geom(line, 0.05)
    # first two vertices collapse onto the same grid node → deduped
    assert snapped.coords[0].shape == (2, 2)
    assert snapped.coords[0][0] == pytest.approx([0.05, 0.05])
    assert snapped.coords[0][1] == pytest.approx([0.1, 0.1])
    # ring stays closed after snapping
    ring = G.parse_wkb(
        G.wkb_polygon([[(0.01, 0.01), (0.99, 0.02), (0.98, 0.97), (0.01, 0.01)]])
    )
    rs = _snap_geom(ring, 0.5)
    assert (rs.rings[0][0] == rs.rings[0][-1]).all()


def test_reverse_roundtrip_and_z():
    pts = np.array([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]])
    g = G.parse_wkb(G.wkb_linestring(pts))
    rev = _reverse_geom(g)
    assert np.allclose(rev.coords[0], pts[::-1])
    again = _reverse_geom(rev)
    assert np.allclose(again.coords[0], pts)
    # Z preserved through full-width arrays
    gz = G.parse_wkb(G.wkb_linestring(np.array([[0.0, 1.0, 9.0], [2.0, 3.0, 8.0]])))
    rz = G.parse_wkb(G.geom_to_wkb(_reverse_geom(gz)))
    assert rz.has_z and np.allclose(rz.full[0][:, 2], [8.0, 9.0])


def test_registered_sql_surface(spark):
    from gdal_spark.functions.st import register_st_functions

    register_st_functions(spark)
    row = spark.sql(
        """
        SELECT ST_Azimuth(ST_MakePoint(0.0D, 0.0D), ST_MakePoint(1.0D, 0.0D)) AS az,
               ST_NPoints(ST_MakeLine(ST_MakePoint(0.0D, 0.0D),
                                      ST_MakePoint(1.0D, 2.0D))) AS n,
               ST_X(ST_Project(ST_MakePoint(144.0D, -37.0D), 1000.0D, 0.0D)) AS px,
               ST_Azimuth(ST_MakePoint(3.0D, 4.0D), ST_MakePoint(3.0D, 4.0D)) AS az_null
        """
    ).collect()[0]
    assert row.az == pytest.approx(math.pi / 2)
    assert row.n == 2
    assert row.px == pytest.approx(144.0, abs=1e-9)  # due-north keeps lon
    assert row.az_null is None
