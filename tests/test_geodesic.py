"""Geodesic area/length vs the reference's PUBLISHED expected values.

Every expectation below is copied from the reference's own test suite
(``autotest/ogr/ogr_geom.py:4742`` GeodesicArea, ``:4926``
GeodesicLength — values produced by PROJ's Karney geodesic), so this
is an external oracle: our Vincenty + authalic-integral implementation
never saw these numbers.  Reference tolerance is ``pytest.approx``
default (rel 1e-6); we assert tighter where we measure tighter.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions.geodesic import (
    geodesic_area,
    geodesic_length,
    vincenty_inverse,
)
from gdal_spark.functions.geometry import parse_wkb, wkb_multipolygon, wkb_polygon


def _poly(*rings):
    return parse_wkb(wkb_polygon([list(r) for r in rings]))


TRI = [(2, 49), (3, 49), (3, 48), (2, 49)]
TRI_AREA = 4068384291.8911743
HI = [(2, 89), (3, 89), (3, 88), (2, 89)]
HI_AREA = 108860488.12023926


def test_geodesic_area_reference_values():
    assert geodesic_area(_poly(TRI)) == pytest.approx(TRI_AREA, rel=1e-9)
    assert geodesic_area(_poly(HI)) == pytest.approx(HI_AREA, rel=1e-6)
    # longitude-invariance (ogr_geom.py:4760: same triangle at lon+10)
    shifted = [(x + 10, y) for x, y in TRI]
    assert geodesic_area(_poly(shifted)) == pytest.approx(TRI_AREA, rel=1e-9)


def test_geodesic_area_hole_and_multipolygon():
    # hole equal to the shell -> 0 (ogr_geom.py:4790)
    assert geodesic_area(_poly(TRI, TRI)) == pytest.approx(0.0, abs=1e-3)
    # multipolygon parts add (ogr_geom.py:4797; second part = TRI at lat+40)
    part2 = [(2, 89), (3, 89), (3, 88), (2, 89)]
    mp = parse_wkb(wkb_multipolygon([[list(TRI)], [list(part2)]]))
    assert geodesic_area(mp) == pytest.approx(TRI_AREA + HI_AREA, rel=1e-6)


def test_geodesic_length_reference_values():
    # per-edge Vincenty distances (ogr_geom.py:4929-4948)
    assert vincenty_inverse(49, 2, 49, 3)[0] == pytest.approx(73171.26435678436, rel=1e-9)
    assert vincenty_inverse(49, 3, 48, 3)[0] == pytest.approx(111200.0367623785, rel=1e-9)
    assert vincenty_inverse(48, 3, 49, 2)[0] == pytest.approx(133514.4852804854, rel=1e-9)
    # closed ring perimeter (ogr_geom.py:4958)
    assert geodesic_length(_poly(TRI)) == pytest.approx(317885.78639964823, rel=1e-9)
    # high-lat ring (ogr_geom.py:4983)
    assert geodesic_length(_poly(HI)) == pytest.approx(225369.66747743438, rel=1e-9)


def test_geodesic_vs_planar_sanity():
    # 1 deg x 1 deg at ~48.5N: ellipsoidal ~ 8.2e9 m2; planar degrees^2 = 1
    sq = _poly([(2, 48), (3, 48), (3, 49), (2, 49), (2, 48)])
    a = geodesic_area(sq)
    assert 7.0e9 < a < 9.5e9


def test_st_geodesic_sql(spark):
    from gdal_spark.functions.st import register_st_functions

    register_st_functions(spark)
    r = spark.sql(
        """
        SELECT ST_GeodesicArea(ST_GeomFromText(
                 'POLYGON ((2 49, 3 49, 3 48, 2 49))')) AS a,
               ST_GeodesicLength(ST_GeomFromText(
                 'POLYGON ((2 49, 3 49, 3 48, 2 49))')) AS l
        """
    ).collect()[0]
    assert r.a == pytest.approx(TRI_AREA, rel=1e-9)
    assert r.l == pytest.approx(317885.78639964823, rel=1e-9)
