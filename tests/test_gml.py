"""GML source vs the reference's published oracle values
(``autotest/ogr/ogr_gml.py`` over the shipped fixtures)."""

from __future__ import annotations

import os
import re

import pytest

from gdal_spark.sources import gml

D = "/root/reference/autotest/ogr/data/gml"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")


def _load(name):
    return open(os.path.join(D, name), "rb").read()


def _coords(wkt):
    return [float(v) for v in re.findall(r"-?\d+(?:\.\d+)?", wkt)]


def _geom_eq(a, b, tol=1e-4):
    ca, cb = _coords(a), _coords(b)
    assert len(ca) == len(cb), (a[:60], b[:60])
    assert a.split("(")[0].strip().split()[0] == \
        b.split("(")[0].strip().split()[0]
    for x, y in zip(ca, cb):
        assert abs(x - y) <= tol


@needs_ref
def test_ionic_wfs_polygon():
    """test_ogr_gml_1: one GEM feature, Name field, the published
    GML2 outerBoundaryIs polygon."""
    layers = gml.parse_gml(_load("ionic_wfs.gml"))
    assert list(layers) == ["GEM"]
    feats = layers["GEM"]
    assert len(feats) == 1
    assert feats[0]["Name"] == "Aartselaar"
    _geom_eq(feats[0]["wkt"],
             "POLYGON ((44038 511549,44015 511548,43994 511522,"
             "43941 511539,43844 511514,43754 511479,43685 511521,"
             "43594 511505,43619 511452,43645 511417,4363 511387,"
             "437 511346,43749 511298,43808 511229,43819 511205,"
             "4379 511185,43728 511167,43617 511175,43604 511151,"
             "43655 511125,43746 511143,43886 511154,43885 511178,"
             "43928 511186,43977 511217,4404 511223,44008 511229,"
             "44099 51131,44095 511335,44106 51135,44127 511379,"
             "44124 511435,44137 511455,44105 511467,44098 511484,"
             "44086 511499,4407 511506,44067 511535,44038 511549))")


@needs_ref
def test_rnf_linestring():
    """test_ogr_gml_3: RoadSegment with typed int field and the
    published LINESTRING (GML2 coordinates with cs/ts attributes)."""
    layers = gml.parse_gml(_load("rnf_eg.gml"))
    feats = layers["RoadSegment"]
    assert len(feats) == 1
    assert feats[0]["ngd_id"] == 817792
    assert feats[0]["type"] == "HWY"
    _geom_eq(feats[0]["wkt"],
             "LINESTRING (-63.500411040289066 46.240122507771368,"
             "-63.501009714909742 46.240344881690326,"
             "-63.502170462373471 46.241041855639622,"
             "-63.505862621395394 46.24195250605576,"
             "-63.506719184531178 46.242002742901576,"
             "-63.507197272602212 46.241931577811606,"
             "-63.508403092799554 46.241752283460158,"
             "-63.509946573455622 46.241745397977233)", tol=1e-8)


@needs_ref
def test_bom_and_nested_elements():
    """test_ogr_gml_4: UTF-8 BOM, cartographicMember containers, and
    nested-element flattening (#3680 — anchorPosition lives inside
    textRendering)."""
    layers = gml.parse_gml(_load("bom.gml"))
    feats = layers["CartographicText"]
    assert len(feats) == 3
    assert feats[0]["featureCode"] == 10198
    assert feats[0]["anchorPosition"] == 8
    _geom_eq(feats[0]["wkt"], "POINT (347243.85 461299.5)")
    assert feats[1]["featureCode"] == 10069
    _geom_eq(feats[1]["wkt"], "POINT (347251.45 461250.85)")


@needs_ref
def test_gml3_pos_and_feature_members():
    """WFS 1.1 archsites: gml:featureMembers (plural) + gml:pos."""
    layers = gml.parse_gml(_load("archsites.gml"))
    feats = layers["archsites"]
    assert feats[0]["cat"] == 1
    assert feats[0]["str1"] == "Signature Rock"
    _geom_eq(feats[0]["wkt"], "POINT (593493.0 4914730.0)")


@needs_ref
def test_curve_property():
    """curveProperty.xml: GML3 Curve/segments/LineStringSegment."""
    data = _load("curveProperty.xml")
    import xml.etree.ElementTree as ET

    root = ET.fromstring(data)
    geom = gml._find_geometry(root)
    wkt = gml.gml_geometry_to_wkt(geom)
    assert wkt.startswith(("LINESTRING", "POLYGON", "CURVEPOLYGON"))


def test_writer_roundtrip():
    feats = [
        {"fid": "t.0", "wkt": "POLYGON ((0 0,4 0,4 3,0 3,0 0),"
                              "(1 1,2 1,2 2,1 2,1 1))",
         "name": "poly", "rank": 3},
        {"fid": "t.1", "wkt": "LINESTRING (0 0,1.5 2.25,3 4)",
         "name": "line", "rank": 7},
        {"fid": "t.2", "wkt": "POINT (12.5 -3.25)", "name": "pt",
         "rank": 9},
        {"fid": "t.3",
         "wkt": "MULTIPOLYGON (((0 0,1 0,1 1,0 0)),((5 5,6 5,6 6,5 5)))",
         "name": "mp", "rank": 1},
    ]
    doc = gml.write_gml("things", feats)
    layers = gml.parse_gml(doc.encode())
    back = layers["things"]
    assert [f["name"] for f in back] == ["poly", "line", "pt", "mp"]
    assert [f["rank"] for f in back] == [3, 7, 9, 1]
    for a, b in zip(back, feats):
        _geom_eq(a["wkt"], b["wkt"], tol=1e-12)
