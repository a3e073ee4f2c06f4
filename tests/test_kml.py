"""KML round-trips (OGC KML 2.2).

Reference: ``ogr/ogrsf_frmts/kml/ogrkmllayer.cpp`` (writer),
``ogr/ogrsf_frmts/libkml/`` (reader); tests ``autotest/ogr/ogr_kml.py``.
"""

import os
import struct
import tempfile

import numpy as np

from gdal_spark.functions import geometry as G
from gdal_spark.sources import kml as KML


def _tmp(name):
    return os.path.join(tempfile.mkdtemp(prefix="kml_"), name)


def test_roundtrip_points_named(spark):
    rows = [(G.wkb_point(-120.0 + i * 0.5, 35.0 + i * 0.125), f"pm{i}", i, i * 2.5)
            for i in range(50)]
    df = spark.createDataFrame(rows, "geom binary, name string, k long, v double")
    path = _tmp("pts.kml")
    assert KML.write_kml(df, path, name_col="name") == 50
    back = KML.read_kml(spark, path, "k long, v double")
    got = {r.k: r for r in back.collect()}
    assert len(got) == 50
    g = G.parse_wkb(bytes(got[13].geom))
    assert g.coords[0][0, 0] == -120.0 + 13 * 0.5  # repr coords bit-exact
    assert got[13].name == "pm13" and got[13].v == 32.5


def test_polygon_with_hole_and_multigeometry(spark):
    poly = G.wkb_polygon([[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                          [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]])
    mp = G.wkb_multipolygon([[[(20, 0), (25, 0), (25, 5), (20, 5), (20, 0)]],
                             [[(30, 0), (32, 0), (32, 2), (30, 2), (30, 0)]]])
    ml = (struct.pack("<BII", 1, 5, 2)
          + G.wkb_linestring([(0, 0), (1, 1)])
          + G.wkb_linestring([(5, 5), (6, 7)]))
    df = spark.createDataFrame(
        [(poly, 1), (mp, 2), (ml, 3)], "geom binary, k long")
    path = _tmp("geoms.kml")
    KML.write_kml(df, path)
    back = {r.k: G.parse_wkb(bytes(r.geom))
            for r in KML.read_kml(spark, path, "k long",
                                  name_col=None).collect()}
    assert back[1].gtype == G.WKB_POLYGON and back[1].ring_roles == [True, False]
    assert abs(G.geom_area(back[1]) - 96.0) < 1e-9
    assert back[2].gtype == G.WKB_MULTIPOLYGON
    assert abs(G.geom_area(back[2]) - 29.0) < 1e-9
    assert back[3].gtype == G.WKB_MULTILINESTRING and len(back[3].coords) == 2


def test_kml_document_structure(spark):
    import xml.etree.ElementTree as ET

    df = spark.createDataFrame(
        [(G.wkb_point(1.0, 2.0), "x")], "geom binary, name string")
    path = _tmp("doc.kml")
    KML.write_kml(df, path, name_col="name", doc_name="mydoc")
    root = ET.parse(path).getroot()
    assert root.tag == f"{{{KML._KML_NS}}}kml"
    doc = root.find(KML._q("Document"))
    assert doc.findtext(KML._q("name")) == "mydoc"
    pm = doc.find(KML._q("Placemark"))
    assert pm.findtext(KML._q("name")) == "x"
    assert pm.find(KML._q("Point")).findtext(KML._q("coordinates")) == "1.0,2.0"


def test_null_geometry_and_null_attr(spark):
    df = spark.createDataFrame(
        [(None, "a", None), (G.wkb_point(3.0, 4.0), "b", 7)],
        "geom binary, name string, k long")
    path = _tmp("nulls.kml")
    KML.write_kml(df, path, name_col="name")
    rows = {r.name: r for r in
            KML.read_kml(spark, path, "k long").collect()}
    assert rows["a"].geom is None and rows["a"].k is None
    assert rows["b"].k == 7
