"""Shapefile source/sink round-trips.

Reference behavior: ``ogr/ogrsf_frmts/shape/`` (shpopen.c record
layout, dbfopen.c attribute layout, shape2ogr.cpp ring→hole
assignment); correctness model ``autotest/ogr/ogr_shape.py``.
"""

import os
import struct
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G
from gdal_spark.sources import shapefile as SHP


def _base(name):
    return os.path.join(tempfile.mkdtemp(prefix="shp_"), name)


def test_point_roundtrip_exact_doubles(spark):
    rows = [
        (i, G.wkb_point(-180.0 + i * 1.7, -85.0 + i * 0.9), f"n{i}", i * 10)
        for i in range(257)
    ]
    df = spark.createDataFrame(rows, "fid_src long, geom binary, name string, v long")
    base = _base("pts")
    meta = SHP.write_shapefile(df.select("geom", "name", "v"), base)
    assert meta["n"] == 257 and meta["shape_type"] == SHP.SHP_POINT

    back = SHP.read_shapefile(spark, base, chunks=5).orderBy("fid").collect()
    assert len(back) == 257
    for i, r in enumerate(back):
        g = G.parse_wkb(bytes(r.geom))
        # .shp stores IEEE doubles directly: bit-exact round-trip
        assert g.coords[0][0, 0] == -180.0 + i * 1.7
        assert g.coords[0][0, 1] == -85.0 + i * 0.9
        assert r.name == f"n{i}" and r.v == i * 10


def test_polygon_holes_and_multipolygon(spark):
    poly = G.wkb_polygon(
        [[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
         [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]])
    mp = G.wkb_multipolygon(
        [[[(20, 0), (25, 0), (25, 5), (20, 5), (20, 0)]],
         [[(30, 0), (33, 0), (33, 3), (30, 3), (30, 0)]]])
    df = spark.createDataFrame([(poly, 1), (mp, 2)], "geom binary, k long")
    base = _base("polys")
    SHP.write_shapefile(df, base)
    back = {r.k: G.parse_wkb(bytes(r.geom))
            for r in SHP.read_shapefile(spark, base).collect()}
    assert back[1].gtype == G.WKB_POLYGON
    assert back[1].ring_roles == [True, False]
    assert abs(G.geom_area(back[1]) - 96.0) < 1e-9
    assert back[2].gtype == G.WKB_MULTIPOLYGON
    assert abs(G.geom_area(back[2]) - 34.0) < 1e-9


def test_mixed_attribute_types_and_nulls(spark):
    df = spark.createDataFrame(
        [(G.wkb_point(1.0, 2.0), 7, 3.25, True, "abc"),
         (G.wkb_point(3.0, 4.0), None, None, None, None)],
        "geom binary, i long, x double, b boolean, s string")
    base = _base("attrs")
    SHP.write_shapefile(df, base)
    rows = SHP.read_shapefile(spark, base).orderBy("fid").collect()
    assert rows[0].i == 7 and rows[0].b is True and rows[0].s == "abc"
    assert abs(rows[0].x - 3.25) < 1e-6
    assert rows[1].i is None and rows[1].x is None and rows[1].b is None


def test_null_shape_record(spark):
    df = spark.createDataFrame(
        [(None, 1), (G.wkb_point(5.0, 6.0), 2)], "geom binary, k long")
    base = _base("nulls")
    SHP.write_shapefile(df, base)
    rows = SHP.read_shapefile(spark, base).orderBy("fid").collect()
    assert rows[0].geom is None
    assert G.parse_wkb(bytes(rows[1].geom)).coords[0][0, 0] == 5.0


def test_z_linestring_roundtrip(spark):
    ls = G.wkb_linestring([(0, 0, 10), (1, 1, 20), (2, 0, 30)])
    df = spark.createDataFrame([(ls, 1)], "geom binary, k long")
    base = _base("zline")
    meta = SHP.write_shapefile(df, base)
    assert meta["shape_type"] == SHP.SHP_ARC_Z
    g = G.parse_wkb(bytes(SHP.read_shapefile(spark, base).first().geom))
    assert g.has_z and np.allclose(g.full[0][:, 2], [10, 20, 30])


def test_header_layout_matches_spec(spark):
    # pin the main-header byte layout against the published spec values
    df = spark.createDataFrame([(G.wkb_point(7.0, 8.0), 1)], "geom binary, k long")
    base = _base("hdr")
    SHP.write_shapefile(df, base)
    blob = open(base + ".shp", "rb").read()
    assert struct.unpack_from(">i", blob, 0)[0] == 9994           # file code
    assert struct.unpack_from(">i", blob, 24)[0] * 2 == len(blob)  # length
    assert struct.unpack_from("<i", blob, 28)[0] == 1000          # version
    assert struct.unpack_from("<i", blob, 32)[0] == SHP.SHP_POINT
    xmin, ymin = struct.unpack_from("<2d", blob, 36)
    assert (xmin, ymin) == (7.0, 8.0)
    shx = open(base + ".shx", "rb").read()
    assert struct.unpack_from(">i", shx, 24)[0] * 2 == len(shx)
    assert len(shx) == 100 + 8  # one record


def test_chunking_covers_all_records(spark):
    n = 1000
    df = spark.createDataFrame(
        [(G.wkb_point(float(i), float(-i)), i) for i in range(n)],
        "geom binary, k long")
    base = _base("chunks")
    SHP.write_shapefile(df, base)
    got = SHP.read_shapefile(spark, base, chunks=17)
    assert got.count() == n
    s = got.agg(F.sum("k")).first()[0]
    assert s == n * (n - 1) // 2
