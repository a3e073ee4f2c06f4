"""OGR CSV driver semantics (AS_WKT / X,Y fields / .csvt sidecar).

Reference: ``ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp``; correctness model
``autotest/ogr/ogr_csv.py``.
"""

import os
import tempfile

from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G
from gdal_spark.sources import csv_wkt as CSVF


def _tmp(name):
    return os.path.join(tempfile.mkdtemp(prefix="csvf_"), name)


def test_as_wkt_roundtrip_typed(spark):
    rows = [(G.wkb_point(10.0 + i * 0.125, -5.0 - i * 0.25), i, f"n{i}", i * 0.5)
            for i in range(100)]
    df = spark.createDataFrame(rows, "geom binary, k long, name string, v double")
    path = _tmp("pts_csv")
    CSVF.write_csv_features(df.repartition(5), path)
    assert os.path.exists(path + ".csvt")
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) > 1  # distributed write

    back = CSVF.read_csv_features(spark, path)
    assert dict(back.dtypes)["k"] == "bigint"   # .csvt Integer64 honored
    assert dict(back.dtypes)["v"] == "double"
    got = {r.k: r for r in back.collect()}
    assert len(got) == 100
    g = G.parse_wkb(bytes(got[37].geom))
    assert g.coords[0][0, 0] == 10.0 + 37 * 0.125  # binary-fraction exact
    assert got[37].name == "n37" and got[37].v == 18.5


def test_xy_field_mode(spark):
    import csv as _csv

    d = tempfile.mkdtemp(prefix="csvf_")
    p = os.path.join(d, "pts.csv")
    with open(p, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["name", "lon", "lat"])
        for i in range(10):
            w.writerow([f"s{i}", 1.5 * i, -2.5 * i])
    df = CSVF.read_csv_features(spark, p, x_col="lon", y_col="lat")
    rows = {r.name: r for r in df.collect()}
    g = G.parse_wkb(bytes(rows["s4"].geom))
    assert (g.coords[0][0, 0], g.coords[0][0, 1]) == (6.0, -10.0)


def test_polygon_wkt_roundtrip(spark):
    poly = G.wkb_polygon([[(0, 0), (3, 0), (3, 3), (0, 3), (0, 0)]])
    df = spark.createDataFrame([(poly, "sq")], "geom binary, name string")
    path = _tmp("poly_csv")
    CSVF.write_csv_features(df, path)
    back = CSVF.read_csv_features(spark, path).collect()[0]
    assert abs(G.geom_area(G.parse_wkb(bytes(back.geom))) - 9.0) < 1e-12


def test_null_geometry(spark):
    df = spark.createDataFrame(
        [(None, "a"), (G.wkb_point(1.0, 2.0), "b")], "geom binary, name string")
    path = _tmp("null_csv")
    CSVF.write_csv_features(df, path)
    rows = {r.name: r.geom for r in CSVF.read_csv_features(spark, path).collect()}
    assert rows["a"] is None and rows["b"] is not None
