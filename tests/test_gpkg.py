"""GeoPackage round-trips (OGC GPKG 1.3 encoding standard).

Reference: ``ogr/ogrsf_frmts/gpkg/`` (ogrgeopackagedatasource.cpp,
ogrgeopackagetablelayer.cpp); correctness model
``autotest/ogr/ogr_gpkg.py``.
"""

import os
import sqlite3
import struct
import tempfile

from gdal_spark.functions import geometry as G
from gdal_spark.sources import gpkg as GP


def _path(name):
    return os.path.join(tempfile.mkdtemp(prefix="gpkg_"), name)


def test_blob_header_layout():
    wkb = G.wkb_point(12.5, -33.25)
    blob = GP.geom_to_gpkg_blob(wkb, srs_id=4326)
    assert blob[:2] == b"GP" and blob[2] == 0
    assert blob[3] & 1 == 1  # little-endian
    assert (blob[3] >> 1) & 0b111 == 1  # envelope: XY
    assert struct.unpack_from("<i", blob, 4)[0] == 4326
    x0, x1, y0, y1 = struct.unpack_from("<4d", blob, 8)
    assert (x0, x1, y0, y1) == (12.5, 12.5, -33.25, -33.25)
    assert GP.gpkg_blob_to_wkb(blob) == wkb


def test_roundtrip_points_exact(spark):
    rows = [(G.wkb_point(i * 0.3 - 50.0, 80.0 - i * 0.7), i, f"p{i}", i * 1.5)
            for i in range(300)]
    df = spark.createDataFrame(rows, "geom binary, k long, name string, v double")
    path = _path("pts.gpkg")
    meta = GP.write_gpkg(df, path, "points")
    assert meta["n"] == 300 and meta["geometry_type"] == "POINT"
    assert GP.list_layers(path) == ["points"]

    back = GP.read_gpkg(spark, path, "points", chunks=7).collect()
    assert len(back) == 300
    by_k = {r.k: r for r in back}
    g = G.parse_wkb(bytes(by_k[123].geom))
    assert g.coords[0][0, 0] == 123 * 0.3 - 50.0  # IEEE doubles bit-exact
    assert by_k[123].name == "p123" and by_k[123].v == 123 * 1.5


def test_spec_tables_and_pragmas(spark):
    df = spark.createDataFrame(
        [(G.wkb_polygon([[(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]]), "a")],
        "geom binary, name string")
    path = _path("spec.gpkg")
    GP.write_gpkg(df, path, "aoi")
    con = sqlite3.connect(path)
    assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
    assert con.execute("PRAGMA user_version").fetchone()[0] == 10300
    row = con.execute(
        "SELECT data_type, min_x, max_y, srs_id FROM gpkg_contents").fetchone()
    assert row == ("features", 0.0, 2.0, 4326)
    gc = con.execute(
        "SELECT geometry_type_name, z, m FROM gpkg_geometry_columns").fetchone()
    assert gc == ("POLYGON", 0, 0)
    srs = {r[0] for r in con.execute("SELECT srs_id FROM gpkg_spatial_ref_sys")}
    assert srs == {-1, 0, 4326}
    con.close()


def test_null_geometry_and_nulls(spark):
    df = spark.createDataFrame(
        [(None, 1, None), (G.wkb_point(3.0, 4.0), None, "x")],
        "geom binary, k long, s string")
    path = _path("nulls.gpkg")
    GP.write_gpkg(df, path, "t")
    rows = GP.read_gpkg(spark, path, "t").orderBy("fid").collect()
    assert rows[0].geom is None and rows[0].k == 1 and rows[0].s is None
    assert rows[1].k is None and rows[1].s == "x"
    assert G.parse_wkb(bytes(rows[1].geom)).coords[0][0, 1] == 4.0


def test_chunked_scan_covers_rowid_space(spark):
    n = 1234
    df = spark.createDataFrame(
        [(G.wkb_point(float(i), 0.0), i) for i in range(n)], "geom binary, k long")
    path = _path("big.gpkg")
    GP.write_gpkg(df, path, "pts")
    got = GP.read_gpkg(spark, path, "pts", chunks=13)
    assert got.count() == n
    from pyspark.sql import functions as F
    assert got.agg(F.sum("k")).first()[0] == n * (n - 1) // 2
