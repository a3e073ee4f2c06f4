"""Tile math: Spark column expressions must agree exactly with the
plain-Python reference (which replicates gdal2tiles.py:316-633)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import tile_math as tm


def test_constants():
    m = tm.GlobalMercator()
    assert m.originShift == 2 * math.pi * 6378137 / 2.0  # 20037508.342789244
    # note: the gdal2tiles docstring says ...804062 but the code computes
    # 2*pi*6378137/256 = ...804097; the code is authoritative
    assert m.initialResolution == 2 * math.pi * 6378137 / 256


def test_quadtree_reference_values():
    m = tm.GlobalMercator()
    # quadkey of google tile (0,0) at z=1 is "0"; (1,1) google is "3"
    # (TMS y for google 0 at z=1 is 1)
    assert m.QuadTree(0, 1, 1) == "0"
    assert m.QuadTree(1, 0, 1) == "3"
    assert len(m.QuadTree(123, 456, 12)) == 12


def test_google_tile_flip():
    m = tm.GlobalMercator()
    assert m.GoogleTile(5, 7, 4) == (5, (2**4 - 1) - 7)


def test_zoom_for_pixel_size_reference():
    m = tm.GlobalMercator()
    # exactly at resolution(10): strict > means it returns 10-1? No:
    # pixelSize == res(10) is not > res(10), first i with > is 11 → 10
    assert m.ZoomForPixelSize(m.Resolution(10)) == 10
    assert m.ZoomForPixelSize(m.Resolution(10) * 1.0001) == 9
    assert m.ZoomForPixelSize(1e9) == 0


def test_spark_columns_match_python(spark):
    m = tm.GlobalMercator()
    rng = random.Random(42)
    rows = []
    for i in range(500):
        lon = rng.uniform(-179.99, 179.99)
        lat = rng.uniform(-84.9, 84.9)
        z = rng.randint(1, 18)
        rows.append((i, lon, lat, z))
    df = spark.createDataFrame(rows, "id int, lon double, lat double, z int")
    got = {}
    for z in sorted({r[3] for r in rows}):
        sub = df.filter(F.col("z") == z)
        tx = tm.lonlat_to_tile_x(F.col("lon"), z)
        ty = tm.lonlat_to_tile_y(F.col("lat"), z)
        out = sub.select(
            "id",
            tx.alias("tx"),
            ty.alias("ty"),
            tm.google_y(ty, z).alias("gy"),
            tm.quadkey(tx, ty, z).alias("qk"),
        ).collect()
        for r in out:
            got[r.id] = (r.tx, r.ty, r.gy, r.qk)
    for i, lon, lat, z in rows:
        tx, ty = m.LatLonToTile(lat, lon, z)
        _, gy = m.GoogleTile(tx, ty, z)
        qk = m.QuadTree(tx, ty, z)
        assert got[i] == (tx, ty, gy, qk), (i, lon, lat, z)


def test_spark_tile_bounds_match(spark):
    m = tm.GlobalMercator()
    rows = [(i, i * 37 % 1024, i * 91 % 1024) for i in range(50)]
    df = spark.createDataFrame(rows, "id int, tx int, ty int")
    z = 10
    minx, miny, maxx, maxy = tm.tile_bounds_cols(F.col("tx"), F.col("ty"), z)
    out = df.select("id", "tx", "ty", minx.alias("a"), miny.alias("b"), maxx.alias("c"), maxy.alias("d")).collect()
    for r in out:
        exp = m.TileBounds(r.tx, r.ty, z)
        assert (r.a, r.b, r.c, r.d) == exp


def test_spark_zoom_for_pixel_size(spark):
    m = tm.GlobalMercator()
    sizes = [m.Resolution(z) * f for z in range(0, 20) for f in (0.999, 1.0, 1.001)]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(sizes)], "id int, ps double")
    out = {r.id: r.z for r in df.select("id", tm.zoom_for_pixel_size(F.col("ps")).alias("z")).collect()}
    for i, s in enumerate(sizes):
        assert out[i] == m.ZoomForPixelSize(s)


def test_geodetic_reference():
    g = tm.GlobalGeodetic(tmscompatible=None)
    assert g.resFact == 360.0 / 256
    tx, ty = g.LonLatToTile(0.0, 0.0, 2)
    # at z=2 non-tms-compat: 4x4 grid over [-180,180]x[-90,90] scaled 360
    assert tx == 1
    assert ty >= 0


def test_parent_cell_prefix_property(spark):
    # parent cell at z-k must equal cell of coordinates >> k (quadkey-prefix)
    df = spark.createDataFrame([(100, 200), (1023, 1)], "tx int, ty int")
    out = df.select(
        tm.cell_id(F.col("tx"), F.col("ty"), 10).alias("c"),
        tm.parent_cell(F.col("tx"), F.col("ty"), 10, 8).alias("p"),
    ).collect()
    for r, (tx, ty) in zip(out, [(100, 200), (1023, 1)]):
        assert r.c == (tx << 10) + ty
        assert r.p == ((tx >> 2) << 8) + (ty >> 2)
