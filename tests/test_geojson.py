"""GeoJSON / GeoJSONSeq round-trips (RFC 7946 / 8142).

Reference: ``ogr/ogrsf_frmts/geojson/`` (reader/writer pair +
GeoJSONSeq driver); correctness model ``autotest/ogr/ogr_geojson.py``.
"""

import json
import os
import tempfile

import numpy as np

from gdal_spark.functions import geometry as G
from gdal_spark.sources import geojson as GJ


def _tmp(name):
    return os.path.join(tempfile.mkdtemp(prefix="gj_"), name)


def test_geometry_conversion_all_types():
    import struct

    cases = [
        G.wkb_point(1.5, -2.25),
        G.wkb_point(1.0, 2.0, 3.0),
        G.wkb_linestring([(0, 0), (1, 1), (2, 0.5)]),
        G.wkb_polygon([[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                       [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]]),
        G.wkb_multipolygon([[[(0, 0), (5, 0), (5, 5), (0, 5), (0, 0)]],
                            [[(9, 9), (11, 9), (11, 11), (9, 11), (9, 9)]]]),
        struct.pack("<BII", 1, 4, 2) + G.wkb_point(0, 1) + G.wkb_point(2, 3),
        struct.pack("<BII", 1, 5, 2)
        + G.wkb_linestring([(0, 0), (1, 1)])
        + G.wkb_linestring([(5, 5), (6, 7)]),
        G.wkb_geometrycollection(
            [G.wkb_point(1, 2), G.wkb_linestring([(0, 0), (3, 3)])]),
    ]
    for wkb in cases:
        gj = GJ.geom_to_geojson(G.parse_wkb(wkb))
        # through JSON text (the actual on-disk form) and back
        back = GJ.geojson_to_wkb(json.loads(json.dumps(gj)))
        a, b = G.parse_wkb(wkb), G.parse_wkb(back)
        assert a.gtype == b.gtype
        pa = a.full if a.full else (a.rings or a.coords)
        pb = b.full if b.full else (b.rings or b.coords)
        if a.gtype != G.WKB_GEOMETRYCOLLECTION:
            assert len(pa) == len(pb)
            for x, y in zip(pa, pb):
                assert np.array_equal(np.asarray(x)[:, :2], np.asarray(y)[:, :2])


def test_seq_roundtrip_distributed(spark):
    rows = [(G.wkb_point(-100.0 + i * 0.5, 40.0 - i * 0.25), f"f{i}", i)
            for i in range(500)]
    df = spark.createDataFrame(rows, "geom binary, name string, rank long")
    path = _tmp("pts_seq")
    GJ.write_geojsonseq(df.repartition(7), path)
    # spark text writer produced multiple part files (distributed write)
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) > 1
    back = GJ.read_geojsonseq(spark, path, "name string, rank long")
    got = {r.rank: r for r in back.collect()}
    assert len(got) == 500
    g17 = G.parse_wkb(bytes(got[17].geom))
    assert g17.coords[0][0, 0] == -100.0 + 17 * 0.5  # bit-exact via repr()
    assert got[17].name == "f17"


def test_seq_null_geometry_and_missing_prop(spark):
    df = spark.createDataFrame(
        [(None, "a"), (G.wkb_point(1.0, 2.0), None)], "geom binary, name string")
    path = _tmp("nulls")
    GJ.write_geojsonseq(df, path)
    rows = GJ.read_geojsonseq(spark, path, "name string").collect()
    by_name = {r.name: r.geom for r in rows}
    assert by_name["a"] is None
    assert None in by_name and by_name[None] is not None


def test_featurecollection_roundtrip(spark):
    poly = G.wkb_polygon([[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]])
    df = spark.createDataFrame([(poly, "sq", 16.0)],
                               "geom binary, name string, area double")
    path = _tmp("fc.geojson")
    n = GJ.write_geojson(df, path)
    assert n == 1
    doc = json.load(open(path))
    assert doc["type"] == "FeatureCollection"
    assert doc["features"][0]["geometry"]["type"] == "Polygon"
    back = GJ.read_geojson(spark, path, "name string, area double").collect()
    assert len(back) == 1 and back[0].name == "sq"
    assert abs(G.geom_area(G.parse_wkb(bytes(back[0].geom))) - 16.0) < 1e-12
