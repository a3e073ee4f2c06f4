"""Mapbox Vector Tiles codec vs the published spec examples.

The command-integer vectors below are copied verbatim from the Mapbox
Vector Tile Specification 2.1 (spec §4.3.5 worked examples) — an
external oracle the encoder never saw. Reference driver:
``ogr/ogrsf_frmts/mvt/``.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.sources import mvt


def test_spec_point_example():
    # spec 4.3.5.1: point (25, 17) → [9, 50, 34]
    cmds = mvt.encode_geometry([np.array([[25, 17]])], mvt.POINT)
    assert cmds == [9, 50, 34]


def test_spec_polygon_example():
    # spec 4.3.5.3: ring (3,6) (8,12) (20,34) → [9,6,12,18,10,12,24,44,15]
    ring = np.array([[3, 6], [8, 12], [20, 34], [3, 6]])
    cmds = mvt.encode_geometry([ring], mvt.POLYGON)
    assert cmds == [9, 6, 12, 18, 10, 12, 24, 44, 15]


def test_spec_multipoint_example():
    # spec 4.3.5.2 MoveTo with count 2: (5,7) and (3,2)
    cmds = mvt.encode_geometry([np.array([[5, 7], [3, 2]])], mvt.POINT)
    assert cmds == [17, 10, 14, 3, 9]


def test_geometry_roundtrip():
    rng = np.random.default_rng(6)
    for gtype in (mvt.LINESTRING, mvt.POLYGON):
        parts = []
        for _ in range(3):
            p = rng.integers(-100, 4200, (6, 2))
            if gtype == mvt.POLYGON:
                p = np.vstack([p, p[:1]])
            parts.append(p)
        back = mvt.decode_geometry(
            mvt.encode_geometry(parts, gtype), gtype
        )
        assert len(back) == 3
        for a, b in zip(parts, back):
            assert np.array_equal(a, b)


def test_tile_roundtrip_with_tags():
    feats = [
        {
            "id": 7,
            "gtype": mvt.POLYGON,
            "parts": [np.array([[0, 0], [10, 0], [10, 10], [0, 0]])],
            "tags": {"category": "park", "population": 1234, "score": 0.5},
        },
        {
            "id": 8,
            "gtype": mvt.POINT,
            "parts": [np.array([[25, 17]])],
            "tags": {"category": "park"},  # key/value table dedup path
        },
    ]
    buf = mvt.encode_tile("aoi", feats)
    out = mvt.decode_tile(buf)
    layer = out["layers"][0]
    assert layer["name"] == "aoi"
    assert layer["version"] == 2
    assert layer["extent"] == mvt.EXTENT
    f0, f1 = layer["features"]
    assert f0["id"] == 7 and f0["gtype"] == mvt.POLYGON
    assert f0["tags"] == {"category": "park", "population": 1234, "score": 0.5}
    assert np.array_equal(f0["parts"][0], [[0, 0], [10, 0], [10, 10], [0, 0]])
    assert f1["tags"] == {"category": "park"}
    assert np.array_equal(f1["parts"][0], [[25, 17]])


def test_build_mvt_tiles(spark):
    """Spark tile build: every decoded ring matches the closed-form
    quantization of its source box (per-tile, y-down, spec buffer
    semantics for edge-crossers)."""
    import math

    from gdal_spark.functions import tile_math as tm

    polys = spark.createDataFrame(
        [
            (1, 10.0, 40.0, 10.4, 40.3, "park"),
            (2, -74.3, 40.5, -73.8, 40.9, "urban"),
            (3, 139.5, 35.4, 140.1, 35.9, "water"),
        ],
        "poly_id long, lon_min double, lat_min double, lon_max double,"
        " lat_max double, category string",
    )
    zoom = 6
    out = mvt.build_mvt_tiles(polys, zoom, tag_cols=("category",)).collect()
    assert len(out) >= 3
    size = tm.resolution(zoom) * 256.0
    org = tm.ORIGIN_SHIFT
    src = {r.poly_id: r for r in polys.collect()}
    for row in out:
        tile = mvt.decode_tile(bytes(row.tile))
        layer = tile["layers"][0]
        assert len(layer["features"]) == row.n_features
        for ft in layer["features"]:
            s = src[ft["id"]]
            mx0 = s.lon_min * org / 180.0
            mx1 = s.lon_max * org / 180.0
            my0 = math.log(math.tan((90.0 + s.lat_min) * math.pi / 360.0)) / (
                math.pi / 180.0
            ) * org / 180.0
            my1 = math.log(math.tan((90.0 + s.lat_max) * math.pi / 360.0)) / (
                math.pi / 180.0
            ) * org / 180.0
            left = row.tx * size - org
            top = (row.ty + 1.0) * size - org
            qx0 = math.floor((mx0 - left) / size * 4096.0)
            qx1 = math.floor((mx1 - left) / size * 4096.0)
            qy0 = math.floor((top - my1) / size * 4096.0)
            qy1 = math.floor((top - my0) / size * 4096.0)
            ring = ft["parts"][0]
            assert np.array_equal(
                ring,
                [[qx0, qy0], [qx1, qy0], [qx1, qy1], [qx0, qy1], [qx0, qy0]],
            )
            assert ft["tags"]["category"] == s.category


def test_build_mvt_tiles_wkb_path(spark):
    """geom_col path: quantized corner set equals the bbox path when
    the WKB is the bbox polygon (winding may rotate the start vertex)."""
    from gdal_spark.functions import geometry as G

    rows = [
        (1, 10.0, 40.0, 10.4, 40.3, "park"),
        (2, -74.3, 40.5, -73.8, 40.9, "urban"),
    ]
    wkb_rows = [
        (
            *r,
            G.wkb_polygon(
                [[(r[1], r[2]), (r[3], r[2]), (r[3], r[4]), (r[1], r[4]), (r[1], r[2])]]
            ),
        )
        for r in rows
    ]
    polys = spark.createDataFrame(
        wkb_rows,
        "poly_id long, lon_min double, lat_min double, lon_max double,"
        " lat_max double, category string, geom binary",
    )
    t_box = mvt.build_mvt_tiles(polys, 6, tag_cols=("category",)).collect()
    t_wkb = mvt.build_mvt_tiles(
        polys, 6, tag_cols=("category",), geom_col="geom"
    ).collect()

    def corners(rows_):
        out = {}
        for row in rows_:
            for ft in mvt.decode_tile(bytes(row.tile))["layers"][0]["features"]:
                ring = ft["parts"][0]
                out[(row.tx, row.ty, ft["id"])] = (
                    int(ring[:, 0].min()),
                    int(ring[:, 1].min()),
                    int(ring[:, 0].max()),
                    int(ring[:, 1].max()),
                )
        return out

    assert corners(t_box) == corners(t_wkb)


def test_convert_job_mvt_sink(spark, tmp_path):
    """ogr2ogr -f MVT analogue: geojson → z/x/y.pbf directory."""
    import os

    from gdal_spark.functions import geometry as G
    from gdal_spark.sources import geojson as GJ
    from jobs.convert_job import write_any

    df = spark.createDataFrame(
        [
            (
                1,
                "park",
                G.wkb_polygon(
                    [[(10.0, 40.0), (10.4, 40.0), (10.4, 40.3), (10.0, 40.3), (10.0, 40.0)]]
                ),
            )
        ],
        "feat_id long, category string, geom binary",
    )
    out = str(tmp_path / "tiles")
    os.environ["CONVERT_MVT_ZOOM"] = "5"
    try:
        write_any(df, out, "mvt", "parks")
    finally:
        del os.environ["CONVERT_MVT_ZOOM"]
    pbfs = []
    for root, _, files in os.walk(out):
        pbfs += [os.path.join(root, f) for f in files if f.endswith(".pbf")]
    assert pbfs
    layer = mvt.decode_tile(open(pbfs[0], "rb").read())["layers"][0]
    assert layer["name"] == "parks"
    assert layer["features"][0]["id"] == 1


def test_mvt_mbtiles_container(spark, tmp_path):
    """gdal MVT driver's MBTiles output: format=pbf + vector_layers
    json metadata; tiles round-trip through the MBTiles reader."""
    from gdal_spark.raster.mbtiles import mbtiles_metadata, read_mbtiles

    polys = spark.createDataFrame(
        [(1, 10.0, 40.0, 10.4, 40.3, "park")],
        "poly_id long, lon_min double, lat_min double, lon_max double,"
        " lat_max double, category string",
    )
    tiles = mvt.build_mvt_tiles(polys, 5, tag_cols=("category",))
    path = str(tmp_path / "v.mbtiles")
    meta = mvt.write_mvt_mbtiles(tiles, path, layer_name="aoi",
                                 fields={"category": "String"})
    assert meta["format"] == "pbf"
    md = mbtiles_metadata(path)
    assert "vector_layers" in md["json"]
    back = read_mbtiles(spark, path).collect()
    assert back
    layer = mvt.decode_tile(bytes(back[0].tile))["layers"][0]
    assert layer["name"] == "aoi"
    assert layer["features"][0]["tags"]["category"] == "park"


def test_build_mvt_pyramid(spark):
    polys = spark.createDataFrame(
        [(1, 10.0, 40.0, 10.4, 40.3, "park")],
        "poly_id long, lon_min double, lat_min double, lon_max double,"
        " lat_max double, category string",
    )
    out = mvt.build_mvt_pyramid(polys, 3, 6, tag_cols=("category",)).collect()
    zs = sorted({r.z for r in out})
    assert zs == [3, 4, 5, 6]
    # every tile decodes with the feature present
    for r in out:
        layer = mvt.decode_tile(bytes(r.tile))["layers"][0]
        assert layer["features"][0]["id"] == 1


def test_value_message_field_semantics():
    """MVT Value fields per vector_tile.proto / mvt_tile.h: 1=string,
    2=float(fixed32), 3=double(fixed64), 4=int64, 5=uint64(plain),
    6=sint64(zigzag), 7=bool — decoded by wire type, not field number."""
    import struct

    from gdal_spark.sources.mvt import (
        _decode_value,
        _key,
        _ld,
        _value_msg,
        _varint,
        _zigzag,
    )

    # own-encoder round trips, including negative int64
    for v in [-5, 0, 7, 2**40, -(2**40), True, False, 1.5, "tag"]:
        out = _decode_value(_value_msg(v))
        assert out == v and type(out) is type(v), (v, out)
    # externally shaped messages (encoder never emits these fields)
    assert _decode_value(_key(5, 0) + _varint(7)) == 7  # uint: plain
    assert _decode_value(_key(6, 0) + _varint(_zigzag(-3))) == -3  # sint
    assert _decode_value(_key(2, 5) + struct.pack("<f", 1.5)) == 1.5  # float
    assert _decode_value(_key(3, 1) + struct.pack("<d", -2.25)) == -2.25
    assert _decode_value(_ld(1, b"abc")) == "abc"
    assert _decode_value(_key(7, 0) + _varint(1)) is True
