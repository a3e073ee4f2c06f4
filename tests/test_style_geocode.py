"""OGR feature-style parsing + gazetteer geocoding.

Style semantics: ogr/ogrfeaturestyle.cpp param tables (:38-89), color
sscanf (:1524-1551), unit conversion ComputeWithUnit (:1920-1978).
Geocode semantics: ogr/ogrsqlitesqlfunctions.cpp:1023,:1111 against a
local gazetteer instead of the reference's HTTP service.
"""

import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import style as S
from gdal_spark.operators.geocode import forward_geocode, reverse_geocode
from gdal_spark.operators.gnm import haversine_m_py


def _one(spark, style_str, col):
    df = spark.createDataFrame([(style_str,)], "style string").select(
        col.alias("v")
    )
    return df.collect()[0].v


def test_style_param_plain_and_quoted(spark):
    s = 'PEN(c:#FF0000,w:5px);LABEL(f:"Helvetica, Bold",s:12pt,t:"hi,there")'
    assert _one(spark, s, S.style_param("style", "PEN", "c")) == "#FF0000"
    assert _one(spark, s, S.style_param("style", "PEN", "w")) == "5px"
    assert (
        _one(spark, s, S.style_param("style", "LABEL", "f")) == "Helvetica, Bold"
    )
    assert _one(spark, s, S.style_param("style", "LABEL", "t")) == "hi,there"
    # missing tool and missing key are NULL, not empty string
    assert _one(spark, s, S.style_param("style", "BRUSH", "fc")) is None
    assert _one(spark, s, S.style_param("style", "PEN", "id")) is None


def test_style_color(spark):
    s = "x"  # unused
    c = S.style_color(F.lit("#12AB34"))
    row = (
        spark.createDataFrame([(s,)], "style string")
        .select(c.alias("c"))
        .collect()[0]
        .c
    )
    assert (row.r, row.g, row.b, row.a) == (18, 171, 52, 255)
    c8 = S.style_color(F.lit("#0000FF80"))
    row8 = (
        spark.createDataFrame([(s,)], "style string")
        .select(c8.alias("c"))
        .collect()[0]
        .c
    )
    assert (row8.r, row8.g, row8.b, row8.a) == (0, 0, 255, 128)
    bad = S.style_color(F.lit("red"))
    rowb = (
        spark.createDataFrame([(s,)], "style string")
        .select(bad.alias("c"))
        .collect()[0]
        .c
    )
    assert rowb.r is None and rowb.a is None


@pytest.mark.parametrize(
    "txt,want",
    [
        ("5px", 5.0 / (72.0 * 39.37)),
        ("12pt", 12.0 / (72.0 * 39.37)),
        ("3mm", 0.003),
        ("2cm", 0.02),
        ("1in", 1.0 / 39.37),
        ("7", 0.007),  # default unit is MM (ogr_featurestyle.h:161)
    ],
)
def test_style_num_units(spark, txt, want):
    got = (
        spark.createDataFrame([(txt,)], "v string")
        .select(S.style_num_m(F.col("v")).alias("m"))
        .collect()[0]
        .m
    )
    assert got == pytest.approx(want, rel=1e-12)


def test_reverse_geocode_nearest(spark):
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 10.0, 10.0)], "pt_id long, lon double, lat double"
    )
    places = spark.createDataFrame(
        [(0, "A", 0.5, 0.5), (1, "B", 9.0, 9.0)],
        "place_id long, place string, lon double, lat double",
    )
    got = {r.pt_id: (r.place, r.dist_m) for r in reverse_geocode(pts, places).collect()}
    assert got[1][0] == "A" and got[2][0] == "B"
    assert got[1][1] == haversine_m_py(0.0, 0.0, 0.5, 0.5)
    assert got[2][1] == haversine_m_py(10.0, 10.0, 9.0, 9.0)


def test_reverse_geocode_tie_breaks_on_place_id(spark):
    # two places at the mm-snapped identical distance: smaller id wins
    pts = spark.createDataFrame([(1, 0.0, 0.0)], "pt_id long, lon double, lat double")
    places = spark.createDataFrame(
        [(7, "E", 1.0, 0.0), (3, "W", -1.0, 0.0)],
        "place_id long, place string, lon double, lat double",
    )
    got = reverse_geocode(pts, places).collect()[0]
    assert got.place == "W"


def test_forward_geocode(spark):
    names = spark.createDataFrame([("A",), ("nowhere",)], "place string")
    places = spark.createDataFrame(
        [(0, "A", 0.5, 0.5)], "place_id long, place string, lon double, lat double"
    )
    got = {r.place: (r.lon, r.lat) for r in forward_geocode(names, places).collect()}
    assert got["A"] == (0.5, 0.5)
    assert got["nowhere"] == (None, None)
