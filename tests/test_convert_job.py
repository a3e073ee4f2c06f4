"""End-to-end ogr2ogr-style conversion chain through every driver.

Reference workflow: ``apps/ogr2ogr_lib.cpp`` format conversion; the
chain test writes the same features through shp → gpkg → geojsonseq →
csv → back and asserts value equality at the end.
"""

import os
import tempfile

from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G
from jobs import convert_job as CJ


def _features(spark, n=40):
    rows = [(G.wkb_point(i * 0.5 - 10.0, i * 0.25), f"f{i}", i)
            for i in range(n)]
    return spark.createDataFrame(rows, "geom binary, name string, rank long")


def test_sniff():
    assert CJ.sniff("a.shp") == "shp"
    assert CJ.sniff("a.gpkg") == "gpkg"
    assert CJ.sniff("a.kml") == "kml"
    assert CJ.sniff("a.geojson") == "geojson"
    assert CJ.sniff("a.geojsonl") == "geojsonseq"
    assert CJ.sniff("a.csv") == "csv"
    assert CJ.sniff("a.parquet") == "parquet"


def test_conversion_chain_preserves_values(spark, capsys):
    d = tempfile.mkdtemp(prefix="convert_")
    src = os.path.join(d, "src.gpkg")
    from gdal_spark.sources import gpkg as GP

    GP.write_gpkg(_features(spark), src, "pts")

    # gpkg -> shp -> geojsonseq -> csv -> parquet
    CJ.main(["--input", src, "--output", os.path.join(d, "a.shp")])
    CJ.main(["--input", os.path.join(d, "a.shp"),
             "--output", os.path.join(d, "b_seq")])
    CJ.main(["--input", os.path.join(d, "b_seq"),
             "--output", os.path.join(d, "c_csv"),
             "--output-format", "csv",
             "--props-schema", "name string, rank long, fid long"])
    CJ.main(["--input", os.path.join(d, "c_csv"), "--input-format", "csv",
             "--output", os.path.join(d, "d.parquet"),
             "--output-format", "parquet"])

    out = spark.read.parquet(os.path.join(d, "d.parquet"))
    rows = {r.rank: r for r in out.collect()}
    assert len(rows) == 40
    g = G.parse_wkb(bytes(rows[7].geom))
    assert g.coords[0][0, 0] == 7 * 0.5 - 10.0
    assert rows[7].name == "f7"


def test_where_and_select(spark, capsys):
    d = tempfile.mkdtemp(prefix="convert_")
    src = os.path.join(d, "src.gpkg")
    from gdal_spark.sources import gpkg as GP

    GP.write_gpkg(_features(spark), src, "pts")
    CJ.main(["--input", src, "--output", os.path.join(d, "f_seq"),
             "--where", "rank >= 30", "--select", "rank"])
    from gdal_spark.sources import geojson as GJ

    back = GJ.read_geojsonseq(spark, os.path.join(d, "f_seq"), "rank long")
    vals = sorted(r.rank for r in back.collect())
    assert vals == list(range(30, 40))
    assert back.filter(F.col("geom").isNull()).count() == 0
