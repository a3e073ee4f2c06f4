"""Saved / streamed-algorithm plans — the ``.gdalg.json`` analogue.

The reference's ``gdalg`` driver (``frmts/gdalg/gdalgdriver.cpp:
190-218``, ``"gdal_streamed_alg"``) stores a serialized command line
and lazily re-executes it when the dataset is opened. The Spark
equivalent of "a dataset that IS a pipeline" is a serialized logical
plan: a JSON spec of source + transformation steps that rebuilds the
same lazy DataFrame in any session.

Supported steps mirror the ``gdal vector pipeline`` step set that is
pure-DataFrame (read/filter/select/sql-expression/sort/limit/
reproject); geometry-kernel steps (buffer/segmentize/…) can be added
by name since every operator in the package is importable by path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPEC_VERSION = 1

_SOURCES = {
    # name -> callable(spark, sf_dir) (lazy layer constructors)
    "footprints": lambda spark, sf: __import__(
        "gdal_spark.sources.synth", fromlist=["footprints"]
    ).footprints(spark, sf),
    "aoi": lambda spark, sf: __import__(
        "gdal_spark.sources.synth", fromlist=["aoi"]
    ).aoi(spark, sf),
    "points": lambda spark, sf: __import__(
        "gdal_spark.sources.synth", fromlist=["points"]
    ).points(spark, sf),
}


def make_spec(source: str, steps: list[dict]) -> dict:
    return {"version": SPEC_VERSION, "type": "gdal_spark_streamed_alg",
            "source": source, "steps": steps}


def dumps(spec: dict) -> str:
    return json.dumps(spec, sort_keys=True)


def loads(text: str) -> dict:
    spec = json.loads(text)
    if spec.get("type") != "gdal_spark_streamed_alg":
        raise ValueError("not a gdal_spark saved plan")
    if spec.get("version") != SPEC_VERSION:
        raise ValueError(f"unsupported plan version {spec.get('version')}")
    return spec


def apply_plan(spark: SparkSession, sf_dir: str, spec: dict) -> DataFrame:
    """Rebuild the lazy DataFrame a saved plan describes."""
    if spec["source"].startswith("parquet:"):
        df = spark.read.parquet(f"{sf_dir}/{spec['source'][8:]}.parquet")
    else:
        df = _SOURCES[spec["source"]](spark, sf_dir)
    for step in spec["steps"]:
        op = step["op"]
        if op == "filter":
            df = df.filter(step["expr"])
        elif op == "select":
            df = df.selectExpr(*step["exprs"])
        elif op == "with_column":
            df = df.withColumn(step["name"], F.expr(step["expr"]))
        elif op == "sort":
            cols = [
                F.col(c["col"]).desc() if c.get("desc") else F.col(c["col"]).asc()
                for c in step["cols"]
            ]
            df = df.orderBy(*cols)
        elif op == "limit":
            df = df.limit(int(step["n"]))
        elif op == "drop":
            df = df.drop(*step["cols"])
        elif op == "reproject":
            from gdal_spark.functions.srs import reproject_cols

            df = reproject_cols(
                df, int(step["src_epsg"]), int(step["dst_epsg"]),
                step.get("x", "lon"), step.get("y", "lat"),
            )
        else:
            raise ValueError(f"unknown plan step {op!r}")
    return df
