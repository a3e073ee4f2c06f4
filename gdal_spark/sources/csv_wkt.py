"""OGR CSV driver semantics over Spark's native CSV source.

The reference's CSV driver (``ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp``,
``ogrcsvdatasource.cpp``) reads/writes features as delimited text with
three geometry conventions this module reproduces:

- **AS_WKT**: a ``WKT`` geometry column (write option ``GEOMETRY=AS_WKT``
  puts it first; read auto-detects via GEOM_POSSIBLE_NAMES).
- **X/Y fields**: point layers from numeric columns
  (``X_POSSIBLE_NAMES``/``Y_POSSIBLE_NAMES``).
- **.csvt sidecar**: per-column type declarations
  (``ogrcsvlayer.cpp`` OGRCSVReadParseFieldTypes) — written so a
  round-trip restores Integer64/Real/String instead of all-strings.

Spark-first: the heavy lifting IS ``spark.read/write.csv`` — CSV is
newline-splittable, so reads and writes are fully distributed; this
module only adds the OGR conventions (WKT column placement, .csvt
emission/consumption, X/Y point assembly) plus WKT⇄WKB conversion
through the repo codec. No per-row Python outside the existing
ST_GeomFromText / ST_AsText Arrow UDFs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SPARK_TO_CSVT = {
    "tinyint": "Integer", "smallint": "Integer", "int": "Integer",
    "bigint": "Integer64", "long": "Integer64",
    "float": "Real", "double": "Real",
    "boolean": "Integer(Boolean)", "date": "Date", "timestamp": "DateTime",
}
_CSVT_TO_SPARK = {
    "Integer": "int", "Integer64": "long", "Real": "double",
    "Integer(Boolean)": "boolean", "Date": "date", "DateTime": "timestamp",
    "String": "string", "WKT": "string",
}


def write_csv_features(df: DataFrame, path: str,
                       geom_col: str = "geom") -> None:
    """GEOMETRY=AS_WKT writer: WKT column first (the reference's
    column order, ogrcsvlayer.cpp ICreateFeature), distributed
    part-file write, plus one tiny .csvt sidecar per the spec."""
    from gdal_spark.functions.st import register_st_functions

    register_st_functions(df.sparkSession)
    attr = [(c, t) for c, t in df.dtypes if c != geom_col]
    out = df.select(
        F.expr(f"ST_AsText({geom_col})").alias("WKT"),
        *[F.col(c) for c, _ in attr])
    out.write.mode("overwrite").option("header", True).option(
        "emptyValue", "").csv(path)
    types = ["WKT"] + [_SPARK_TO_CSVT.get(t, "String") for _, t in attr]
    # sidecar NEXT TO the dataset (not inside: the csv scan globs the
    # directory), matching the reference's foo.csv + foo.csvt pairing
    with open(path.rstrip("/") + ".csvt", "w") as f:
        f.write(",".join(f'"{t}"' for t in types) + "\n")


def read_csv_features(spark: SparkSession, path: str,
                      wkt_col: str | None = None,
                      x_col: str | None = None,
                      y_col: str | None = None) -> DataFrame:
    """CSV feature read. Geometry comes from ``wkt_col`` (default:
    auto-detect GEOM_POSSIBLE_NAMES ``WKT``/``geometry``/``geom``) or,
    when ``x_col``/``y_col`` are given, assembled points (the
    X_POSSIBLE_NAMES path). A ``types.csvt`` sidecar, if present,
    types the columns; otherwise Spark's schema inference runs (the
    reference scans rows to guess types the same way)."""
    from gdal_spark.functions.st import register_st_functions

    register_st_functions(spark)
    csvt = (path.rstrip("/") + ".csvt") if os.path.isdir(path) else (
        os.path.splitext(path)[0] + ".csvt")
    reader = spark.read.option("header", True)
    declared = None
    if os.path.exists(csvt):
        declared = [t.strip().strip('"') for t in
                    open(csvt).read().strip().split(",")]
        header_df = reader.csv(path)
        names = header_df.columns
        ddl = ", ".join(
            f"`{n}` {_CSVT_TO_SPARK.get(t, 'string')}"
            for n, t in zip(names, declared))
        df = reader.schema(ddl).csv(path)
    else:
        df = reader.option("inferSchema", True).csv(path)

    if x_col and y_col:
        return df.withColumn(
            "geom", F.expr(f"ST_MakePoint(`{x_col}`, `{y_col}`)"))
    if wkt_col is None:
        for cand in ("WKT", "wkt", "geometry", "geom", "_WKT"):
            if cand in df.columns:
                wkt_col = cand
                break
    if wkt_col is None:
        return df
    return df.withColumn(
        "geom", F.expr(f"ST_GeomFromText(`{wkt_col}`)")).drop(wkt_col)
