"""GeoParquet 1.0 source/sink — WKB geometry columns with the ``geo``
file metadata.

Reference: ``ogr/ogrsf_frmts/parquet/`` (ogrparquetwriterdataset.cpp
writes the ``geo`` key per the public GeoParquet 1.0.0 spec:
version / primary_column / per-column encoding "WKB",
geometry_types, bbox, optional crs). Spark's parquet writer cannot
attach custom footer key-value metadata, so the sink is a
per-partition pyarrow write (same part-file layout Spark produces;
``spark.read.parquet`` reads it back unchanged) with the ``geo``
metadata embedded in every part footer — exactly how multi-file
GeoParquet datasets ship in practice.

Scale shape: the bbox is ONE aggregate over lon/lat bounds (map-side
combinable; computed from the WKB in an Arrow pass when bbox columns
are absent), then the write is embarrassingly parallel — each task
writes its own part file with the shared footer.
"""

from __future__ import annotations

import json
import os
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G

GEO_VERSION = "1.0.0"


def _geom_bbox_cols(df: DataFrame, geom_col: str) -> DataFrame:
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", _gx0 double, _gy0 double, _gx1 double, _gy1 double"

    def gen(it):
        for pdf in it:
            boxes = [
                G.geom_bbox(G.parse_wkb(bytes(b)))
                if b is not None
                else (None, None, None, None)
                for b in pdf[geom_col]
            ]
            pdf = pdf.copy()
            pdf["_gx0"] = [b[0] for b in boxes]
            pdf["_gy0"] = [b[1] for b in boxes]
            pdf["_gx1"] = [b[2] for b in boxes]
            pdf["_gy1"] = [b[3] for b in boxes]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def geo_metadata(
    geom_col: str,
    bbox: list[float],
    geometry_types: list[str] | None = None,
) -> dict:
    """The ``geo`` metadata object per the GeoParquet 1.0.0 spec."""
    return {
        "version": GEO_VERSION,
        "primary_column": geom_col,
        "columns": {
            geom_col: {
                "encoding": "WKB",
                "geometry_types": geometry_types or [],
                "bbox": bbox,
            }
        },
    }


def write_geoparquet(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    geometry_types: list[str] | None = None,
) -> dict:
    """Distributed GeoParquet write: directory of part files, each
    footer carrying the ``geo`` key. Returns the metadata written."""
    with_box = _geom_bbox_cols(df, geom_col)
    agg = with_box.agg(
        F.min("_gx0").alias("x0"),
        F.min("_gy0").alias("y0"),
        F.max("_gx1").alias("x1"),
        F.max("_gy1").alias("y1"),
    ).collect()[0]
    if agg.x0 is None:
        raise ValueError(
            "write_geoparquet: cannot compute the 'geo' bbox — the frame is "
            f"empty or every value in geometry column {geom_col!r} is NULL"
        )
    bbox = [float(agg.x0), float(agg.y0), float(agg.x1), float(agg.y1)]
    meta = geo_metadata(geom_col, bbox, geometry_types)
    meta_json = json.dumps(meta, sort_keys=True)
    os.makedirs(path, exist_ok=True)
    cols = df.columns

    def write_part(it):
        import pyarrow as pa
        import pyarrow.parquet as pq

        frames = [pdf for pdf in it]
        if frames:
            table = pa.Table.from_pandas(
                pd.concat(frames, ignore_index=True)[cols], preserve_index=False
            )
            existing = table.schema.metadata or {}
            table = table.replace_schema_metadata(
                {**existing, b"geo": meta_json.encode("utf-8")}
            )
            fname = os.path.join(path, f"part-{uuid.uuid4().hex}.parquet")
            pq.write_table(table, fname)
        yield pd.DataFrame({"n": [sum(len(f) for f in frames)]})

    df.mapInPandas(write_part, schema="n long").count()
    return meta


def read_geo_metadata(path: str) -> dict:
    """Parse the ``geo`` footer key from the first part file."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
        if not parts:
            raise ValueError(
                f"read_geo_metadata: no .parquet part files under {path}"
            )
        target = os.path.join(path, parts[0])
    else:
        target = path
    md = pq.read_schema(target).metadata or {}
    if b"geo" not in md:
        raise ValueError(f"{target} has no GeoParquet 'geo' metadata")
    return json.loads(md[b"geo"].decode("utf-8"))


def read_geoparquet(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """(DataFrame, geo metadata). The data path is a plain distributed
    parquet scan — predicate pushdown/column pruning intact."""
    return spark.read.parquet(path), read_geo_metadata(path)
