"""gdalinfo / ogrinfo analogues — metadata reports without payload
decode.

Reference surfaces:

- ``ogrinfo -so -al`` (``apps/ogrinfo_lib.cpp``): feature count
  (``OGRLayer::GetFeatureCount``), layer extent
  (``OGRLayer::GetExtent`` force-scan), field list with summary
  stats. Here: ONE JVM-side aggregate over the layer — map-side
  partial agg, no shuffle beyond the final single-row combine, so a
  100 TB layer summarizes at full scan bandwidth.
- ``gdalinfo`` (``apps/gdalinfo_lib.cpp``): driver identify + raster
  size/band count read from HEADERS only (each driver's ``Identify``
  + capabilities probe; no ``IRasterIO``). Here:
  :func:`raster_headers` sniffs the leading bytes per image inside an
  Arrow batch — at 100 TB this is a metadata-catalog scan, not a
  corpus decode. (On a real lake the ``bytes`` column read itself is
  the cost; with parquet/Iceberg a range-read of the first KB per
  blob — or a persisted header-stats column — keeps this scan
  byte-proportional to images, not pixels.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster.codec import sniff_info

_HEADER_SCHEMA = "image_id string, driver string, width int, height int, bands int"


def raster_headers(imgs: DataFrame) -> DataFrame:
    """Per-image ``(driver, width, height, bands)`` from header bytes
    only — the gdalinfo identify+size probe as a map-only Arrow pass."""

    def gen(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                drv, w, h, bands = sniff_info(r.bytes)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "driver": drv,
                        "width": w,
                        "height": h,
                        "bands": bands,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "driver", "width", "height", "bands"]
            )

    return imgs.select("image_id", "bytes").mapInPandas(gen, _HEADER_SCHEMA)


def layer_summary(
    df: DataFrame,
    bbox=("lon_min", "lat_min", "lon_max", "lat_max"),
    fields: tuple[str, ...] = (),
) -> DataFrame:
    """``ogrinfo -so`` one-row layer report: feature count, layer
    extent, and per-field NULL + distinct counts. Single ``agg`` —
    Catalyst compiles every stat into one partial-aggregate pass."""
    aggs = [
        F.count(F.lit(1)).alias("feature_count"),
        F.min(bbox[0]).alias("ext_lon_min"),
        F.min(bbox[1]).alias("ext_lat_min"),
        F.max(bbox[2]).alias("ext_lon_max"),
        F.max(bbox[3]).alias("ext_lat_max"),
    ]
    for f in fields:
        aggs.append(
            F.sum(F.when(F.col(f).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"null_{f}")
        )
        aggs.append(F.countDistinct(f).cast("long").alias(f"distinct_{f}"))
    return df.agg(*aggs)
