"""Zonal statistics: polygon × point-value aggregation.

Mirrors ``alg/zonal.cpp`` (the full stat-name list :661-695 — count,
min, max, mean, median, mode, stdev, variance, sum, minority,
variety, unique, center_x, center_y) re-expressed as the spatial join
(operators/spatial_join.py) followed by a groupBy — Catalyst's
partial+final HashAggregate replaces the reference's streaming
per-polygon accumulators.

``mode``/``minority`` (most/least frequent value; ties broken by the
smaller value, deterministic under shuffle) need a per-(zone, value)
count first — ``zonal_stats_full`` runs that second aggregation and
joins it back; the plain moment/extreme stats stay one aggregation.
``center_x/center_y`` are the mean coordinates of the points in the
zone (the reference's pixel-centroid of the zone coverage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gdal_spark.operators.spatial_join import point_in_polygon_join

STAT_EXPRS = {
    "count": lambda c: F.count(c).alias("count_v"),
    "min": lambda c: F.min(c).alias("min_v"),
    "max": lambda c: F.max(c).alias("max_v"),
    "mean": lambda c: F.avg(c).alias("mean_v"),
    "median": lambda c: F.expr(f"percentile({c}, 0.5)").alias("median_v"),
    "stdev": lambda c: F.stddev_pop(c).alias("stdev_v"),
    "variance": lambda c: F.var_pop(c).alias("variance_v"),
    "sum": lambda c: F.sum(c).alias("sum_v"),
    "variety": lambda c: F.countDistinct(c).alias("variety_v"),
    "unique": lambda c: F.countDistinct(c).alias("unique_v"),
}


def zonal_stats(
    points: DataFrame,
    polys: DataFrame,
    value_col: str,
    poly_key: str = "poly_id",
    stats: tuple = ("count", "min", "max", "mean", "sum"),
    **join_kwargs,
) -> DataFrame:
    joined = point_in_polygon_join(points, polys, **join_kwargs)
    aggs = [STAT_EXPRS[s](value_col) for s in stats]
    return joined.groupBy(poly_key).agg(*aggs)


def zonal_stats_full(
    points: DataFrame,
    polys: DataFrame,
    value_col: str,
    poly_key: str = "poly_id",
    lon: str = "lon",
    lat: str = "lat",
    **join_kwargs,
) -> DataFrame:
    """Every ``alg/zonal.cpp`` stat in one result row per zone:
    count/min/max/mean/median/stdev/variance/sum/variety plus
    mode/minority (value-frequency ranking, smaller value on ties)
    and center_x/center_y (mean point coordinates)."""
    joined = point_in_polygon_join(points, polys, lon=lon, lat=lat, **join_kwargs)
    c = F.col(value_col)
    base = joined.groupBy(poly_key).agg(
        F.count(c).alias("count_v"),
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        F.avg(c).alias("mean_v"),
        F.expr(f"percentile({value_col}, 0.5)").alias("median_v"),
        F.stddev_pop(c).alias("stdev_v"),
        F.var_pop(c).alias("variance_v"),
        F.sum(c).alias("sum_v"),
        F.countDistinct(c).alias("variety_v"),
        F.avg(lon).alias("center_x"),
        F.avg(lat).alias("center_y"),
    )
    freq = joined.groupBy(poly_key, value_col).agg(F.count("*").alias("_n"))
    w_mode = Window.partitionBy(poly_key).orderBy(
        F.col("_n").desc(), F.col(value_col).asc()
    )
    w_mino = Window.partitionBy(poly_key).orderBy(
        F.col("_n").asc(), F.col(value_col).asc()
    )
    mode = (
        freq.withColumn("_r", F.row_number().over(w_mode))
        .filter(F.col("_r") == 1)
        .select(poly_key, F.col(value_col).alias("mode_v"))
    )
    minority = (
        freq.withColumn("_r", F.row_number().over(w_mino))
        .filter(F.col("_r") == 1)
        .select(poly_key, F.col(value_col).alias("minority_v"))
    )
    return base.join(mode, poly_key).join(minority, poly_key)
