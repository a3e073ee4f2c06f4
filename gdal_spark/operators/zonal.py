"""Zonal statistics: polygon × point-value aggregation.

Mirrors ``alg/zonal.cpp`` (stat names :661-695 — count, min, max,
mean, median, stdev, variance, sum, variety) re-expressed as the
spatial join (operators/spatial_join.py) followed by a groupBy —
Catalyst's partial+final HashAggregate replaces the reference's
streaming per-polygon accumulators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
