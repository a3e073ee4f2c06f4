"""OGR SQL join semantics (``ogr/ogrsf_frmts/generic/ogr_gensql.cpp``).

OGR's ``SELECT ... FROM a LEFT JOIN b ON a.k = b.k`` is NOT a SQL left
join: it emits **exactly one output row per primary row**, pairing it
with the FIRST matching secondary feature in FID order
(``doc/source/user/ogr_sql_dialect.rst:508-513``; per-row index
nested-loop fetch at ``ogr_gensql.cpp:1516-1546``).

Re-expressed for Spark: deterministically dedup the secondary to its
first row per key (``row_number() over (partition by key order by
fid) = 1``) and broadcast/hash left-join — Catalyst picks the
strategy; the semantics stay order-independent under shuffle because
the FID order is explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_match_left_join(
    primary: DataFrame,
    secondary: DataFrame,
    left_on: str,
    right_on: str,
    secondary_fid: str | list[str],
    prefix: str = "",
) -> DataFrame:
    """OGR-semantics LEFT JOIN: one row per primary row, first matching
    secondary row by ``secondary_fid`` order, NULL-padded when no match.
    ``secondary_fid`` may be a list of columns — the FID order MUST be a
    total order per key or results are shuffle-nondeterministic (the
    order-dependence hazard called out in SURVEY.md §7).
    ``prefix`` renames secondary columns (OGR prefixes with the table
    name, e.g. ``idlink.name``)."""
    fids = [secondary_fid] if isinstance(secondary_fid, str) else list(secondary_fid)
    w = Window.partitionBy(right_on).orderBy(*[F.col(c).asc() for c in fids])
    first = (
        secondary.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if prefix:
        for c in first.columns:
            first = first.withColumnRenamed(c, f"{prefix}{c}")
        right_on = f"{prefix}{right_on}"
    cond = primary[left_on] == first[right_on]
    # no broadcast hint: the deduped secondary is one row per DISTINCT
    # key — for a key like orderkey that is the primary's cardinality,
    # and a forced broadcast would OOM at 100× scale. Catalyst/AQE
    # picks broadcast automatically when the build side is small.
    return primary.join(first, cond, "left").drop(first[right_on])


def summary_aggregates(df: DataFrame, column: str) -> DataFrame:
    """OGR SQL summary mode (``SWQM_SUMMARY_RECORD``, ogr/ogr_swq.h:320;
    accumulators :372-394): whole-table MIN/MAX/COUNT/SUM/AVG/STDDEV in
    one record. Spark's partial+final HashAggregate replaces the
    single-pass Kahan/Welford accumulators."""
    c = F.col(column)
    return df.agg(
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        F.count(c).alias("count_v"),
        F.sum(c).alias("sum_v"),
        F.avg(c).alias("avg_v"),
        F.stddev_pop(c).alias("stddev_pop_v"),
        F.stddev_samp(c).alias("stddev_samp_v"),
    )
