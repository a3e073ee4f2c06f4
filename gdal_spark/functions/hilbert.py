"""Hilbert-curve spatial ordering — ``gdal vector sort`` parity.

The reference sorts features by a 16-bit-per-axis Hilbert code over
the layer extent (``apps/gdalalg_vector_sort.cpp:351-375``; curve
``alg/hilbert.cpp``, domain scaling ``hilbert.cpp:80-92``: each axis
scaled to ``HMAX = (1<<16) - 2`` with round-to-nearest, the max value
reserved for empty geometries).

This module reimplements the *classic iterative* xy→d Hilbert
transform (the textbook rotate-and-accumulate loop — an independent
implementation, not the reference's branch-free bit-trick variant) in
three mirrored forms:

1. ``hilbert_py`` — Python scalar (test oracle).
2. ``with_hilbert`` — the loop **unrolled into 16 chained Catalyst
   projections** (one ``select`` per bit, carrying x/y/d state
   columns). Catalyst collapses the projections into a single
   whole-stage-codegen stage, so the encoding runs JVM-side with NO
   UDF and scales like any column expression.
3. ``hilbert_oracle_cte`` — the same 16 steps as chained SQL CTEs for
   the DuckDB correctness oracle (identical integer arithmetic).

Note: the classic loop and the reference's branch-free code produce
*a* Hilbert ordering each; orientation conventions differ between
variants, but the locality property (adjacent codes ⇒ adjacent cells)
— which is what the sort exists for — is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ORDER = 16
HMAX = (1 << 16) - 2  # alg/hilbert.cpp:17 (max reserved for empty)


def hilbert_py(x: int, y: int, order: int = ORDER) -> int:
    """Classic xy→d transform (rotate/flip per bit, MSB first)."""
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def scale_to_grid(v: Column, vmin: float, vmax: float) -> Column:
    """Axis value → [0, HMAX] integer (hilbert.cpp:84-90 semantics:
    round-to-nearest, zero when the domain is degenerate)."""
    if vmax == vmin:
        return F.lit(0)
    return F.round(
        (v - F.lit(vmin)) / F.lit(vmax - vmin) * F.lit(float(HMAX))
    ).cast("bigint")


def with_hilbert(
    df: DataFrame,
    x: Column,
    y: Column,
    out: str = "hilbert",
    order: int = ORDER,
) -> DataFrame:
    """Append Hilbert code of integer grid columns ``x``/``y``."""
    df = df.withColumn("_hx", x.cast("bigint")).withColumn(
        "_hy", y.cast("bigint")
    ).withColumn(out, F.lit(0).cast("bigint"))
    for i in range(order - 1, -1, -1):
        s = 1 << i
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        df = (
            df.withColumn("_rx", rx)
            .withColumn("_ry", ry)
            .withColumn(
                out,
                F.col(out)
                + F.lit(s * s)
                * (F.col("_rx") * 3).bitwiseXOR(F.col("_ry")).cast("bigint"),
            )
        )
        # rotation: when ry==0 → optional reflect (rx==1) then swap
        nx = F.when(
            F.col("_ry") == 0,
            F.when(F.col("_rx") == 1, F.lit(s - 1) - F.col("_hy")).otherwise(
                F.col("_hy")
            ),
        ).otherwise(F.col("_hx"))
        ny = F.when(
            F.col("_ry") == 0,
            F.when(F.col("_rx") == 1, F.lit(s - 1) - F.col("_hx")).otherwise(
                F.col("_hx")
            ),
        ).otherwise(F.col("_hy"))
        df = df.withColumn("_nx", nx).withColumn("_ny", ny).withColumn(
            "_hx", F.col("_nx")
        ).withColumn("_hy", F.col("_ny"))
    return df.drop("_hx", "_hy", "_rx", "_ry", "_nx", "_ny")


def hilbert_oracle_cte(
    base_cte: str,
    x_expr: str,
    y_expr: str,
    key_cols: str,
    order: int = ORDER,
) -> str:
    """DuckDB SQL computing the same code: one CTE per bit carrying
    (keys, x, y, d). ``base_cte`` must define relation ``h_base``
    with columns ``{key_cols}`` plus the raw inputs for the exprs."""
    sql = [base_cte]
    sql.append(
        f"h16 AS (SELECT {key_cols}, CAST({x_expr} AS BIGINT) AS hx, "
        f"CAST({y_expr} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM h_base)"
    )
    prev = "h16"
    for i in range(order - 1, -1, -1):
        s = 1 << i
        name = f"h{i}"
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        sql.append(
            f"""{name} AS (
  SELECT {key_cols},
         CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END) ELSE hx END AS hx,
         CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END) ELSE hy END AS hy,
         hd + CAST({s * s} AS BIGINT) * xor({rx} * 3, {ry}) AS hd
  FROM {prev})"""
        )
        prev = name
    return "WITH " + ",\n".join(sql) + f"\nSELECT {key_cols}, hd AS hilbert FROM {prev}"
