"""Quantify hot-cell skew handling (north rule: explicit salting + AQE).

Builds a deliberately skewed query-point set at sf0.1 — 600k points,
60% remapped into ONE index cell's extent — and runs the
point-in-polygon join three ways:

1. shuffle join, salt=0      (the naive plan: one task owns the hot cell)
2. shuffle join, salt=16 + hot_cells detection (the engine's skew path)
3. broadcast join            (what the planner picks when the polygon
                              side is dim-sized — skew-immune since the
                              probe side never shuffles on cell)

Appends measured numbers to stdout (JSON); BENCH.md records them.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from gdal_spark.operators.spatial_join import (  # noqa: E402
    hot_cells,
    point_in_polygon_join,
    with_point_cell,
)
from gdal_spark.session import get_spark  # noqa: E402
from gdal_spark.sources import synth  # noqa: E402

REP = 40
HOT_FRAC_MOD = 5  # replicas r with r % 5 < 3 (60%) remapped into the hot cell


def skewed_points(spark, sf_dir):
    p = synth.points(spark, sf_dir)
    p = p.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(REP - 1))))
    hot = F.col("_r") % HOT_FRAC_MOD < 3
    # hot cell at zoom 7: lon [0, 2.8125), lat [0, ~2.8) — remap via mod
    return p.select(
        (F.col("pt_id") * REP + F.col("_r")).alias("pt_id"),
        F.when(hot, F.pmod(F.col("lon"), F.lit(2.8))).otherwise(F.col("lon")).alias("lon"),
        F.when(hot, F.pmod(F.col("lat"), F.lit(2.7))).otherwise(F.col("lat")).alias("lat"),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    pts = skewed_points(spark, sf_dir).persist()
    n = pts.count()
    polys = synth.aoi(spark, sf_dir).persist()
    polys.count()

    res = {"n_points": n}

    t0 = time.time()
    res["rows"] = point_in_polygon_join(pts, polys, broadcast_polys=False).count()
    res["t_shuffle_unsalted"] = round(time.time() - t0, 2)

    hot = hot_cells(with_point_cell(pts), threshold=n // 20)
    res["n_hot_cells"] = len(hot)
    t0 = time.time()
    res["rows_salted"] = point_in_polygon_join(
        pts, polys, salt=16, hot=hot, broadcast_polys=False
    ).count()
    res["t_shuffle_salted"] = round(time.time() - t0, 2)

    t0 = time.time()
    res["rows_broadcast"] = point_in_polygon_join(pts, polys).count()
    res["t_broadcast"] = round(time.time() - t0, 2)

    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
