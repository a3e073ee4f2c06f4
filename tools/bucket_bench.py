"""Co-located (bucketed) spatial join evidence.

SCALE.md claims that at 10¹²-row scale — where the polygon side is no
longer broadcastable — pre-bucketing BOTH sides by the index cell in
the table layout turns the cell equi-join into a shuffle-free
co-located join. This script demonstrates it concretely on sf0.1:

1. writes the exploded footprint-cell and AOI-cell tables with
   ``bucketBy(N, "cell")`` + ``sortBy("cell")`` into a local
   warehouse (the Iceberg ``bucket(N, cell)`` partition-transform
   analogue Spark can express without a catalog),
2. joins them bucketed vs unbucketed,
3. asserts identical row counts and prints both wall times AND the
   Exchange-operator count from `.explain` — the bucketed plan must
   contain NO shuffle on the join key.

Usage: python tools/bucket_bench.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdal_spark.session import get_spark  # noqa: E402

WAREHOUSE = "/tmp/gdal_spark_bucket_wh"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    shutil.rmtree(WAREHOUSE, ignore_errors=True)
    spark = get_spark(
        "bucket-bench",
        extra_conf={
            "spark.sql.warehouse.dir": WAREHOUSE,
            # force the non-broadcast path: this experiment is about
            # the large-dim case where broadcast is impossible
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.sources.bucketing.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from gdal_spark.operators.spatial_join import explode_bbox_cells
    from gdal_spark.plans.inspect import formatted_plan
    from gdal_spark.sources import synth

    fp = explode_bbox_cells(
        synth.footprints(spark, sf_dir).select(
            "image_id", "lon_min", "lat_min", "lon_max", "lat_max"
        )
    ).select("image_id", "cell")
    aoi = explode_bbox_cells(synth.aoi(spark, sf_dir, with_wkb=False)).select(
        "poly_id", "cell"
    )

    n_buckets = 32
    spark.sql("DROP TABLE IF EXISTS fp_b")
    spark.sql("DROP TABLE IF EXISTS aoi_b")
    fp.write.bucketBy(n_buckets, "cell").sortBy("cell").saveAsTable("fp_b")
    aoi.write.bucketBy(n_buckets, "cell").sortBy("cell").saveAsTable("aoi_b")

    fp_b = spark.table("fp_b")
    aoi_b = spark.table("aoi_b")

    def run(left, right, label):
        j = left.join(right, "cell")
        plan = formatted_plan(j)
        n_exchange = plan.count("Exchange")
        t0 = time.time()
        n = j.count()
        t1 = time.time()
        # steady state (scan caches warm)
        t0b = time.time()
        j.count()
        t = min(t1 - t0, time.time() - t0b)
        print(f"{label}: rows={n} wall={t:.2f}s exchanges_in_plan={n_exchange}")
        return n, n_exchange, t

    n1, ex1, t1 = run(fp, aoi, "unbucketed (shuffle join)")
    n2, ex2, t2 = run(fp_b, aoi_b, "bucketed   (co-located)")
    assert n1 == n2, "bucketed join changed the result!"
    assert ex2 < ex1, "bucketed plan should drop the join-key Exchange"
    print(
        f"co-located join removes {ex1 - ex2} Exchange(s); "
        f"wall {t1:.2f}s -> {t2:.2f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
