"""Two-cluster-size scaling evidence (north rule).

The rule requires ≥0.8 throughput scaling efficiency from N to 4N
executors. No real cluster exists in this sandbox, so per the driver
instruction we run the identical job at two parallelism levels —
local[8] and local[32] — in separate processes (fresh JVM each, so
no warm-cache bleed) and report images/sec at both plus

    efficiency = (thr_32 / thr_8) / (32 / 8)

Workload phases (sf0.1 by default):
- join+tiles : bbox spatial join of all image footprints against the
  AOI layer + z12 tile assignment (shuffle/join-bound path)
- pixel      : decode + GDAL checksum over a 7.5k-image sample
  (embarrassingly parallel Arrow-UDF path)

Writes/updates the table in BENCH.md.

Usage: python tools/scaling_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, ".")
from gdal_spark.session import get_spark
from gdal_spark.operators.spatial_join import bbox_intersection_join
from gdal_spark.raster import tiler
from gdal_spark.raster import pipeline as rp
from gdal_spark.sources import synth

cpus, sf_dir = sys.argv[1], sys.argv[2]
spark = get_spark("scale-bench", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")

# warmup: spin executors + JIT on the tiny sf
wfp = synth.footprints(spark, "/root/testdata/sf0.001")
bbox_intersection_join(
    wfp.select("image_id", "lon_min", "lat_min", "lon_max", "lat_max"),
    synth.aoi(spark, "/root/testdata/sf0.001"),
).count()
rp.with_checksums(synth.images(spark, "/root/testdata/sf0.001", where="okey % 100 = 0")).count()

fp = synth.footprints(spark, sf_dir)
n_images = fp.count()

t0 = time.time()
n_join = bbox_intersection_join(
    fp.select("image_id", "lon_min", "lat_min", "lon_max", "lat_max"),
    synth.aoi(spark, sf_dir),
).count()
n_tiles = tiler.assign_tiles(fp, 12).count()
t_join = time.time() - t0

t0 = time.time()
n_cs = rp.with_checksums(synth.images(spark, sf_dir, where="okey % 20 = 0")).count()
t_pixel = time.time() - t0

print(json.dumps({
    "cpus": int(cpus), "n_images": n_images, "n_join": n_join,
    "n_tiles": n_tiles, "n_cs": n_cs,
    "t_join": t_join, "t_pixel": t_pixel,
    "thr_join": n_images / t_join, "thr_pixel": n_cs / t_pixel,
}))
spark.stop()
"""


def run_at(cpus: int, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), sf_dir],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not line:
        print(out.stdout, out.stderr[-3000:], sep="\n---\n")
        raise SystemExit(f"child local[{cpus}] failed")
    return json.loads(line[-1])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    r8 = run_at(8, sf_dir)
    r32 = run_at(32, sf_dir)
    eff_join = (r32["thr_join"] / r8["thr_join"]) / 4.0
    eff_pixel = (r32["thr_pixel"] / r8["thr_pixel"]) / 4.0
    result = {
        "sf_dir": sf_dir,
        "local8": r8,
        "local32": r32,
        "efficiency_join_tiles": round(eff_join, 3),
        "efficiency_pixel": round(eff_pixel, 3),
    }
    print(json.dumps(result, indent=2))
    with open("SCALING.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
