"""Deterministic synthetic geo/image layers (FIXTURES.md schemas).

Two families:

1. **Oracle-parity layers** derived from the driver's TPC-H-ish parquet
   with *integer-only arithmetic followed by one exact float divide*, so
   the same SQL evaluated by DuckDB produces bit-identical doubles.
   These power the driver's CORRECTNESS gate (``__spark_entry__``):

   - ``points``  ← customer  (pt_id, lon, lat)
   - ``sites``   ← supplier×part (site_id, lon, lat) — kNN method side
   - ``aoi``     ← nation    (poly_id, name, lon_min/max, lat_min/max)
     rectangles with deliberate gaps (some points match nothing) and
     one oversized "hot" polygon (skew path).
   - ``footprints`` ← orders (image_id, lon/lat bbox 0.01°, w, h, fmt)

2. **Pixel-bearing images table** per ``BASELINE.json input_hint``
   (image_id, bytes, w, h, fmt, caption, phash) — generated inside
   ``mapInPandas`` (deterministic per image_id), used by pytest and
   bench for decode/translate/warp/tile tests.

The lon/lat rules mirror FIXTURES.md §1 (hash-scatter over
[-180,180)×[-85,85)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G
from gdal_spark.raster import codec

# integer scatter constants (primes; any would do, these are pinned)
LON_MUL = 9973
LAT_MUL = 7919
SITE_LON_MUL = 104729
SITE_LAT_MUL = 1299709

# AOI grid: 5×4 rectangles with gaps, from n_nationkey 0..19;
# nationkey 20 = the oversized hot polygon; 21-24 small jittered boxes.
AOI_COLS = 5
AOI_ROWS = 4
AOI_CELL_W = 72.0  # world width 360 / 5
AOI_CELL_H = 42.0  # 168 / 4 (within ±85 safety)
AOI_W = 54.0  # rect width < cell width → gaps
AOI_H = 30.0


def _scatter_sql(key: str, mul: int, mod: int, div: float, base: float) -> str:
    """SQL text valid in BOTH Spark SQL and DuckDB.

    Literals are CAST to DOUBLE: Spark types bare decimal literals as
    DECIMAL and would evaluate the whole expression in exact decimal
    arithmetic, producing doubles 1 ulp apart from DuckDB's
    double-typed evaluation. With both engines in DOUBLE the IEEE op
    sequence (int remainder → one divide → one add) is bit-identical."""
    return f"(CAST({base} AS DOUBLE) + (({key} * {mul}) % {mod}) / CAST({div} AS DOUBLE))"


POINT_LON_SQL = _scatter_sql("c_custkey", LON_MUL, 360000, 1000.0, -180.0)
POINT_LAT_SQL = _scatter_sql("c_custkey", LAT_MUL, 170000, 1000.0, -85.0)
SITE_LON_SQL = _scatter_sql("s_key", SITE_LON_MUL, 360000, 1000.0, -180.0)
SITE_LAT_SQL = _scatter_sql("s_key", SITE_LAT_MUL, 170000, 1000.0, -85.0)
FOOT_LON_SQL = _scatter_sql("o_orderkey", LON_MUL, 359000, 1000.0, -179.5)
FOOT_LAT_SQL = _scatter_sql("o_orderkey", LAT_MUL, 169000, 1000.0, -84.5)


def _spread(df: DataFrame) -> DataFrame:
    """Single-file parquet reads arrive as ONE partition; a real image
    table is a many-file Iceberg scan. Spread so downstream pandas-UDF
    refines/renders parallelize the way they would on a cluster."""
    target = df.sparkSession.sparkContext.defaultParallelism * 2
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query points from ``customer`` (FIXTURES.md §3)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return _spread(c.select(
        F.col("c_custkey").alias("pt_id"),
        F.expr(POINT_LON_SQL).alias("lon"),
        F.expr(POINT_LAT_SQL).alias("lat"),
    ))


def sites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN method-side points from ``part`` (site_id = p_partkey)."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    return p.select(F.col("p_partkey").alias("s_key")).select(
        F.col("s_key").alias("site_id"),
        F.expr(SITE_LON_SQL).alias("lon"),
        F.expr(SITE_LAT_SQL).alias("lat"),
    )


def aoi_sql_bounds(nationkey: int):
    """Python-side mirror of the AOI rectangle rule (for tests)."""
    if nationkey == 20:  # hot oversized polygon (skew fixture)
        return (-60.0, -30.0, 60.0, 30.0)
    if nationkey > 20:
        k = nationkey - 21
        return (10.0 * k + 1.0, -80.0 + 5.0 * k, 10.0 * k + 9.0, -70.0 + 5.0 * k)
    col = nationkey % AOI_COLS
    row = nationkey // AOI_COLS
    lon_min = -180.0 + col * AOI_CELL_W + 9.0
    lat_min = -84.0 + row * AOI_CELL_H + 6.0
    return (lon_min, lat_min, lon_min + AOI_W, lat_min + AOI_H)


# SQL CASE expressing the same bounds — valid in Spark SQL and DuckDB.
# Outer CAST AS DOUBLE: every branch value is an exact small decimal,
# so decimal→double conversion equals DuckDB's double arithmetic.
AOI_LON_MIN_SQL = (
    "CAST(CASE WHEN n_nationkey = 20 THEN -60.0"
    " WHEN n_nationkey > 20 THEN 10.0 * (n_nationkey - 21) + 1.0"
    " ELSE -180.0 + (n_nationkey % 5) * 72.0 + 9.0 END AS DOUBLE)"
)
AOI_LAT_MIN_SQL = (
    "CAST(CASE WHEN n_nationkey = 20 THEN -30.0"
    " WHEN n_nationkey > 20 THEN -80.0 + 5.0 * (n_nationkey - 21)"
    " ELSE -84.0 + FLOOR(n_nationkey / 5) * 42.0 + 6.0 END AS DOUBLE)"
)  # FLOOR, not CAST AS INT: DuckDB rounds on float→int cast, Spark truncates
AOI_LON_MAX_SQL = (
    "CAST(CASE WHEN n_nationkey = 20 THEN 60.0"
    " WHEN n_nationkey > 20 THEN 10.0 * (n_nationkey - 21) + 9.0"
    " ELSE -180.0 + (n_nationkey % 5) * 72.0 + 9.0 + 54.0 END AS DOUBLE)"
)
AOI_LAT_MAX_SQL = (
    "CAST(CASE WHEN n_nationkey = 20 THEN 30.0"
    " WHEN n_nationkey > 20 THEN -70.0 + 5.0 * (n_nationkey - 21)"
    " ELSE -84.0 + FLOOR(n_nationkey / 5) * 42.0 + 6.0 + 30.0 END AS DOUBLE)"
)


def aoi(spark: SparkSession, sf_dir: str, with_wkb: bool = True) -> DataFrame:
    """AOI polygon layer from ``nation`` (FIXTURES.md §2): rectangles +
    one hot oversized polygon; WKB geometry column built per-batch."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    df = n.select(
        F.col("n_nationkey").cast("long").alias("poly_id"),
        F.concat(F.lit("aoi_"), F.col("n_nationkey").cast("string")).alias("name"),
        F.element_at(
            F.array(F.lit("admin"), F.lit("park"), F.lit("water"), F.lit("urban")),
            (F.col("n_nationkey") % 4 + 1).cast("int"),
        ).alias("category"),
        (F.col("n_nationkey") * 104729 % 1000000).cast("long").alias("population"),
        F.expr(AOI_LON_MIN_SQL).alias("lon_min"),
        F.expr(AOI_LAT_MIN_SQL).alias("lat_min"),
        F.expr(AOI_LON_MAX_SQL).alias("lon_max"),
        F.expr(AOI_LAT_MAX_SQL).alias("lat_max"),
    )
    if not with_wkb:
        return df

    def add_wkb(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["geom"] = [
                G.wkb_bbox_polygon(a, b, c, d)
                for a, b, c, d in zip(
                    pdf.lon_min, pdf.lat_min, pdf.lon_max, pdf.lat_max
                )
            ]
            yield pdf

    from pyspark.sql.types import BinaryType, StructField, StructType

    # do NOT use df.schema.add(...): it mutates the DataFrame's own
    # schema object and breaks column resolution
    schema = StructType(list(df.schema.fields) + [StructField("geom", BinaryType())])
    return df.mapInPandas(add_wkb, schema=schema)


def footprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image footprints from ``orders`` per FIXTURES.md §1: 0.01° bbox
    centered at the scatter position; w/h/fmt cycles."""
    o = _spread(spark.read.parquet(f"{sf_dir}/orders.parquet"))
    lon = F.expr(FOOT_LON_SQL)
    lat = F.expr(FOOT_LAT_SQL)
    return o.select(
        F.format_string("img%012d", F.col("o_orderkey")).alias("image_id"),
        F.col("o_orderkey").alias("okey"),
        lon.alias("lon"),
        lat.alias("lat"),
        (lon - F.lit(0.005)).alias("lon_min"),
        (lat - F.lit(0.005)).alias("lat_min"),
        (lon + F.lit(0.005)).alias("lon_max"),
        (lat + F.lit(0.005)).alias("lat_max"),
        F.element_at(
            F.array(F.lit(64), F.lit(128), F.lit(256), F.lit(512)),
            (F.col("o_orderkey") % 4 + 1).cast("int"),
        ).alias("w"),
        F.element_at(
            F.array(F.lit(128), F.lit(64), F.lit(512), F.lit(256)),
            (F.col("o_orderkey") % 4 + 1).cast("int"),
        ).alias("h"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")),
            (F.col("o_orderkey") % 3 + 1).cast("int"),
        ).alias("fmt"),
    )


# ---------------------------------------------------------------------------
# Pixel-bearing images table (input_hint schema)
# ---------------------------------------------------------------------------

IMG_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, lon double, lat double, lon_min double, lat_min double, "
    "lon_max double, lat_max double"
)


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic RGB gradient + hash-seeded noise (FIXTURES.md §1)."""
    seed = np.frombuffer(image_id.encode().ljust(16, b"\0")[:16], dtype=np.uint32).sum()
    rng = np.random.default_rng(int(seed))
    gx = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    gy = np.linspace(0, 128, h, dtype=np.float64)[:, None]
    base = gx + gy
    arr = np.stack(
        [
            np.clip(base + rng.integers(0, 32, (h, w)), 0, 255),
            np.clip(255 - base + rng.integers(0, 32, (h, w)), 0, 255),
            np.clip((base * 0.5) + rng.integers(0, 32, (h, w)), 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    return arr


def phash64(arr: np.ndarray) -> int:
    """Stable 64-bit perceptual-ish hash: 8×8 mean-threshold of the
    average-reduced gray image (deterministic; not DCT-based)."""
    gray = arr.mean(axis=2) if arr.ndim == 3 else arr.astype(np.float64)
    h, w = gray.shape
    ys = (np.arange(8) * h // 8, (np.arange(8) + 1) * h // 8)
    small = np.zeros((8, 8))
    for i in range(8):
        for j in range(8):
            small[i, j] = gray[ys[0][i] : ys[1][i], j * w // 8 : (j + 1) * w // 8].mean()
    bits = (small > small.mean()).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def images(
    spark: SparkSession, sf_dir: str, where: str | None = None, with_bytes: bool = True
) -> DataFrame:
    """Full input_hint table: footprints + encoded pixel payloads.

    ``where`` (SQL over footprint cols, e.g. ``okey % 20 = 0``) filters
    BEFORE pixel synthesis — pixels for excluded rows are never built
    (the pushdown a parquet scan would do automatically).

    ``with_bytes=False`` skips the ENCODE step and yields
    ``bytes=NULL``: the column-pruning analogue for queries that read
    only metadata/phash (on a real Iceberg scan, Spark would never
    fetch the ``bytes`` column for those plans — synthesizing + jpeg-
    encoding pixels for them here would charge the engine for work a
    pruned scan never does)."""
    from gdal_spark.session import ensure_pixel_batch_size

    ensure_pixel_batch_size(spark)
    fp = footprints(spark, sf_dir)
    if where:
        # re-spread after the filter so pixel synthesis stays balanced
        fp = fp.filter(where).repartition(
            spark.sparkContext.defaultParallelism * 2
        )

    def gen(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                arr = synth_pixels(r.image_id, r.w, r.h)
                rows.append(
                    {
                        "image_id": r.image_id,
                        # level-1 zlib: source synthesis isn't the
                        # engine under test; keep it cheap
                        "bytes": (
                            codec.encode_image(arr, r.fmt, compress_level=1)
                            if with_bytes
                            else None
                        ),
                        "w": r.w,
                        "h": r.h,
                        "fmt": r.fmt,
                        "caption": f"synthetic scene {r.okey} tags:{r.okey % 17}",
                        "phash": phash64(arr),
                        "lon": r.lon,
                        "lat": r.lat,
                        "lon_min": r.lon_min,
                        "lat_min": r.lat_min,
                        "lon_max": r.lon_max,
                        "lat_max": r.lat_max,
                    }
                )
            yield pd.DataFrame(rows)

    return fp.mapInPandas(gen, schema=IMG_SCHEMA)


def coverage_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygonal-coverage fixture for the check/clean-coverage
    operators (apps/gdalalg_vector_{check,clean}_coverage.cpp): one
    3x3 tiling of each AOI rectangle with a deterministic defect by
    ``poly_id % 3`` — 0: the east tile (fid 5) extended left by
    d = 0.1*tile_w into the center tile (overlap + misaligned
    collinear edges); 1: the center tile (fid 4) shrunk by
    g = 0.05*min(tile_w, tile_h) on all sides (an enclosed ring gap of
    inscribed diameter (2-sqrt(2))*2*g < gap_w); 2: a perfect tiling.
    ``gap_w`` carries the per-patch gap threshold 2*g."""
    base = aoi(spark, sf_dir, with_wkb=False)

    def gen(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                W = r.lon_max - r.lon_min
                H = r.lat_max - r.lat_min
                tw, th = W / 3.0, H / 3.0
                d = 0.1 * tw
                g = 0.05 * min(tw, th)
                var = int(r.poly_id) % 3
                for rr in range(3):
                    for cc in range(3):
                        fid = 3 * rr + cc
                        x0 = r.lon_min + tw * cc
                        x1 = r.lon_min + tw * (cc + 1)
                        y0 = r.lat_min + th * rr
                        y1 = r.lat_min + th * (rr + 1)
                        if var == 0 and fid == 5:
                            x0 = x0 - d
                        if var == 1 and fid == 4:
                            x0, x1 = x0 + g, x1 - g
                            y0, y1 = y0 + g, y1 - g
                        rows.append(
                            {
                                "patch": int(r.poly_id),
                                "fid": fid,
                                "geom": G.wkb_bbox_polygon(x0, y0, x1, y1),
                                "gap_w": 2.0 * g,
                            }
                        )
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen, schema="patch long, fid long, geom binary, gap_w double"
    )


def coverage_zigzag(spark: SparkSession, sf_dir: str, k: int = 6) -> DataFrame:
    """Two-tile coverage per AOI whose shared mid edge is a k-point
    zigzag (x = mid ± 0.02*W alternating, vertex-exact on both sides)
    — the simplify-coverage fixture: VW drops every zigzag vertex
    (shared arc) while the node endpoints and, with preserve-boundary,
    the outer corners survive."""
    base = aoi(spark, sf_dir, with_wkb=False)

    def gen(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                W = r.lon_max - r.lon_min
                H = r.lat_max - r.lat_min
                xm = r.lon_min + W * 0.5
                e = 0.02 * W
                mids = [
                    [xm + (e if i % 2 else -e), r.lat_min + H * i / (k + 1)]
                    for i in range(1, k + 1)
                ]
                left = np.array(
                    [[xm, r.lat_min]]
                    + mids
                    + [
                        [xm, r.lat_max],
                        [r.lon_min, r.lat_max],
                        [r.lon_min, r.lat_min],
                        [xm, r.lat_min],
                    ]
                )
                right = np.array(
                    [
                        [xm, r.lat_min],
                        [r.lon_max, r.lat_min],
                        [r.lon_max, r.lat_max],
                        [xm, r.lat_max],
                    ]
                    + mids[::-1]
                    + [[xm, r.lat_min]]
                )
                for fid, ring in ((0, left), (1, right)):
                    rows.append(
                        {
                            "patch": int(r.poly_id),
                            "fid": fid,
                            "geom": G.wkb_polygon([ring]),
                        }
                    )
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema="patch long, fid long, geom binary")
