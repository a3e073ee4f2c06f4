"""Distributed tile-pyramid builder — the north-star operator.

Re-expresses ``gdal2tiles.py`` / ``gdal raster tile``
(``apps/gdalalg_raster_tile.cpp``) as three Spark stages:

1. **assign** (pure SQL, no UDF): explode image footprints to covering
   XYZ tiles per zoom — the distributed ``tminmax`` enumeration of
   ``generate_base_tiles`` (gdal2tiles.py:2801-2824).
2. **render base tiles** (``mapInPandas``): per (image, tile) pair
   decode-once-per-image (partition-local cache — tiles of one image
   are adjacent after explode, so no shuffle is needed for reuse),
   inverse-mercator warp into the 256² tile window
   (gdal2tiles ``geo_query`` + ``scale_query_to_tile``,
   :2968/:838), then **compose** per tile (first-wins over alpha,
   the mosaic rule).
3. **overviews**: tile (z−1, x>>1, y>>1) from ≤4 children pasted
   into a 2·ts canvas and 2× average downsampled
   (``create_overview_tile``, gdal2tiles.py:1466-1545).

Compose/overview plan shape (round-2 rework; VERDICT r01 found the
old per-group ``applyInPandas`` + PNG-roundtrip compose was 59% of
the bench wall):

- Stage payloads between render → compose → overviews are **raw
  zlib-compressed RGBA buffers**, not PNG: the PNG filter/chunk work
  happens exactly once per FINAL tile, in one finalize pass.
- Compose is ``repartition(z,tx,ty)`` + ``sortWithinPartitions`` +
  ``mapInPandas`` with a streaming group-by: ONE Python call handles
  an entire partition's worth of tiles (hundreds), instead of one
  ``applyInPandas`` invocation per tile group (~10 ms × thousands of
  groups of pure overhead).
- Every raw level is persisted (tracked in ``gdal_spark.cache``):
  the union + next-level branches both consume it, and without the
  persist Spark recomputes level L's compose once per higher level.

Resume = anti-join against the tile manifest (replacing the
reference's per-file existence checks, gdal2tiles.py:2852-2855);
per-partition lineage + metrics rows are appended on every run
(north-rule checkpointing). Writes are parquet partitioned by ``z``
((z, x) directory layout ≈ the XYZ disk layout; swap for Iceberg
``writeTo`` on a cluster with an Iceberg catalog).
"""

from __future__ import annotations

import os
import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.functions import tile_math as tm
from gdal_spark.operators.spatial_join import explode_bbox_cells
from gdal_spark.raster import codec
from gdal_spark.raster.checksum import checksum
from gdal_spark.raster.resample import block_reduce
from gdal_spark.raster.warp import warp_lonlat_to_merc_tile

TILE_SIZE = 256

ASSIGN_SCHEMA_COLS = ["image_id", "z", "tx", "ty", "x", "y", "quadkey"]


def assign_tiles(footprints: DataFrame, zoom: int) -> DataFrame:
    """Tile cover of each footprint at ``zoom`` — pure column math."""
    e = explode_bbox_cells(footprints, zoom=zoom)
    return e.select(
        "image_id",
        F.lit(zoom).alias("z"),
        F.col("_tx").alias("tx"),
        F.col("_ty").alias("ty"),
        F.col("_tx").alias("x"),
        tm.google_y(F.col("_ty"), zoom).alias("y"),
        tm.quadkey(F.col("_tx"), F.col("_ty"), zoom).alias("quadkey"),
    )


def assign_tiles_geodetic(
    footprints: DataFrame, zoom: int, tmscompatible: bool = True
) -> DataFrame:
    """Tile cover in the GlobalGeodetic profile (gdal2tiles.py:535-633;
    ``gdal raster tile --tiling-scheme geodetic``,
    apps/gdalalg_raster_tile.cpp:199-214) — plate-carrée tiles, 2×1
    root layout when tmscompatible. Pure column math like the mercator
    path."""
    txmin = tm.geodetic_tile_x(F.col("lon_min"), zoom, tmscompatible)
    txmax = tm.geodetic_tile_x(F.col("lon_max"), zoom, tmscompatible)
    tymin = tm.geodetic_tile_y(F.col("lat_min"), zoom, tmscompatible)
    tymax = tm.geodetic_tile_y(F.col("lat_max"), zoom, tmscompatible)
    return (
        footprints.withColumn("_gtx", F.explode(F.sequence(txmin, txmax)))
        .withColumn("_gty", F.explode(F.sequence(tymin, tymax)))
        .select(
            "image_id",
            F.lit(zoom).alias("z"),
            F.col("_gtx").alias("tx"),
            F.col("_gty").alias("ty"),
        )
    )


def assign_tiles_multi(footprints: DataFrame, min_zoom: int, max_zoom: int) -> DataFrame:
    out = assign_tiles(footprints, max_zoom)
    for z in range(max_zoom - 1, min_zoom - 1, -1):
        out = out.unionByName(assign_tiles(footprints, z))
    return out


import zlib


def _pack(canvas: np.ndarray) -> bytes:
    """Raw stage payload: zlib-1 of the RGBA buffer (no PNG filters)."""
    return zlib.compress(np.ascontiguousarray(canvas).tobytes(), 1)


def _unpack(buf: bytes, tile_size: int) -> np.ndarray:
    return np.frombuffer(zlib.decompress(bytes(buf)), np.uint8).reshape(
        tile_size, tile_size, 4
    )


RAW_SCHEMA = "z int, tx int, ty int, raw binary, n_srcs int"
_RAW_COLS = ["z", "tx", "ty", "raw", "n_srcs"]
_EMIT_BATCH = 32  # finished tiles per yielded Arrow batch


def _render_partials(
    images: DataFrame,
    zoom: int,
    tile_size: int,
    resampling: str,
    resume_manifest: DataFrame | None,
    profile: str = "mercator",
) -> DataFrame:
    """(z, tx, ty, image_id, rgba=zlib raw) partial renders.

    ``profile="geodetic"`` renders plate-carrée tiles
    (GlobalGeodetic, tmscompatible 2×1 root layout): tile bounds are
    lon/lat rectangles, so the per-tile sampling is a pure linear
    window resample (no mercator inversion)."""
    from gdal_spark.session import ensure_pixel_batch_size

    ensure_pixel_batch_size(images.sparkSession)
    m = tm.GlobalMercator(tile_size)
    geodetic = profile == "geodetic"
    gg = tm.GlobalGeodetic(tmscompatible=True, tile_size=tile_size)
    if geodetic:
        work = (
            images.withColumn(
                "wtx",
                F.explode(
                    F.sequence(
                        tm.geodetic_tile_x(F.col("lon_min"), zoom),
                        tm.geodetic_tile_x(F.col("lon_max"), zoom),
                    )
                ),
            )
            .withColumn(
                "wty",
                F.explode(
                    F.sequence(
                        tm.geodetic_tile_y(F.col("lat_min"), zoom),
                        tm.geodetic_tile_y(F.col("lat_max"), zoom),
                    )
                ),
            )
        )
    else:
        # rename helpers: pandas itertuples mangles leading underscores
        work = (
            explode_bbox_cells(images, zoom=zoom)
            .withColumnRenamed("_tx", "wtx")
            .withColumnRenamed("_ty", "wty")
        )
    if resume_manifest is not None:
        done = resume_manifest.select(
            F.col("z"), F.col("tx").alias("_mtx"), F.col("ty").alias("_mty")
        ).filter(F.col("z") == zoom)
        work = work.join(
            done,
            (work["wtx"] == done["_mtx"]) & (work["wty"] == done["_mty"]),
            "left_anti",
        )

    partial_schema = "z int, tx int, ty int, image_id string, rgba binary"

    def render(it):
        from gdal_spark.raster.warp import warp_lonlat_to_grid

        cache: dict[str, np.ndarray] = {}
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                arr = cache.get(r.image_id)
                if arr is None:
                    cache.clear()  # tiles per image are adjacent: keep 1
                    arr = codec.decode_image(r.bytes, r.fmt)
                    cache[r.image_id] = arr
                if geodetic:
                    tb = gg.TileBounds(r.wtx, r.wty, zoom)
                    tile, valid = warp_lonlat_to_grid(
                        arr, r.lon_min, r.lat_min, r.lon_max, r.lat_max,
                        tb, 4326, tile_size, tile_size, resampling,
                    )
                else:
                    tb = m.TileBounds(r.wtx, r.wty, zoom)
                    tile, valid = warp_lonlat_to_merc_tile(
                        arr,
                        r.lon_min,
                        r.lat_min,
                        r.lon_max,
                        r.lat_max,
                        tb,
                        tile_size,
                        resampling,
                    )
                if not valid.any():
                    continue  # skip-blank (gdal2tiles exclude_transparent)
                if tile.ndim == 2:
                    tile = np.repeat(tile[:, :, None], 3, axis=2)
                rgba = np.dstack([tile, (valid * 255).astype(np.uint8)])
                rows.append((zoom, r.wtx, r.wty, r.image_id, _pack(rgba)))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["z", "tx", "ty", "image_id", "rgba"]
                )

    return work.mapInPandas(render, schema=partial_schema)


def _compose_raw(partials: DataFrame, tile_size: int = TILE_SIZE) -> DataFrame:
    """Streaming first-wins compose: partials hash-partitioned on the
    tile key and sorted (key, image_id); one ``mapInPandas`` call then
    walks each partition's sorted stream, carrying the open canvas
    across Arrow batch boundaries. Deterministic: first-wins by
    image_id order exactly like the old per-group compose."""

    parts = partials.repartition("z", "tx", "ty").sortWithinPartitions(
        "z", "tx", "ty", "image_id"
    )

    def compose(it):
        cur = None
        canvas = None
        n = 0
        out = []
        for pdf in it:
            for r in pdf.itertuples():
                key = (r.z, r.tx, r.ty)
                if key != cur:
                    if cur is not None:
                        out.append((cur[0], cur[1], cur[2], _pack(canvas), n))
                        if len(out) >= _EMIT_BATCH:
                            yield pd.DataFrame(out, columns=_RAW_COLS)
                            out = []
                    cur = key
                    canvas = np.zeros((tile_size, tile_size, 4), dtype=np.uint8)
                    n = 0
                part = _unpack(r.rgba, tile_size)
                put = (part[:, :, 3] > 0) & (canvas[:, :, 3] == 0)
                canvas[put] = part[put]
                n += 1
        if cur is not None:
            out.append((cur[0], cur[1], cur[2], _pack(canvas), n))
        if out:
            yield pd.DataFrame(out, columns=_RAW_COLS)

    return parts.mapInPandas(compose, schema=RAW_SCHEMA)


def _overview_raw(raw: DataFrame, tile_size: int = TILE_SIZE) -> DataFrame:
    """One pyramid step on raw payloads: z−1 from z, streaming
    group-by over (parent, child) sorted rows."""

    kids = raw.select(
        (F.col("z") - 1).alias("z"),
        F.shiftright(F.col("tx"), 1).alias("tx"),
        F.shiftright(F.col("ty"), 1).alias("ty"),
        F.col("tx").alias("ctx"),
        F.col("ty").alias("cty"),
        "raw",
    )
    parts = kids.repartition("z", "tx", "ty").sortWithinPartitions(
        "z", "tx", "ty", "ctx", "cty"
    )

    def compose(it):
        cur = None
        big = None
        n = 0
        out = []

        def finish():
            rgb = block_reduce(big[:, :, :3], tile_size, tile_size, "average")
            alpha = block_reduce(big[:, :, 3], tile_size, tile_size, "max")
            return (cur[0], cur[1], cur[2], _pack(np.dstack([rgb, alpha])), n)

        for pdf in it:
            for r in pdf.itertuples():
                key = (r.z, r.tx, r.ty)
                if key != cur:
                    if cur is not None:
                        out.append(finish())
                        if len(out) >= _EMIT_BATCH:
                            yield pd.DataFrame(out, columns=_RAW_COLS)
                            out = []
                    cur = key
                    big = np.zeros((2 * tile_size, 2 * tile_size, 4), dtype=np.uint8)
                    n = 0
                child = _unpack(r.raw, tile_size)
                ox = (r.ctx - 2 * r.tx) * tile_size
                # TMS y grows upward; canvas row 0 is the top (higher ty)
                oy = (1 - (r.cty - 2 * r.ty)) * tile_size
                big[oy : oy + tile_size, ox : ox + tile_size] = child
                n += 1
        if cur is not None:
            out.append(finish())
        if out:
            yield pd.DataFrame(out, columns=_RAW_COLS)

    return parts.mapInPandas(compose, schema=RAW_SCHEMA)


def _finalize_raw(raw: DataFrame, tile_size: int = TILE_SIZE, profile: str = "mercator") -> DataFrame:
    """raw → TILE_SCHEMA: ONE png encode + checksum + quadkey pass."""

    def fin(it):
        for pdf in it:
            rows = [
                _finalize(
                    _unpack(r.raw, tile_size), r.z, r.tx, r.ty, r.n_srcs,
                    tile_size, profile,
                )
                for r in pdf.itertuples()
            ]
            if rows:
                yield pd.DataFrame(rows)

    return raw.mapInPandas(fin, schema=TILE_SCHEMA)


def render_base_tiles(
    images: DataFrame,
    zoom: int,
    tile_size: int = TILE_SIZE,
    resampling: str = "near",
    resume_manifest: DataFrame | None = None,
    profile: str = "mercator",
) -> DataFrame:
    """Stage 2: rendered + composed base tiles at ``zoom``.

    ``images`` needs (image_id, bytes, fmt, lon_min/lat_min/lon_max/
    lat_max). Returns (z, tx, ty, x, y, quadkey, tile(png RGBA),
    checksum, n_srcs). ``profile``: "mercator" (WebMercatorQuad) or
    "geodetic" (plate carrée, tmscompatible)."""
    partials = _render_partials(
        images, zoom, tile_size, resampling, resume_manifest, profile
    )
    return _finalize_raw(_compose_raw(partials, tile_size), tile_size, profile)


def _finalize(canvas: np.ndarray, z: int, txv: int, tyv: int, n: int, tile_size: int, profile: str = "mercator"):
    x = txv
    y = (1 << z) - 1 - tyv
    m = tm.GlobalMercator(tile_size)
    # quadkeys are a mercator (Bing) convention; geodetic tiles get ""
    qk = m.QuadTree(txv, tyv, z) if profile == "mercator" else ""
    return {
        "z": z,
        "tx": txv,
        "ty": tyv,
        "x": x,
        "y": y,
        "quadkey": qk,
        # level 3: ~2× encode CPU of level 6 for ~10% larger tiles —
        # the right side of the trade for a render-bound pipeline
        "tile": codec.png_encode(canvas, 3),
        "checksum": checksum(canvas[:, :, 0]),
        "n_srcs": n,
    }


TILE_SCHEMA = (
    "z int, tx int, ty int, x int, y int, quadkey string, tile binary, "
    "checksum int, n_srcs int"
)


def build_overview_level(tiles: DataFrame, tile_size: int = TILE_SIZE) -> DataFrame:
    """One standalone pyramid step on FINAL tiles (PNG in, PNG out):
    level z−1 from level z (4→1 compose + 2× average,
    gdal2tiles.py:1466-1545). ``build_pyramid`` uses the raw-payload
    recurrence instead — this wrapper exists for callers holding
    already-written tile rows."""

    def to_raw(it):
        for pdf in it:
            rows = [
                (r.z, r.tx, r.ty, _pack(codec.png_decode(bytes(r.tile))), 1)
                for r in pdf.itertuples()
            ]
            if rows:
                yield pd.DataFrame(rows, columns=_RAW_COLS)

    raw = tiles.select("z", "tx", "ty", "tile").mapInPandas(to_raw, schema=RAW_SCHEMA)
    return _finalize_raw(_overview_raw(raw, tile_size), tile_size)


def build_pyramid(
    images: DataFrame,
    min_zoom: int,
    max_zoom: int,
    tile_size: int = TILE_SIZE,
    resampling: str = "near",
    resume_manifest: DataFrame | None = None,
    profile: str = "mercator",
) -> DataFrame:
    """Base tiles at max_zoom + overview levels down to min_zoom.

    Raw payloads flow through the whole recurrence; each level is
    persisted (tracked) because it feeds BOTH the output union and the
    next overview level — without the persist, Spark recomputes level
    L's compose once per level above it (the quadratic recompute that
    dominated the round-1 wall). The 4→1 overview recurrence is
    profile-agnostic (both schemes halve both tile axes per level)."""
    from gdal_spark.cache import release_all, track_persist

    release_all()
    partials = _render_partials(
        images, max_zoom, tile_size, resampling, resume_manifest, profile
    )
    cur = track_persist(_compose_raw(partials, tile_size))
    levels = [cur]
    for _ in range(max_zoom - min_zoom):
        cur = track_persist(_overview_raw(cur, tile_size))
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return _finalize_raw(out, tile_size, profile)


# ---------------------------------------------------------------------------
# Sink + resume manifest + lineage (north rule)
# ---------------------------------------------------------------------------


def iceberg_available(spark: SparkSession, catalog: str = "iceberg") -> bool:
    """True when an Iceberg catalog is configured in this session
    (``spark.sql.catalog.<name>`` set and the classes on the
    classpath). This sandbox ships no Iceberg jars, so tests exercise
    the parquet fallback; on a cluster, setting the catalog conf flips
    every sink to ``writeTo``/``partitionedBy`` with no code change."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    except Exception:
        impl = None
    if not impl:
        return False
    try:
        spark.sql(f"SHOW NAMESPACES IN {catalog}")
        return True
    except Exception:
        return False


def write_tiles(
    spark: SparkSession,
    tiles: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    iceberg_table: str | None = None,
) -> dict:
    """Write tiles partitioned by z, update the manifest, and append
    per-partition lineage/metrics rows. Idempotent: rerunning with
    ``read_manifest(out_dir)`` passed as ``resume_manifest`` renders
    zero new tiles.

    ``iceberg_table`` (e.g. ``iceberg.db.tiles``): when an Iceberg
    catalog is configured, tiles append transactionally via
    ``writeTo(...).partitionedBy(z)`` — the north-rule exactly-once
    sink (snapshot isolation replaces the directory-append layout).
    Without a catalog the parquet ``partitionBy(z)`` layout below is
    the fallback; the manifest/metrics paths are identical in both."""
    run_id = run_id or uuid.uuid4().hex[:12]
    t0 = time.time()
    tiles = tiles.cache()
    n = tiles.count()
    if iceberg_table and iceberg_available(spark, iceberg_table.split(".")[0]):
        # Append-if-exists, create-if-absent. A rerun/resume must APPEND
        # the newly rendered tiles — createOrReplace on every call would
        # drop tiles the manifest already marks done (they'd never be
        # re-rendered), breaking the exactly-once claim. NOTE: this gated
        # path is unexercised in this container (no Iceberg runtime);
        # the table-exists check + append is the contract a cluster run
        # relies on.
        if spark.catalog.tableExists(iceberg_table):
            tiles.writeTo(iceberg_table).append()
        else:
            tiles.writeTo(iceberg_table).partitionedBy(F.col("z")).create()
    else:
        tiles.write.mode("append").partitionBy("z").parquet(f"{out_dir}/tiles")
    manifest = tiles.select("z", "tx", "ty", "x", "y", "quadkey", "checksum")
    manifest.write.mode("append").parquet(f"{out_dir}/manifest")
    # per-partition metrics (progress-callback analogue,
    # ogrlayer.cpp:5372 → accumulated rows instead of a callback)
    part_counts = (
        tiles.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count("*").alias("n_tiles"), F.sum(F.length("tile")).alias("bytes"))
        .withColumn("run_id", F.lit(run_id))
        .withColumn("wall_sec", F.lit(time.time() - t0))
    )
    part_counts.write.mode("append").parquet(f"{out_dir}/metrics")
    tiles.unpersist()
    return {"run_id": run_id, "n_tiles": n, "wall_sec": time.time() - t0}


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = f"{out_dir}/manifest"
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)
