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
   :2968/:838), then **compose** per tile via ``applyInPandas``
   (first-wins over alpha, the mosaic rule).
3. **overviews** (``applyInPandas`` recurrence): tile (z−1, x>>1,
   y>>1) from ≤4 children pasted into a 2·ts canvas and 2× average
   downsampled (``create_overview_tile``, gdal2tiles.py:1466-1545).

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


def assign_tiles_multi(footprints: DataFrame, min_zoom: int, max_zoom: int) -> DataFrame:
    out = assign_tiles(footprints, max_zoom)
    for z in range(max_zoom - 1, min_zoom - 1, -1):
        out = out.unionByName(assign_tiles(footprints, z))
    return out


def render_base_tiles(
    images: DataFrame,
    zoom: int,
    tile_size: int = TILE_SIZE,
    resampling: str = "near",
    resume_manifest: DataFrame | None = None,
) -> DataFrame:
    """Stage 2: rendered + composed base tiles at ``zoom``.

    ``images`` needs (image_id, bytes, fmt, lon_min/lat_min/lon_max/
    lat_max). Returns (z, tx, ty, x, y, quadkey, tile(png RGBA),
    checksum, n_srcs).
    """
    from gdal_spark.session import ensure_pixel_batch_size

    ensure_pixel_batch_size(images.sparkSession)
    m = tm.GlobalMercator(tile_size)
    # rename helper cols: pandas itertuples mangles leading-underscore names
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
        cache: dict[str, np.ndarray] = {}
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                arr = cache.get(r.image_id)
                if arr is None:
                    cache.clear()  # tiles per image are adjacent: keep 1
                    arr = codec.decode_image(r.bytes, r.fmt)
                    cache[r.image_id] = arr
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
                rows.append(
                    # level-1 zlib: partials only cross one shuffle and
                    # are re-encoded at compose time — cheap > small
                    (zoom, r.wtx, r.wty, r.image_id, codec.png_encode(rgba, 1))
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["z", "tx", "ty", "image_id", "rgba"]
                )

    partials = work.mapInPandas(render, schema=partial_schema)
    return compose_tiles(partials, zoom, tile_size)


def _finalize(canvas: np.ndarray, z: int, txv: int, tyv: int, n: int, tile_size: int):
    x = txv
    y = (1 << z) - 1 - tyv
    m = tm.GlobalMercator(tile_size)
    qk = m.QuadTree(txv, tyv, z)
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


def compose_tiles(partials: DataFrame, zoom: int, tile_size: int = TILE_SIZE) -> DataFrame:
    """Mosaic partial renders per tile: first-wins by image_id over
    alpha (the deterministic analogue of gdal2tiles' paste order)."""

    def compose(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, txv, tyv = int(key[0]), int(key[1]), int(key[2])
        canvas = np.zeros((tile_size, tile_size, 4), dtype=np.uint8)
        pdf = pdf.sort_values("image_id")
        for r in pdf.itertuples():
            part = codec.png_decode(r.rgba)
            put = (part[:, :, 3] > 0) & (canvas[:, :, 3] == 0)
            canvas[put] = part[put]
        return pd.DataFrame([_finalize(canvas, z, txv, tyv, len(pdf), tile_size)])

    return partials.groupBy("z", "tx", "ty").applyInPandas(compose, schema=TILE_SCHEMA)


def build_overview_level(tiles: DataFrame, tile_size: int = TILE_SIZE) -> DataFrame:
    """One pyramid step: level z−1 from level z (4→1 compose + 2×
    average, gdal2tiles.py:1466-1545)."""

    def compose(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pz, ptx, pty = int(key[0]), int(key[1]), int(key[2])
        big = np.zeros((2 * tile_size, 2 * tile_size, 4), dtype=np.uint8)
        for r in pdf.itertuples():
            child = codec.png_decode(r.tile)
            ox = (r.tx - 2 * ptx) * tile_size
            # TMS y grows upward; canvas row 0 is the top (higher ty)
            oy = (1 - (r.ty - 2 * pty)) * tile_size
            big[oy : oy + tile_size, ox : ox + tile_size] = child
        rgb = block_reduce(big[:, :, :3], tile_size, tile_size, "average")
        alpha = block_reduce(big[:, :, 3], tile_size, tile_size, "max")
        canvas = np.dstack([rgb, alpha])
        return pd.DataFrame([_finalize(canvas, pz, ptx, pty, len(pdf), tile_size)])

    parents = tiles.select(
        (F.col("z") - 1).alias("pz"),
        F.shiftright(F.col("tx"), 1).alias("ptx"),
        F.shiftright(F.col("ty"), 1).alias("pty"),
        "tx",
        "ty",
        "tile",
    )
    return parents.groupBy("pz", "ptx", "pty").applyInPandas(compose, schema=TILE_SCHEMA)


def build_pyramid(
    images: DataFrame,
    min_zoom: int,
    max_zoom: int,
    tile_size: int = TILE_SIZE,
    resampling: str = "near",
    resume_manifest: DataFrame | None = None,
) -> DataFrame:
    """Base tiles at max_zoom + overview levels down to min_zoom."""
    base = render_base_tiles(images, max_zoom, tile_size, resampling, resume_manifest)
    levels = [base]
    cur = base
    for _ in range(max_zoom - min_zoom):
        cur = build_overview_level(cur, tile_size)
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


# ---------------------------------------------------------------------------
# Sink + resume manifest + lineage (north rule)
# ---------------------------------------------------------------------------


def write_tiles(
    spark: SparkSession,
    tiles: DataFrame,
    out_dir: str,
    run_id: str | None = None,
) -> dict:
    """Write tiles partitioned by z, update the manifest, and append
    per-partition lineage/metrics rows. Idempotent: rerunning with
    ``read_manifest(out_dir)`` passed as ``resume_manifest`` renders
    zero new tiles."""
    run_id = run_id or uuid.uuid4().hex[:12]
    t0 = time.time()
    tiles = tiles.cache()
    n = tiles.count()
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
