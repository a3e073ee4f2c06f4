"""MBTiles sink/source for the tile pyramid.

Reference surface: the MBTiles driver (``frmts/mbtiles/
mbtilesdataset.cpp``) and ``gdal raster tile --output-format MBTiles``.
Format per the public MBTiles 1.3 spec: a SQLite database with
``metadata(name, value)`` and ``tiles(zoom_level, tile_column,
tile_row, tile_data)`` where ``tile_row`` is TMS (south-origin) — the
tiler's ``ty`` column directly.

Scale note (honest): MBTiles is a SINGLE-FILE terminal format — the
reference writes it single-process too, and SQLite allows one writer.
The cluster-scale tile store remains the parquet/Iceberg
``partitionBy(z)`` layout (``tiler.write_tiles``); this sink exists
for the last hop — shipping a finished pyramid as one portable
artifact.  It streams the tile DataFrame through
``toLocalIterator()`` (one partition resident at a time, executemany
batches inside one transaction), so driver memory stays bounded by a
partition, not the pyramid.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_mbtiles(
    tiles: DataFrame,
    path: str,
    name: str = "gdal_spark",
    fmt: str = "png",
    description: str = "tile pyramid",
) -> dict:
    """Write a (z, ty/tx TMS) tile DataFrame into an MBTiles file.

    Returns the metadata dict written (incl. computed zoom range and
    tile count).  Existing file is replaced (CreateCopy semantics).
    """
    agg = tiles.agg(
        F.min("z").alias("minz"), F.max("z").alias("maxz"), F.count("*").alias("n")
    ).collect()[0]
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute("DROP TABLE IF EXISTS tiles")
        cur.execute("DROP TABLE IF EXISTS metadata")
        cur.execute("CREATE TABLE metadata (name text, value text)")
        cur.execute(
            "CREATE TABLE tiles (zoom_level integer, tile_column integer, "
            "tile_row integer, tile_data blob)"
        )
        cur.execute(
            "CREATE UNIQUE INDEX tile_index ON tiles "
            "(zoom_level, tile_column, tile_row)"
        )
        meta = {
            "name": name,
            "type": "overlay",
            "version": "1.1",
            "description": description,
            "format": fmt,
            "minzoom": str(agg.minz),
            "maxzoom": str(agg.maxz),
        }
        cur.executemany("INSERT INTO metadata VALUES (?, ?)", list(meta.items()))
        it = (
            tiles.select("z", "tx", "ty", "tile")
            .toLocalIterator(prefetchPartitions=True)
        )
        batch = []
        for r in it:
            batch.append((r.z, r.tx, r.ty, bytes(r.tile)))
            if len(batch) >= 1024:
                cur.executemany("INSERT INTO tiles VALUES (?, ?, ?, ?)", batch)
                batch = []
        if batch:
            cur.executemany("INSERT INTO tiles VALUES (?, ?, ?, ?)", batch)
        con.commit()
        meta["tile_count"] = int(agg.n)
        return meta
    finally:
        con.close()


def read_mbtiles(spark: SparkSession, path: str) -> DataFrame:
    """Open an MBTiles file as a tile DataFrame (driver reads the
    SQLite index — the dataset is one local file by construction)."""
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
        ).fetchall()
    finally:
        con.close()
    return spark.createDataFrame(
        [(int(z), int(x), int(y), bytes(b)) for z, x, y, b in rows],
        "z int, tx int, ty int, tile binary",
    )


def mbtiles_metadata(path: str) -> dict:
    con = sqlite3.connect(path)
    try:
        return dict(con.execute("SELECT name, value FROM metadata").fetchall())
    finally:
        con.close()
