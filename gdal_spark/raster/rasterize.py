"""Rasterize: burn vector polygons into tile rasters.

Re-expresses ``gdal rasterize`` (``alg/gdalrasterize.cpp``; pixel
inclusion rule = cell-center containment when ``ALL_TOUCHED`` is off,
scanline core ``alg/llrasterize.cpp``; ``MERGE_ALG`` REPLACE/ADD
``gdalrasterize.cpp:796-834``) as the tile-directed spatial join:

1. polygons explode to covering XYZ tiles (pure SQL — the same
   ``explode_bbox_cells`` the spatial join uses),
2. per (tile, polygon) pair a pandas UDF evaluates the vectorized
   even-odd test (``geometry.points_in_rings``) on the 256² grid of
   pixel centers — the batch analogue of GDAL's scanline fill,
3. ``groupBy(tile)`` composition merges burns (REPLACE = max of burn
   values for determinism, ADD = sum), yielding one raster per tile.

Returns per-tile checksums (the reference's golden-test currency,
``alg/gdalchecksum.cpp:48``) plus burn statistics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G
from gdal_spark.functions import tile_math as tm
from gdal_spark.operators.spatial_join import explode_bbox_cells
from gdal_spark.raster.checksum import checksum_band

TILE_SIZE = 256


def rasterize(
    polys: DataFrame,
    zoom: int,
    burn_col: str = "burn",
    geom: str = "geom",
    tile_size: int = TILE_SIZE,
    merge: str = "replace",
) -> DataFrame:
    """Burn polygons (WKB + bbox columns) into mercator tiles at
    ``zoom``. Returns (z, x, y, checksum, n_burned_px, n_polys)."""
    m = tm.GlobalMercator(tile_size)
    work = (
        explode_bbox_cells(polys, zoom=zoom)
        .withColumnRenamed("_tx", "wtx")
        .withColumnRenamed("_ty", "wty")
        .select("wtx", "wty", geom, burn_col)
    )

    out_schema = "z int, x int, y int, checksum int, n_burned_px long, n_polys int"

    def burn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        txv, tyv = int(key[0]), int(key[1])
        minx, miny, maxx, maxy = m.TileBounds(txv, tyv, zoom)
        res = (maxx - minx) / tile_size
        # pixel-center grid in mercator, converted to lon/lat
        from gdal_spark.raster.warp import merc_to_lat, merc_to_lon

        mx = minx + (np.arange(tile_size) + 0.5) * res
        my = maxy - (np.arange(tile_size) + 0.5) * res
        lon = merc_to_lon(mx)
        lat = merc_to_lat(my)
        glon = np.broadcast_to(lon[None, :], (tile_size, tile_size)).ravel()
        glat = np.broadcast_to(lat[:, None], (tile_size, tile_size)).ravel()
        canvas = np.zeros(tile_size * tile_size, dtype=np.float64)
        for r in pdf.itertuples():
            g = G.parse_wkb(bytes(getattr(r, geom)))
            inside = G.points_in_rings(glon, glat, g.rings)
            bv = float(getattr(r, burn_col))
            if merge == "add":  # MERGE_ALG=ADD (gdalrasterize.cpp:806)
                canvas[inside] += bv
            else:  # REPLACE, deterministic via max
                canvas[inside] = np.maximum(canvas[inside], bv)
        arr = np.clip(canvas, 0, 255).reshape(tile_size, tile_size).astype(np.uint8)
        return pd.DataFrame(
            [
                {
                    "z": zoom,
                    "x": txv,
                    "y": (1 << zoom) - 1 - tyv,
                    "checksum": checksum_band(arr),
                    "n_burned_px": int((arr > 0).sum()),
                    "n_polys": len(pdf),
                }
            ]
        )

    return work.groupBy("wtx", "wty").applyInPandas(burn, schema=out_schema)


def reclassify_expr(mapping: list[tuple[int, int, int]]):
    """Build a NumPy LUT from (lo, hi, new) inclusive ranges — the
    ``gdal raster reclassify`` table (apps/gdalalg_raster_reclassify)."""
    lut = np.arange(256, dtype=np.uint8)
    for lo, hi, new in mapping:
        lut[lo : hi + 1] = new
    return lut


def reclassify(images: DataFrame, mapping: list[tuple[int, int, int]]) -> DataFrame:
    """Apply a value-range reclassification to band 0 of each image;
    returns (image_id, checksum_before, checksum_after, n_changed)."""
    from gdal_spark.session import ensure_pixel_batch_size

    ensure_pixel_batch_size(images.sparkSession)
    from gdal_spark.raster import codec

    lut = reclassify_expr(mapping)
    schema = "image_id string, checksum_before int, checksum_after int, n_changed long"

    def run(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                arr = codec.decode_image(r.bytes, r.fmt)
                b = arr[:, :, 0] if arr.ndim == 3 else arr
                out = lut[b]  # np.take LUT — the vectorized reclass
                rows.append(
                    (
                        r.image_id,
                        checksum_band(b),
                        checksum_band(out),
                        int((out != b).sum()),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "image_id",
                        "checksum_before",
                        "checksum_after",
                        "n_changed",
                    ],
                )

    return images.mapInPandas(run, schema=schema)
