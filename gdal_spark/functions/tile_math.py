"""Tile-pyramid math: Web-Mercator + geodetic profiles, XYZ/TMS, quadkey.

Semantics mirror the reference tiler exactly
(``swig/python/gdal-utils/osgeo_utils/gdal2tiles.py``):

- ``GlobalMercator``  — gdal2tiles.py:316-533 (LatLonToMeters :423,
  MetersToPixels :453, PixelsToTile :461 ``tx = ceil(px/256)-1``,
  MetersToTile :474, TileBounds :480, Resolution :498,
  ZoomForPixelSize :504, GoogleTile :512, QuadTree :518).
- ``GlobalGeodetic``  — gdal2tiles.py:535-633.

Two parallel implementations are provided and unit-tested against each
other:

1. Plain-Python scalar classes (the test oracle inside this repo).
2. Spark ``Column`` builders — **pure SQL expressions, no UDF** — so
   tile assignment runs JVM-side inside whole-stage codegen and scales
   linearly with executors (the distributed analogue of the tiler's
   spawn/fork workers, ``apps/gdalalg_raster_tile.cpp:3935-4100``).

The arithmetic *shape* of every expression is kept identical between
the Python reference, the Spark columns, and the DuckDB oracle SQL
(see ``gdal_spark/oracle.py``) so IEEE-754 doubles agree bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

MAXZOOMLEVEL = 32  # gdal2tiles.py:61
TILE_SIZE = 256
EARTH_RADIUS = 6378137.0
ORIGIN_SHIFT = 2 * math.pi * EARTH_RADIUS / 2.0  # 20037508.342789244
INITIAL_RESOLUTION = 2 * math.pi * EARTH_RADIUS / TILE_SIZE  # 156543.03392804062


# ---------------------------------------------------------------------------
# Python scalar reference (oracle for unit tests)
# ---------------------------------------------------------------------------


class GlobalMercator:
    """TMS Global Mercator pyramid, EPSG:3857 (gdal2tiles.py:316)."""

    def __init__(self, tile_size: int = TILE_SIZE) -> None:
        self.tile_size = tile_size
        self.initialResolution = 2 * math.pi * EARTH_RADIUS / tile_size
        self.originShift = 2 * math.pi * EARTH_RADIUS / 2.0

    def LatLonToMeters(self, lat: float, lon: float):
        mx = lon * self.originShift / 180.0
        my = math.log(math.tan((90 + lat) * math.pi / 360.0)) / (math.pi / 180.0)
        my = my * self.originShift / 180.0
        return mx, my

    def MetersToLatLon(self, mx: float, my: float):
        lon = (mx / self.originShift) * 180.0
        lat = (my / self.originShift) * 180.0
        lat = 180 / math.pi * (2 * math.atan(math.exp(lat * math.pi / 180.0)) - math.pi / 2.0)
        return lat, lon

    def Resolution(self, zoom: int) -> float:
        return self.initialResolution / (2**zoom)

    def PixelsToMeters(self, px: float, py: float, zoom: int):
        res = self.Resolution(zoom)
        return px * res - self.originShift, py * res - self.originShift

    def MetersToPixels(self, mx: float, my: float, zoom: int):
        res = self.Resolution(zoom)
        return (mx + self.originShift) / res, (my + self.originShift) / res

    def PixelsToTile(self, px: float, py: float):
        tx = int(math.ceil(px / float(self.tile_size)) - 1)
        ty = int(math.ceil(py / float(self.tile_size)) - 1)
        return tx, ty

    def MetersToTile(self, mx: float, my: float, zoom: int):
        px, py = self.MetersToPixels(mx, my, zoom)
        return self.PixelsToTile(px, py)

    def LatLonToTile(self, lat: float, lon: float, zoom: int):
        mx, my = self.LatLonToMeters(lat, lon)
        return self.MetersToTile(mx, my, zoom)

    def TileBounds(self, tx: int, ty: int, zoom: int):
        minx, miny = self.PixelsToMeters(tx * self.tile_size, ty * self.tile_size, zoom)
        maxx, maxy = self.PixelsToMeters((tx + 1) * self.tile_size, (ty + 1) * self.tile_size, zoom)
        return (minx, miny, maxx, maxy)

    def TileLatLonBounds(self, tx: int, ty: int, zoom: int):
        b = self.TileBounds(tx, ty, zoom)
        min_lat, min_lon = self.MetersToLatLon(b[0], b[1])
        max_lat, max_lon = self.MetersToLatLon(b[2], b[3])
        return (min_lat, min_lon, max_lat, max_lon)

    def ZoomForPixelSize(self, pixelSize: float) -> int:
        for i in range(MAXZOOMLEVEL):
            if pixelSize > self.Resolution(i):
                return max(0, i - 1)  # don't scale up
        return MAXZOOMLEVEL - 1

    def GoogleTile(self, tx: int, ty: int, zoom: int):
        return tx, (2**zoom - 1) - ty

    def QuadTree(self, tx: int, ty: int, zoom: int) -> str:
        quad_key = ""
        ty = (2**zoom - 1) - ty
        for i in range(zoom, 0, -1):
            digit = 0
            mask = 1 << (i - 1)
            if (tx & mask) != 0:
                digit += 1
            if (ty & mask) != 0:
                digit += 2
            quad_key += str(digit)
        return quad_key


class GlobalGeodetic:
    """TMS Global Geodetic (EPSG:4326 plate carrée), gdal2tiles.py:535."""

    def __init__(self, tmscompatible: bool | None, tile_size: int = TILE_SIZE) -> None:
        self.tile_size = tile_size
        self.resFact = (180.0 if tmscompatible else 360.0) / self.tile_size

    def Resolution(self, zoom: int) -> float:
        return self.resFact / 2**zoom

    def LonLatToPixels(self, lon: float, lat: float, zoom: int):
        res = self.Resolution(zoom)
        return (180 + lon) / res, (90 + lat) / res

    def PixelsToTile(self, px: float, py: float):
        tx = int(math.ceil(px / float(self.tile_size)) - 1)
        ty = int(math.ceil(py / float(self.tile_size)) - 1)
        return tx, ty

    def LonLatToTile(self, lon: float, lat: float, zoom: int):
        px, py = self.LonLatToPixels(lon, lat, zoom)
        return self.PixelsToTile(px, py)

    def TileBounds(self, tx: int, ty: int, zoom: int):
        res = self.resFact / 2**zoom
        return (
            tx * self.tile_size * res - 180,
            ty * self.tile_size * res - 90,
            (tx + 1) * self.tile_size * res - 180,
            (ty + 1) * self.tile_size * res - 90,
        )

    def ZoomForPixelSize(self, pixelSize: float) -> int:
        for i in range(MAXZOOMLEVEL):
            if pixelSize > self.Resolution(i):
                return max(0, i - 1)
        return MAXZOOMLEVEL - 1


# ---------------------------------------------------------------------------
# Spark Column builders (JVM-side, whole-stage-codegen friendly)
# ---------------------------------------------------------------------------


def merc_x(lon: Column) -> Column:
    """lon → EPSG:3857 x (gdal2tiles.py:423)."""
    return lon * F.lit(ORIGIN_SHIFT) / F.lit(180.0)


def merc_y(lat: Column) -> Column:
    """lat → EPSG:3857 y (gdal2tiles.py:423-428)."""
    inner = (F.lit(90.0) + lat) * F.lit(math.pi) / F.lit(360.0)
    my = F.log(F.tan(inner)) / F.lit(math.pi / 180.0)
    return my * F.lit(ORIGIN_SHIFT) / F.lit(180.0)


def merc_to_lat(my: Column) -> Column:
    """EPSG:3857 y → lat (gdal2tiles.py:433-441)."""
    lat = (my / F.lit(ORIGIN_SHIFT)) * F.lit(180.0)
    return (
        F.lit(180.0 / math.pi)
        * (F.lit(2.0) * F.atan(F.exp(lat * F.lit(math.pi) / F.lit(180.0))) - F.lit(math.pi / 2.0))
    )


def resolution(zoom: int, tile_size: int = TILE_SIZE) -> float:
    """Meters/pixel at zoom (gdal2tiles.py:498); plain Python float so it
    can be inlined as an exact literal in both Spark and DuckDB plans."""
    return (2 * math.pi * EARTH_RADIUS / tile_size) / (2**zoom)


def pixels_to_tile(p: Column, tile_size: int = TILE_SIZE) -> Column:
    """``int(ceil(p / tile_size) - 1)`` (gdal2tiles.py:461-465)."""
    return (F.ceil(p / F.lit(float(tile_size))) - F.lit(1)).cast("int")


def meters_to_tile_x(mx: Column, zoom: int, tile_size: int = TILE_SIZE) -> Column:
    res = resolution(zoom, tile_size)
    return pixels_to_tile((mx + F.lit(ORIGIN_SHIFT)) / F.lit(res), tile_size)


def meters_to_tile_y(my: Column, zoom: int, tile_size: int = TILE_SIZE) -> Column:
    res = resolution(zoom, tile_size)
    return pixels_to_tile((my + F.lit(ORIGIN_SHIFT)) / F.lit(res), tile_size)


def lonlat_to_tile_x(lon: Column, zoom: int, tile_size: int = TILE_SIZE) -> Column:
    """lon → mercator TMS tile x at ``zoom``."""
    return meters_to_tile_x(merc_x(lon), zoom, tile_size)


def lonlat_to_tile_y(lat: Column, zoom: int, tile_size: int = TILE_SIZE) -> Column:
    """lat → mercator TMS tile y at ``zoom``."""
    return meters_to_tile_y(merc_y(lat), zoom, tile_size)


def geodetic_resolution(zoom: int, tmscompatible: bool = True, tile_size: int = TILE_SIZE) -> float:
    """Degrees/pixel for the GlobalGeodetic profile (gdal2tiles.py:570)."""
    return ((180.0 if tmscompatible else 360.0) / tile_size) / (2**zoom)


def geodetic_tile_x(lon: Column, zoom: int, tmscompatible: bool = True, tile_size: int = TILE_SIZE) -> Column:
    """lon → geodetic TMS tile x (GlobalGeodetic.LonLatToTile,
    gdal2tiles.py:583-600) — plate-carrée, 2×1 root tiles when
    tmscompatible."""
    res = geodetic_resolution(zoom, tmscompatible, tile_size)
    return pixels_to_tile((F.lit(180.0) + lon) / F.lit(res), tile_size)


def geodetic_tile_y(lat: Column, zoom: int, tmscompatible: bool = True, tile_size: int = TILE_SIZE) -> Column:
    res = geodetic_resolution(zoom, tmscompatible, tile_size)
    return pixels_to_tile((F.lit(90.0) + lat) / F.lit(res), tile_size)


def google_y(ty_tms: Column, zoom: int) -> Column:
    """TMS y → XYZ/Google y: ``2**z - 1 - ty`` (gdal2tiles.py:512-516)."""
    return F.lit((1 << zoom) - 1) - ty_tms


def quadkey(tx: Column, ty_tms: Column, zoom: int) -> Column:
    """Microsoft quadkey from TMS tile coords (gdal2tiles.py:518-533).

    Unrolled per-bit so it stays a pure SQL expression: digit i =
    ``bit(tx) + 2*bit(ty_google)`` MSB-first.
    """
    tyg = google_y(ty_tms, zoom)
    digits = []
    for i in range(zoom, 0, -1):
        bx = F.shiftright(tx, i - 1).bitwiseAND(F.lit(1))
        by = F.shiftright(tyg, i - 1).bitwiseAND(F.lit(1))
        digits.append((bx + by * F.lit(2)).cast("string"))
    if not digits:
        return F.lit("")
    return F.concat(*digits)


def tile_bounds_cols(tx: Column, ty: Column, zoom: int, tile_size: int = TILE_SIZE):
    """(minx, miny, maxx, maxy) mercator bounds of a TMS tile
    (gdal2tiles.py:480-487)."""
    res = resolution(zoom, tile_size)
    ts = F.lit(float(tile_size))
    minx = tx.cast("double") * ts * F.lit(res) - F.lit(ORIGIN_SHIFT)
    miny = ty.cast("double") * ts * F.lit(res) - F.lit(ORIGIN_SHIFT)
    maxx = (tx.cast("double") + F.lit(1.0)) * ts * F.lit(res) - F.lit(ORIGIN_SHIFT)
    maxy = (ty.cast("double") + F.lit(1.0)) * ts * F.lit(res) - F.lit(ORIGIN_SHIFT)
    return minx, miny, maxx, maxy


def zoom_for_pixel_size(pixel_size: Column, tile_size: int = TILE_SIZE) -> Column:
    """First zoom whose resolution is below ``pixel_size``, minus one
    ("we don't want to scale up", gdal2tiles.py:504-510) — replicated as
    a CASE chain over all 32 levels so boundary semantics (strict ``>``)
    match the reference loop exactly."""
    expr = F.lit(MAXZOOMLEVEL - 1)
    for i in range(MAXZOOMLEVEL - 1, -1, -1):
        expr = F.when(pixel_size > F.lit(resolution(i, tile_size)), F.lit(max(0, i - 1))).otherwise(expr)
    return expr


def cell_id(tx: Column, ty_tms: Column, zoom: int) -> Column:
    """Pack (tx, ty) at a fixed index zoom into one 64-bit join key.

    This is the engine's H3/S2 stand-in: XYZ quadtree cells keyed by
    ``(tx << zoom) | ty``. Parent cell at zoom-k = both coords ``>> k``
    (quadkey-prefix relationship, gdal2tiles.py:518)."""
    return F.shiftleft(tx.cast("bigint"), zoom) + ty_tms.cast("bigint")


def parent_cell(tx: Column, ty_tms: Column, zoom: int, parent_zoom: int) -> Column:
    d = zoom - parent_zoom
    return cell_id(F.shiftright(tx, d), F.shiftright(ty_tms, d), parent_zoom)


def morton_key(tx: Column, ty: Column, zoom: int) -> Column:
    """Bit-interleaved Z-order key (the quadkey, §QuadTree, read as a
    base-4 integer).  The engine's spatial sort key — the distributed
    stand-in for the reference's Hilbert-ordered ``gdal vector sort``
    (``apps/gdalalg_vector_sort.cpp:371``, ``alg/hilbert.cpp:19``):
    same locality property class, but a pure closed-form SQL expression
    (Hilbert needs a per-bit state rotation loop).  Use with
    ``df.repartitionByRange(morton).sortWithinPartitions(morton)`` for
    spatially clustered writes (Iceberg z-ordering analogue)."""
    expr = None
    for i in range(zoom):
        bx = F.shiftright(tx, i).bitwiseAND(F.lit(1)).cast("bigint")
        by = F.shiftright(ty, i).bitwiseAND(F.lit(1)).cast("bigint")
        term = bx * F.lit(1 << (2 * i)) + by * F.lit(1 << (2 * i + 1))
        expr = term if expr is None else expr + term
    return expr if expr is not None else F.lit(0).cast("bigint")


def morton_key_py(tx: int, ty: int, zoom: int) -> int:
    """Python mirror of ``morton_key`` (test oracle)."""
    v = 0
    for i in range(zoom):
        v += ((tx >> i) & 1) * (1 << (2 * i)) + ((ty >> i) & 1) * (1 << (2 * i + 1))
    return v
