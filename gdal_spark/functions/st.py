"""ST_ scalar function surface — SQL-registered geometry functions.

Mirrors the SQLite-dialect ST_ registrations
(``ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:1188-1240``) and
the GEOS-backed ``OGRGeometry`` methods (``ogr/ogr_geometry.h:547-606``)
over WKB ``BinaryType`` columns.  Each function is one Arrow-batched
pandas UDF wrapping the vectorized NumPy kernel in
``gdal_spark.functions.geometry`` (shapely-free), registered for SQL
via ``spark.udf.register`` — the Spark analogue of
``sqlite3_create_function`` (``ogrsqlitesqlfunctions.cpp:1111``).

Registered names (call ``register_st_functions(spark)`` once):

    ST_Area, ST_GeometryType, ST_IsEmpty, ST_X, ST_Y (centroid),
    ST_AsText, ST_ContainsPoint, ST_IntersectsBox, ST_MakePoint,
    ST_MakeEnvelope, ST_Distance (point-to-geom)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, BooleanType, DoubleType, StringType

from gdal_spark.functions import geometry as G


def _fmt_coord(v: float) -> str:
    """Shortest-roundtrip coordinate text (OGR prints %.15g-trimmed)."""
    s = f"{v:.15g}"
    return s


def _wkt(g: G.Geom) -> str:
    if g.gtype == G.WKB_POINT:
        x, y = g.coords[0][0]
        return f"POINT ({_fmt_coord(x)} {_fmt_coord(y)})"
    if g.gtype == G.WKB_LINESTRING:
        pts = ",".join(f"{_fmt_coord(x)} {_fmt_coord(y)}" for x, y in g.coords[0])
        return f"LINESTRING ({pts})"
    if g.gtype == G.WKB_POLYGON:
        rings = ",".join(
            "(" + ",".join(f"{_fmt_coord(x)} {_fmt_coord(y)}" for x, y in r) + ")"
            for r in g.rings
        )
        return f"POLYGON ({rings})"
    if g.gtype == G.WKB_MULTIPOLYGON:
        polys = ",".join(
            "((" + ",".join(f"{_fmt_coord(x)} {_fmt_coord(y)}" for x, y in r) + "))"
            for r in g.rings
        )
        return f"MULTIPOLYGON ({polys})"
    return g.type_name


@pandas_udf(DoubleType())
def st_area(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: G.geom_area(G.parse_wkb(b)) if b is not None else None)


@pandas_udf(StringType())
def st_geometrytype(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: G.parse_wkb(b).type_name if b is not None else None)


@pandas_udf(BooleanType())
def st_isempty(wkb: pd.Series) -> pd.Series:
    def f(b):
        if b is None:
            return None
        g = G.parse_wkb(b)
        return not (g.rings or g.coords)

    return wkb.map(f)


@pandas_udf(DoubleType())
def st_centroid_x(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: G.geom_centroid(G.parse_wkb(b))[0] if b is not None else None)


@pandas_udf(DoubleType())
def st_centroid_y(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: G.geom_centroid(G.parse_wkb(b))[1] if b is not None else None)


@pandas_udf(StringType())
def st_astext(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: _wkt(G.parse_wkb(b)) if b is not None else None)


@pandas_udf(BooleanType())
def st_contains_point(wkb: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
    """Prepared-geometry reuse: parse each distinct WKB once per batch
    (``ogrlayer.cpp:5509-5519`` analogue)."""
    out = np.zeros(len(wkb), dtype=bool)
    px = lon.to_numpy(dtype=np.float64)
    py = lat.to_numpy(dtype=np.float64)
    for key, idx in wkb.map(lambda b: bytes(b) if b is not None else b"").groupby(
        wkb.map(lambda b: bytes(b) if b is not None else b"")
    ).indices.items():
        if not key:
            continue
        g = G.parse_wkb(key)
        out[idx] = G.points_in_geom(px[idx], py[idx], g)
    return pd.Series(out)


@pandas_udf(BooleanType())
def st_intersects_box(
    wkb: pd.Series, xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series
) -> pd.Series:
    def f(b, x0, y0, x1, y1):
        if b is None:
            return None
        rect = G.parse_wkb(G.wkb_bbox_polygon(x0, y0, x1, y1))
        return G.geoms_intersect(rect, G.parse_wkb(b))

    return pd.Series(
        [f(b, x0, y0, x1, y1) for b, x0, y0, x1, y1 in zip(wkb, xmin, ymin, xmax, ymax)]
    )


@pandas_udf(BinaryType())
def st_makepoint(x: pd.Series, y: pd.Series) -> pd.Series:
    return pd.Series([G.wkb_point(a, b) for a, b in zip(x, y)])


@pandas_udf(BinaryType())
def st_makeenvelope(
    xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series
) -> pd.Series:
    return pd.Series(
        [G.wkb_bbox_polygon(a, b, c, d) for a, b, c, d in zip(xmin, ymin, xmax, ymax)]
    )


@pandas_udf(DoubleType())
def st_distance_point(wkb: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
    out = np.zeros(len(wkb), dtype=np.float64)
    px = lon.to_numpy(dtype=np.float64)
    py = lat.to_numpy(dtype=np.float64)
    for i, b in enumerate(wkb):
        if b is None:
            out[i] = np.nan
            continue
        out[i] = float(G.points_to_geom_distance(px[i : i + 1], py[i : i + 1], G.parse_wkb(b))[0])
    return pd.Series(out)


_REGISTRY = {
    "ST_Area": st_area,
    "ST_GeometryType": st_geometrytype,
    "ST_IsEmpty": st_isempty,
    "ST_X": st_centroid_x,
    "ST_Y": st_centroid_y,
    "ST_AsText": st_astext,
    "ST_ContainsPoint": st_contains_point,
    "ST_IntersectsBox": st_intersects_box,
    "ST_MakePoint": st_makepoint,
    "ST_MakeEnvelope": st_makeenvelope,
    "ST_Distance": st_distance_point,
}


def register_st_functions(spark: SparkSession) -> None:
    """Make the ST_ set callable from ``spark.sql`` strings."""
    for name, fn in _REGISTRY.items():
        spark.udf.register(name, fn)
