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
    ST_MakeEnvelope, ST_Distance (point-to-geom),
    ST_Intersects/Disjoint/Within/Contains/Touches/Overlaps/Crosses/
    ST_Equals (geom × geom), ST_Length, ST_GeomFromText, ST_AsBinary,
    ST_IsValid, ST_Buffer, ST_Intersection, ST_Union, ST_Difference,
    ST_Centroid, ST_Envelope, ST_NPoints, ST_SRID
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
)

from gdal_spark.functions import geometry as G


def _fmt_coord(v: float) -> str:
    """Shortest-roundtrip coordinate text (OGR prints %.15g-trimmed)."""
    s = f"{v:.15g}"
    return s


def _wkt(g: G.Geom) -> str:
    if g.has_z or g.has_m:
        tag = ("Z" if g.has_z else "") + ("M" if g.has_m else "")
        if g.gtype == G.WKB_POINT:
            vals = " ".join(_fmt_coord(v) for v in g.full[0][0])
            return f"POINT {tag} ({vals})"
        if g.gtype == G.WKB_LINESTRING:
            pts = ",".join(
                " ".join(_fmt_coord(v) for v in row) for row in g.full[0]
            )
            return f"LINESTRING {tag} ({pts})"
        if g.gtype == G.WKB_POLYGON:
            rings = ",".join(
                "(" + ",".join(" ".join(_fmt_coord(v) for v in row) for row in r) + ")"
                for r in g.full
            )
            return f"POLYGON {tag} ({rings})"
        return g.type_name
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
def st_makepoint_z(x: pd.Series, y: pd.Series, z: pd.Series) -> pd.Series:
    """ST_MakePoint(x, y, z) → ISO POINT Z WKB (ogr_core.h:422-452)."""
    return pd.Series([G.wkb_point(a, b, c) for a, b, c in zip(x, y, z)])


@pandas_udf(DoubleType())
def st_z(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: G.geom_z(G.parse_wkb(b)) if b is not None else None)


@pandas_udf(DoubleType())
def st_m(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: G.geom_m(G.parse_wkb(b)) if b is not None else None)


@pandas_udf(IntegerType())
def st_coorddim(wkb: pd.Series) -> pd.Series:
    return wkb.map(
        lambda b: G.geom_coord_dim(G.parse_wkb(b)) if b is not None else None
    )


@pandas_udf(BinaryType())
def st_force2d(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: G.force_2d(G.parse_wkb(b)) if b is not None else None)


@pandas_udf(DoubleType())
def st_length3d(wkb: pd.Series) -> pd.Series:
    return wkb.map(
        lambda b: G.geom_length3d(G.parse_wkb(b)) if b is not None else None
    )


@pandas_udf(BinaryType())
def st_collect_pair(a: pd.Series, b: pd.Series) -> pd.Series:
    """ST_Collect(a, b) → GEOMETRYCOLLECTION of the two members."""
    return pd.Series(
        [
            G.wkb_geometrycollection([bytes(x), bytes(y)])
            if x is not None and y is not None
            else None
            for x, y in zip(a, b)
        ]
    )


@pandas_udf(IntegerType())
def st_numgeometries(wkb: pd.Series) -> pd.Series:
    """ST_NumGeometries / OGR_G_GetGeometryCount for multi/collection
    types (1 for simple types, matching PostGIS)."""

    def n(b):
        g = G.parse_wkb(b)
        return len(g.parts) if g.parts else 1

    return wkb.map(lambda b: n(b) if b is not None else None)


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


# --- binary predicates / constructive ops (geom × geom over WKB) ----------
# ogrsqlitesqlfunctions.cpp:1188-1240 registers the full ST_ predicate
# and set-op surface; kernels live in functions/predicates.py (exact
# closed form for axis rectangles, vertex/edge kernel otherwise).

from gdal_spark.functions import predicates as P  # noqa: E402


def _make_predicate_udf(name: str):
    @pandas_udf(BooleanType())
    def pred(wa: pd.Series, wb: pd.Series) -> pd.Series:
        # GEOS ufuncs when shapely 2.x is present (one C call per
        # Arrow batch), else the in-repo kernels with per-batch parse
        # caching — see functions/geos_fast.py (prepared-geometry
        # reuse, ogrlayer.cpp:5509-5519)
        from gdal_spark.functions import geos_fast as GF

        return GF.batch_predicate(wa, wb, name)

    return pred


st_intersects = _make_predicate_udf("intersects")
st_disjoint = _make_predicate_udf("disjoint")
st_within = _make_predicate_udf("within")
st_contains = _make_predicate_udf("contains")
st_touches = _make_predicate_udf("touches")
st_overlaps = _make_predicate_udf("overlaps")
st_crosses = _make_predicate_udf("crosses")
st_equals = _make_predicate_udf("equals")


@pandas_udf(DoubleType())
def st_length(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: P.geom_length(G.parse_wkb(bytes(b))) if b is not None else None)


@pandas_udf(BinaryType())
def st_geomfromtext(txt: pd.Series) -> pd.Series:
    return txt.map(lambda t: P.parse_wkt(t) if t is not None else None)


@pandas_udf(BinaryType())
def st_asbinary(wkb: pd.Series) -> pd.Series:
    return wkb  # WKB IS the storage form (ST_AsBinary identity)


@pandas_udf(BooleanType())
def st_isvalid(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: P.is_valid(G.parse_wkb(bytes(b))) if b is not None else None)


@pandas_udf(BinaryType())
def st_buffer(wkb: pd.Series, dist: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if b is None else P.buffer_geom(G.parse_wkb(bytes(b)), float(d))
            for b, d in zip(wkb, dist)
        ]
    )


@pandas_udf(BinaryType())
def st_intersection(wa: pd.Series, wb: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None
            if (a is None or b is None)
            else P.intersection_geom(G.parse_wkb(bytes(a)), G.parse_wkb(bytes(b)))
            for a, b in zip(wa, wb)
        ]
    )


@pandas_udf(BinaryType())
def st_union(wa: pd.Series, wb: pd.Series) -> pd.Series:
    def f(a, b):
        if a is None:
            return b
        if b is None:
            return a
        ga, gb = G.parse_wkb(bytes(a)), G.parse_wkb(bytes(b))
        ra, rb = P.as_rect(ga), P.as_rect(gb)
        if ra is not None and rb is not None:
            return P.union_rects_polygons(np.asarray([ra, rb], dtype=np.float64))
        from gdal_spark.functions.clipper import boolean_geom

        return boolean_geom(ga, gb, "union")

    return pd.Series([f(a, b) for a, b in zip(wa, wb)])


@pandas_udf(BinaryType())
def st_difference(wa: pd.Series, wb: pd.Series) -> pd.Series:
    def f(a, b):
        if a is None:
            return None
        if b is None:
            return a
        ga, gb = G.parse_wkb(bytes(a)), G.parse_wkb(bytes(b))
        ra, rb = P.as_rect(ga), P.as_rect(gb)
        if ra is None or rb is None:
            from gdal_spark.functions.clipper import boolean_geom

            return boolean_geom(ga, gb, "difference")
        parts = P.difference_rects(ra, rb)
        if not parts:
            return None
        return G.wkb_multipolygon(
            [[[(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]] for x0, y0, x1, y1 in parts]
        )

    return pd.Series([f(a, b) for a, b in zip(wa, wb)])


@pandas_udf(BinaryType())
def st_centroid(wkb: pd.Series) -> pd.Series:
    def f(b):
        if b is None:
            return None
        cx, cy = G.geom_centroid(G.parse_wkb(bytes(b)))
        return G.wkb_point(cx, cy)

    return wkb.map(f)


@pandas_udf(BinaryType())
def st_envelope(wkb: pd.Series) -> pd.Series:
    def f(b):
        if b is None:
            return None
        x0, y0, x1, y1 = G.geom_bbox(G.parse_wkb(bytes(b)))
        return G.wkb_bbox_polygon(x0, y0, x1, y1)

    return wkb.map(f)


@pandas_udf(IntegerType())
def st_npoints(wkb: pd.Series) -> pd.Series:
    def f(b):
        if b is None:
            return None
        g = G.parse_wkb(bytes(b))
        return int(sum(len(p) for p in (g.rings or g.coords)))

    return wkb.map(f)


@pandas_udf(IntegerType())
def st_srid(wkb: pd.Series) -> pd.Series:
    # plain (non-EWKB) WKB carries no SRID; OGR reports the layer SRS.
    # The engine's layers are EPSG:4326 by construction.
    return pd.Series([None if b is None else 4326 for b in wkb])


@pandas_udf(BinaryType())
def st_symdifference(wa: pd.Series, wb: pd.Series) -> pd.Series:
    """GEOS SymDifference (ogr_geometry.h:578; SQLite reg :1188) via the
    general slab boolean kernel."""
    from gdal_spark.functions.clipper import boolean_geom

    def f(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return boolean_geom(G.parse_wkb(bytes(a)), G.parse_wkb(bytes(b)), "symdifference")

    return pd.Series([f(a, b) for a, b in zip(wa, wb)])


@pandas_udf(BinaryType())
def st_geomfromwkb(b: pd.Series) -> pd.Series:
    """ST_GeomFromWKB: parse-validate; storage form is already WKB."""

    def f(x):
        if x is None:
            return None
        G.parse_wkb(bytes(x))  # raises on malformed input
        return bytes(x)

    return b.map(f)


@pandas_udf(BinaryType())
def st_line_interpolate_point(wkb: pd.Series, frac: pd.Series) -> pd.Series:
    """ST_Line_Interpolate_Point (spatialite dialect,
    ogrsqlitesqlfunctions.cpp; OGRLineString::Value)."""
    from gdal_spark.functions import linear_ref as LR

    return pd.Series(
        [
            None if b is None else LR.line_interpolate_point(
                G.parse_wkb(bytes(b)), float(f))
            for b, f in zip(wkb, frac)
        ]
    )


@pandas_udf(DoubleType())
def st_line_locate_point(wkb: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    """ST_Line_Locate_Point: fraction of length at the closest point."""
    from gdal_spark.functions import linear_ref as LR

    return pd.Series(
        [
            None if b is None else LR.line_locate_point(
                G.parse_wkb(bytes(b)), float(px), float(py))
            for b, px, py in zip(wkb, x, y)
        ]
    )


@pandas_udf(BinaryType())
def st_line_substring(wkb: pd.Series, f0: pd.Series, f1: pd.Series) -> pd.Series:
    """ST_Line_Substring: subline between two length fractions."""
    from gdal_spark.functions import linear_ref as LR

    return pd.Series(
        [
            None if b is None else LR.line_substring(
                G.parse_wkb(bytes(b)), float(a), float(c))
            for b, a, c in zip(wkb, f0, f1)
        ]
    )


@pandas_udf(BinaryType())
def st_boundary(wkb: pd.Series) -> pd.Series:
    """GEOS Boundary (ogr_geometry.h:560): polygon → its rings as a
    (Multi)LineString; linestring parts pass through unchanged."""

    def f(b):
        if b is None:
            return None
        g = G.parse_wkb(bytes(b))
        parts = [np.asarray(p) for p in (g.rings or g.coords)]
        if not parts:
            return None
        if len(parts) == 1:
            return G.wkb_linestring(parts[0])
        body = b"".join(G.wkb_linestring(p) for p in parts)
        import struct as _s

        return b"\x01" + _s.pack("<II", 5, len(parts)) + body  # MultiLineString

    return wkb.map(f)


@pandas_udf(BinaryType())
def st_simplify(wkb: pd.Series, tol: pd.Series) -> pd.Series:
    """Douglas–Peucker per ring (GEOS Simplify, ogr_geometry.h:584;
    pipeline step apps/gdalalg_vector_simplify.cpp). Ring endpoints are
    kept, so rings stay closed; collapsed rings (<4 pts) are dropped,
    matching SimplifyPreserveTopology's keep-valid behavior on the
    polygon classes this kernel supports."""
    from gdal_spark.operators.vector_ops import simplify_ring

    def f(b, t):
        if b is None:
            return None
        g = G.parse_wkb(bytes(b))
        if not g.rings:
            from gdal_spark.operators.vector_ops import dp_simplify

            return G.wkb_linestring(dp_simplify(np.asarray(g.coords[0]), float(t)))
        out_rings, out_roles = [], []
        for ring, role in zip(g.rings, g.ring_roles):
            s = simplify_ring(np.asarray(ring), float(t))
            if len(s) >= 4:
                out_rings.append(s)
                out_roles.append(role)
        from gdal_spark.functions.clipper import rings_to_wkb

        return rings_to_wkb(out_rings, out_roles)

    return pd.Series([f(b, t) for b, t in zip(wkb, tol)])


@pandas_udf(BooleanType())
def st_issimple(wkb: pd.Series) -> pd.Series:
    """ST_IsSimple: for the polygonal classes simplicity coincides with
    ring non-self-intersection, i.e. the validity kernel; points are
    always simple."""

    def f(b):
        if b is None:
            return None
        g = G.parse_wkb(bytes(b))
        if not g.rings:
            return True
        return P.is_valid(g)

    return wkb.map(f)


@pandas_udf(DoubleType())
def st_distance_geoms(wa: pd.Series, wb: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None
            if (a is None or b is None)
            else P.geom_distance(G.parse_wkb(bytes(a)), G.parse_wkb(bytes(b)))
            for a, b in zip(wa, wb)
        ]
    )


@pandas_udf(DoubleType())
def st_geodesic_area(wkb: pd.Series) -> pd.Series:
    """The SQLite dialect's ST_Area(geom, use_ellipsoid)
    (ogrsqlitesqlfunctions.cpp:1230) / OGRGeometry::get_GeodesicArea —
    WGS84 ellipsoidal area, verified against the reference's published
    values (autotest/ogr/ogr_geom.py:4742) in tests/test_geodesic.py."""
    from gdal_spark.functions.geodesic import geodesic_area

    return wkb.map(
        lambda b: geodesic_area(G.parse_wkb(bytes(b))) if b is not None else None
    )


@pandas_udf(DoubleType())
def st_geodesic_length(wkb: pd.Series) -> pd.Series:
    """ST_Length(geom, use_ellipsoid) / get_GeodesicLength — Vincenty
    segment sum (autotest/ogr/ogr_geom.py:4926)."""
    from gdal_spark.functions.geodesic import geodesic_length

    return wkb.map(
        lambda b: geodesic_length(G.parse_wkb(bytes(b))) if b is not None else None
    )


@pandas_udf(BinaryType())
def ogr_deflate(data: pd.Series) -> pd.Series:
    """ogr_deflate(blob|text) → zlib blob (ogrsqlitesqlfunctions.cpp:1111)."""
    import zlib

    return data.map(
        lambda v: None
        if v is None
        else zlib.compress(v.encode() if isinstance(v, str) else bytes(v))
    )


@pandas_udf(BinaryType())
def ogr_inflate(data: pd.Series) -> pd.Series:
    """ogr_inflate(blob) → decompressed blob (ogrsqlitesqlfunctions.cpp:1124)."""
    import zlib

    return data.map(lambda v: None if v is None else zlib.decompress(bytes(v)))


@pandas_udf(BinaryType())
def st_makeline(a: pd.Series, b: pd.Series) -> pd.Series:
    """spatialite MakeLine(a, b): 2-point LINESTRING from two points."""
    out = []
    for wa, wb in zip(a, b):
        if wa is None or wb is None:
            out.append(None)
            continue
        ga, gb = G.parse_wkb(bytes(wa)), G.parse_wkb(bytes(wb))
        out.append(
            G.wkb_linestring(
                np.array(
                    [
                        [ga.coords[0][0, 0], ga.coords[0][0, 1]],
                        [gb.coords[0][0, 0], gb.coords[0][0, 1]],
                    ]
                )
            )
        )
    return pd.Series(out)


@pandas_udf(DoubleType())
def st_azimuth(a: pd.Series, b: pd.Series) -> pd.Series:
    """ST_Azimuth (spatialite ogrsqlitesqlfunctions.cpp registration
    surface / PostGIS semantics): planar bearing A→B in radians
    clockwise from north, in [0, 2π); NULL for coincident points."""
    import math

    out = []
    for wa, wb in zip(a, b):
        if wa is None or wb is None:
            out.append(None)
            continue
        ga, gb = G.parse_wkb(bytes(wa)), G.parse_wkb(bytes(wb))
        x1, y1 = ga.coords[0][0, 0], ga.coords[0][0, 1]
        x2, y2 = gb.coords[0][0, 0], gb.coords[0][0, 1]
        dx, dy = float(x2 - x1), float(y2 - y1)
        if dx == 0.0 and dy == 0.0:
            out.append(None)
            continue
        az = math.atan2(dx, dy)
        out.append(az + 2.0 * math.pi if az < 0.0 else az)
    return pd.Series(out)


@pandas_udf(BinaryType())
def st_project(pt: pd.Series, dist: pd.Series, azimuth: pd.Series) -> pd.Series:
    """ST_Project (spatialite geodesic semantics): destination point
    from start + distance (meters) + azimuth (radians from north) via
    Vincenty's direct formula on WGS84 — the ellipsoid the reference
    routes through PROJ (``ogr/ogrct.cpp``)."""
    import math

    from gdal_spark.functions import geodesic as GE

    out = []
    for w, d, az in zip(pt, dist, azimuth):
        if w is None or d is None or az is None:
            out.append(None)
            continue
        g = G.parse_wkb(bytes(w))
        lon1, lat1 = float(g.coords[0][0, 0]), float(g.coords[0][0, 1])
        phi2, dlam = GE.vincenty_direct(lat1, lon1, float(az), float(d))
        out.append(
            G.wkb_point(lon1 + math.degrees(dlam), math.degrees(phi2))
        )
    return pd.Series(out)


def _snap_arr(arr: np.ndarray, size: float) -> np.ndarray:
    """floor(x/size + 0.5)·size per coordinate — the SQL-twin-safe tie
    rule (DuckDB round() is half-away, np.round half-even; floor+0.5
    is identical in both engines)."""
    out = arr.copy()
    out[:, :2] = np.floor(arr[:, :2] / size + 0.5) * size
    return out


def _dedupe_consecutive(arr: np.ndarray, close_ring: bool) -> np.ndarray:
    keep = np.ones(len(arr), dtype=bool)
    keep[1:] = (arr[1:, 0] != arr[:-1, 0]) | (arr[1:, 1] != arr[:-1, 1])
    out = arr[keep]
    if close_ring and len(out) and (out[0, 0] != out[-1, 0] or out[0, 1] != out[-1, 1]):
        out = np.vstack([out, out[:1]])
    return out


def _snap_geom(g: "G.Geom", size: float) -> "G.Geom":
    g.rings = [
        _dedupe_consecutive(_snap_arr(r, size), close_ring=True) for r in g.rings
    ]
    g.coords = [
        _dedupe_consecutive(_snap_arr(c, size), close_ring=False) for c in g.coords
    ]
    g.full = [_snap_arr(f, size) for f in g.full]
    g.parts = [_snap_geom(p, size) for p in g.parts]
    return g


@pandas_udf(BinaryType())
def st_snaptogrid(wkb: pd.Series, size: pd.Series) -> pd.Series:
    """ST_SnapToGrid: round every vertex to the nearest grid multiple
    (origin 0,0); consecutive duplicates collapse, rings re-close —
    PostGIS/spatialite grid-snap semantics."""
    return pd.Series(
        [
            None
            if b is None
            else G.geom_to_wkb(_snap_geom(G.parse_wkb(bytes(b)), float(s)))
            for b, s in zip(wkb, size)
        ]
    )


def _reverse_geom(g: "G.Geom") -> "G.Geom":
    g.rings = [np.ascontiguousarray(r[::-1]) for r in g.rings]
    g.coords = [np.ascontiguousarray(c[::-1]) for c in g.coords]
    g.full = [np.ascontiguousarray(f[::-1]) for f in g.full]
    g.parts = [_reverse_geom(p) for p in g.parts]
    return g


@pandas_udf(BinaryType())
def st_reverse(wkb: pd.Series) -> pd.Series:
    """ST_Reverse / OGRGeometry::reversePoints: vertex order flipped
    per ring / line part (Z/M preserved via the full-width arrays)."""
    return pd.Series(
        [
            None
            if b is None
            else G.geom_to_wkb(_reverse_geom(G.parse_wkb(bytes(b))))
            for b in wkb
        ]
    )


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
    "ST_MakePointZ": st_makepoint_z,
    "ST_Z": st_z,
    "ST_M": st_m,
    "ST_CoordDim": st_coorddim,
    "ST_Force2D": st_force2d,
    "ST_Length3D": st_length3d,
    "ST_Collect": st_collect_pair,
    "ST_NumGeometries": st_numgeometries,
    "ST_MakeEnvelope": st_makeenvelope,
    "ST_Distance": st_distance_geoms,
    "ST_DistancePoint": st_distance_point,
    # geom × geom predicates (ogrsqlitesqlfunctions.cpp:1188-1240)
    "ST_Intersects": st_intersects,
    "ST_Disjoint": st_disjoint,
    "ST_Within": st_within,
    "ST_Contains": st_contains,
    "ST_Touches": st_touches,
    "ST_Overlaps": st_overlaps,
    "ST_Crosses": st_crosses,
    "ST_Equals": st_equals,
    # constructive / scalar
    "ST_Length": st_length,
    "ST_GeomFromText": st_geomfromtext,
    "ST_AsBinary": st_asbinary,
    "ST_IsValid": st_isvalid,
    "ST_Buffer": st_buffer,
    "ST_Intersection": st_intersection,
    "ST_Union": st_union,
    "ST_Difference": st_difference,
    "ST_Centroid": st_centroid,
    "ST_Envelope": st_envelope,
    "ST_NPoints": st_npoints,
    "ST_SRID": st_srid,
    "ST_SymDifference": st_symdifference,
    "ST_GeomFromWKB": st_geomfromwkb,
    "ST_Boundary": st_boundary,
    "ST_Line_Interpolate_Point": st_line_interpolate_point,
    "ST_Line_Locate_Point": st_line_locate_point,
    "ST_Line_Substring": st_line_substring,
    "ST_Simplify": st_simplify,
    "ST_SimplifyPreserveTopology": st_simplify,
    "ST_IsSimple": st_issimple,
    "ogr_deflate": ogr_deflate,
    "ogr_inflate": ogr_inflate,
    "ST_GeodesicArea": st_geodesic_area,
    "ST_GeodesicLength": st_geodesic_length,
    "ST_MakeLine": st_makeline,
    "ST_Azimuth": st_azimuth,
    "ST_Project": st_project,
    "ST_SnapToGrid": st_snaptogrid,
    "ST_Reverse": st_reverse,
}


def _late_registrations():
    """Registrations that import from operators (avoid cycles)."""
    from gdal_spark.operators.cdt import st_constrained_delaunay
    from gdal_spark.operators.vector_ops import st_wrapdateline

    @pandas_udf(BinaryType())
    def st_cdt_udf(wkb: pd.Series) -> pd.Series:
        return wkb.map(
            lambda b: None if b is None else st_constrained_delaunay(bytes(b))
        )

    return {
        "ST_WrapDateLine": st_wrapdateline,
        "ST_ConstrainedDelaunayTriangles": st_cdt_udf,
    }


def register_st_functions(spark: SparkSession) -> None:
    """Make the ST_ set callable from ``spark.sql`` strings."""
    for name, fn in _REGISTRY.items():
        spark.udf.register(name, fn)
    for name, fn in _late_registrations().items():
        spark.udf.register(name, fn)
