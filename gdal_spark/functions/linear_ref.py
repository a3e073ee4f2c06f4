"""Linear referencing — ogrlineref + the spatialite dialect trio.

The reference ships linear referencing twice: the ``ogrlineref`` app
(``apps/ogrlineref.cpp`` — create mileposts along a line, locate a
point's position, extract the subline between two positions) and the
SQLite-dialect functions ``ST_Line_Interpolate_Point`` /
``ST_Line_Locate_Point`` / ``ST_Line_Substring``
(``ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp``, spatialite
semantics; OGRLineString::Value ``ogr/ogrlinestring.cpp``).

Kernels are NumPy-vectorized over the vertex arrays (cumulative
segment lengths, one pass); positions are FRACTIONS of total length
(spatialite convention).  Registered as ST_ SQL functions in
``functions/st.py`` so they run in Arrow batches like the rest of the
surface.  ``mileposts`` is the ogrlineref -create analogue: one output
point row per step along each input line (explode, fully distributed).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.functions import geometry as G


def _line_coords(g: G.Geom) -> np.ndarray:
    """Vertex array of a LineString (or the exterior ring of a
    Polygon — ogrlineref accepts either; rings are already closed)."""
    if g.gtype == G.WKB_LINESTRING:
        return np.asarray(g.coords[0], dtype=np.float64)
    if g.gtype == G.WKB_POLYGON:
        return np.asarray(g.rings[0], dtype=np.float64)
    raise ValueError(f"linear referencing needs a line, got type {g.gtype}")


def _cumlen(pts: np.ndarray) -> np.ndarray:
    d = np.diff(pts, axis=0)
    seg = np.sqrt((d * d).sum(axis=1))
    return np.concatenate([[0.0], np.cumsum(seg)])


def line_interpolate_point(g: G.Geom, frac: float) -> bytes:
    """Point at ``frac`` ∈ [0,1] of the line's length
    (ST_Line_Interpolate_Point / OGRLineString::Value)."""
    pts = _line_coords(g)
    cl = _cumlen(pts)
    total = cl[-1]
    if total == 0:
        return G.wkb_point(*pts[0])
    d = min(max(float(frac), 0.0), 1.0) * total
    i = int(np.searchsorted(cl, d, side="right") - 1)
    i = min(i, len(pts) - 2)
    seg = cl[i + 1] - cl[i]
    t = 0.0 if seg == 0 else (d - cl[i]) / seg
    p = pts[i] + t * (pts[i + 1] - pts[i])
    return G.wkb_point(float(p[0]), float(p[1]))


def line_locate_point(g: G.Geom, x: float, y: float) -> float:
    """Fraction of the line's length at the closest point to (x, y)
    (ST_Line_Locate_Point).  Vectorized projection onto all segments."""
    pts = _line_coords(g)
    cl = _cumlen(pts)
    total = cl[-1]
    if total == 0:
        return 0.0
    a = pts[:-1]
    ab = pts[1:] - a
    denom = (ab * ab).sum(axis=1)
    denom[denom == 0] = 1.0
    q = np.array([x, y], dtype=np.float64)
    t = np.clip(((q - a) * ab).sum(axis=1) / denom, 0.0, 1.0)
    proj = a + t[:, None] * ab
    d2 = ((proj - q) ** 2).sum(axis=1)
    i = int(np.argmin(d2))
    return float((cl[i] + t[i] * (cl[i + 1] - cl[i])) / total)


def line_substring(g: G.Geom, f0: float, f1: float) -> bytes:
    """Subline between fractions ``f0 ≤ f1`` (ST_Line_Substring /
    ogrlineref -l … subline extraction)."""
    pts = _line_coords(g)
    cl = _cumlen(pts)
    total = cl[-1]
    f0, f1 = sorted((max(0.0, float(f0)), min(1.0, float(f1))))
    if total == 0 or f0 == f1:
        p = G.parse_wkb(line_interpolate_point(g, f0))
        c = p.coords[0][0]
        return G.wkb_linestring([[c[0], c[1]], [c[0], c[1]]])
    d0, d1 = f0 * total, f1 * total

    def at(d):
        i = min(int(np.searchsorted(cl, d, side="right") - 1), len(pts) - 2)
        seg = cl[i + 1] - cl[i]
        t = 0.0 if seg == 0 else (d - cl[i]) / seg
        return i, pts[i] + t * (pts[i + 1] - pts[i])

    i0, p0 = at(d0)
    i1, p1 = at(d1)
    mid = pts[i0 + 1:i1 + 1]
    out = [p0] + [p for p in mid] + [p1]
    # drop duplicated knots (d0/d1 exactly on a vertex)
    dedup = [out[0]]
    for p in out[1:]:
        if not np.array_equal(p, dedup[-1]):
            dedup.append(p)
    if len(dedup) == 1:
        dedup.append(dedup[0])
    return G.wkb_linestring(np.asarray(dedup))


def mileposts(g: G.Geom, step_frac: float) -> list[tuple[float, bytes]]:
    """ogrlineref -create analogue: (fraction, point WKB) every
    ``step_frac`` of the line (inclusive of both ends)."""
    n = int(round(1.0 / step_frac))
    return [(k * step_frac, line_interpolate_point(g, k * step_frac))
            for k in range(n + 1)]
