"""Dissolve: group-by attribute + geometric union.

Re-expresses ``gdal vector dissolve`` (``apps/gdalalg_vector_dissolve``
— groupBy + GEOS ``UnaryUnion``; ogr2ogr's ``-dialect sqlite ST_Union``
path) as ``groupBy(attr).applyInPandas(union)``.

Without GEOS in this container the union kernel handles the engine's
workhorse geometry class exactly: axis-aligned rectangles (AOI/admin
boxes, image footprints, tile bounds). Union area and a rectilinear
decomposition are computed by coordinate compression — exact, not
approximate:

1. collect the distinct x / y coordinates of all rect edges in the
   group → a non-uniform grid,
2. a grid cell is covered iff its center lies in ≥1 input rect,
3. union area = Σ covered-cell areas (exact for rectilinear input);
   the covered cells, row-merged, form a MultiPolygon whose union
   equals the true union (pieces share edges instead of being
   merged — area/containment-equivalent to GEOS UnaryUnion output).

Groups containing non-rectangular members take the general path:
``predicates.union_area_polygons`` — exact vertical-slab decomposition
(slab boundaries at every vertex and edge-crossing x; union measure is
linear within a slab, so the midpoint sample integrates each slab
exactly). Both paths are exact; the rect path is just cheaper.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gdal_spark.functions import geometry as G


def _parse_group(pdf: pd.DataFrame, geom: str):
    """(rects array | None, parsed geoms). rects is None when any
    member is non-rectangular → the general slab-union path applies."""
    from gdal_spark.operators.spatial_join import _is_axis_rect

    geoms = [G.parse_wkb(bytes(b)) for b in pdf[geom]]
    rects = []
    for g in geoms:
        if not _is_axis_rect(g):
            return None, geoms
        r = g.rings[0]
        rects.append((r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()))
    return np.asarray(rects, dtype=np.float64), geoms


def union_rects_area(rects: np.ndarray) -> tuple[float, int]:
    """(exact union area, number of covered grid cells)."""
    xs = np.unique(np.concatenate([rects[:, 0], rects[:, 2]]))
    ys = np.unique(np.concatenate([rects[:, 1], rects[:, 3]]))
    cx = (xs[:-1] + xs[1:]) / 2.0
    cy = (ys[:-1] + ys[1:]) / 2.0
    # covered[i,j]: cell (i,j) center inside any rect — vectorized
    inx = (cx[None, :, None] >= rects[:, 0][:, None, None]) & (
        cx[None, :, None] <= rects[:, 2][:, None, None]
    )
    iny = (cy[None, None, :] >= rects[:, 1][:, None, None]) & (
        cy[None, None, :] <= rects[:, 3][:, None, None]
    )
    covered = (inx & iny).any(axis=0)
    w = np.diff(xs)[:, None]
    h = np.diff(ys)[None, :]
    area = float((covered * (w * h)).sum())
    return area, int(covered.sum())


def dissolve(
    polys: DataFrame,
    by: str = "category",
    geom: str = "geom",
) -> DataFrame:
    """groupBy(by) + exact rectilinear union. Returns per group:
    n_polys, union_area, envelope bounds (the dissolve metrics; the
    reference's dissolve emits the merged geometry — envelope + area
    are its verifiable invariants)."""
    schema = (
        f"{by} string, n_polys long, union_area double, "
        "env_lon_min double, env_lat_min double, env_lon_max double, env_lat_max double"
    )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rects, geoms = _parse_group(pdf, geom)
        if rects is not None:
            area, _ = union_rects_area(rects)
            env = (rects[:, 0].min(), rects[:, 1].min(), rects[:, 2].max(), rects[:, 3].max())
        else:
            from gdal_spark.functions.predicates import union_area_polygons

            area = union_area_polygons(geoms)
            boxes = np.asarray([G.geom_bbox(g) for g in geoms], dtype=np.float64)
            env = (boxes[:, 0].min(), boxes[:, 1].min(), boxes[:, 2].max(), boxes[:, 3].max())
        return pd.DataFrame(
            [
                {
                    by: key[0],
                    "n_polys": len(pdf),
                    "union_area": area,
                    "env_lon_min": float(env[0]),
                    "env_lat_min": float(env[1]),
                    "env_lon_max": float(env[2]),
                    "env_lat_max": float(env[3]),
                }
            ]
        )

    return polys.groupBy(by).applyInPandas(run, schema=schema)


def dissolve_geom(
    polys: DataFrame,
    by: str = "category",
    geom: str = "geom",
) -> DataFrame:
    """Dissolve emitting the merged union GEOMETRY (the reference's
    actual ``gdal vector dissolve`` output): groupBy(by) + the slab
    boolean kernel's N-way union (``functions.clipper``) — general
    polygons, concave, holes, shared edges all supported. Returns
    (by, n_polys, geom WKB, union_area, n_rings); union_area is
    recomputed FROM the emitted geometry (exterior − holes), so an
    area oracle checks the geometry itself, not a side channel."""
    from gdal_spark.functions import clipper

    schema = f"{by} string, n_polys long, geom binary, union_area double, n_rings int"

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [G.parse_wkb(bytes(b)) for b in pdf[geom]]
        rings, roles = clipper.boolean_rings([g.rings for g in geoms], "union")
        wkb = clipper.rings_to_wkb(rings, roles)
        area = sum(
            (1.0 if ro else -1.0) * abs(G.ring_signed_area(r))
            for r, ro in zip(rings, roles)
        )
        return pd.DataFrame(
            [
                {
                    by: key[0],
                    "n_polys": len(pdf),
                    "geom": wkb,
                    "union_area": float(area),
                    "n_rings": len(rings),
                }
            ]
        )

    return polys.groupBy(by).applyInPandas(run, schema=schema)
