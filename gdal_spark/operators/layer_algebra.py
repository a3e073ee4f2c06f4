"""Layer algebra: Clip / Erase / Identity / Union — the OGR layer-pair
set operations (``ogr/ogrsf_frmts/ogrsf_frmts.h:327-352``, impls
``ogrlayer.cpp:5711+``) re-expressed as Spark joins.

The reference runs a nested loop with per-feature spatial filter and a
GEOS set-op refine; here the candidate pairing is the cell-prefix /
bbox equi-join of ``operators.spatial_join`` and the refine swaps the
per-pair geometry op (SURVEY.md §2.3 "same join plan, different set
algebra").  For the engine's workhorse case — axis-aligned footprints
× axis-aligned AOIs — Clip is closed-form (interval intersection) and
stays 100% JVM-side SQL; general polygon clipping drops into the
Sutherland–Hodgman kernel (``geometry.clip_ring_to_bbox``) per pair.

Erase (anti) and semi joins mirror ``OGRLayer::Erase``
(``ogrsf_frmts.h:350``) via Spark's native left_anti / left_semi.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.operators.spatial_join import bbox_intersection_join


def clip_boxes(
    left: DataFrame,
    clip_df: DataFrame,
    left_bbox=("lon_min", "lat_min", "lon_max", "lat_max"),
    clip_bbox=("lon_min", "lat_min", "lon_max", "lat_max"),
    broadcast_clip: bool = True,
) -> DataFrame:
    """``OGRLayer::Clip`` for box×box: one output row per intersecting
    (left, clip) pair with the intersection rectangle — closed-form
    greatest/least, no UDF (the rectangle case of
    ``clip_ring_to_bbox``).

    Candidates come from the cell equi-join of
    ``bbox_intersection_join`` (reference-cell dedup, no distinct) —
    never a cross product, so the plan survives a wide/large clip
    layer at 100× scale. ``broadcast_clip=False`` drops the broadcast
    hint for a non-dim clip side and lets AQE pick the strategy."""
    lx0, ly0, lx1, ly1 = left_bbox
    pairs = bbox_intersection_join(
        left,
        clip_df,
        left_bbox=left_bbox,
        poly_bbox=clip_bbox,
        refine=False,
        broadcast_polys=broadcast_clip,
    )
    # bbox_intersection_join prefixes colliding clip bbox cols with q_
    cx0, cy0, cx1, cy1 = (
        f"q_{c}" if c in left.columns else c for c in clip_bbox
    )
    return (
        pairs.withColumn("clip_lon_min", F.greatest(F.col(lx0), F.col(cx0)))
        .withColumn("clip_lat_min", F.greatest(F.col(ly0), F.col(cy0)))
        .withColumn("clip_lon_max", F.least(F.col(lx1), F.col(cx1)))
        .withColumn("clip_lat_max", F.least(F.col(ly1), F.col(cy1)))
    )


def identity_boxes(
    left: DataFrame,
    method: DataFrame,
    left_bbox=("lon_min", "lat_min", "lon_max", "lat_max"),
    method_bbox=("lon_min", "lat_min", "lon_max", "lat_max"),
    broadcast_method: bool = True,
) -> DataFrame:
    """``OGRLayer::Identity`` piece output for the box×box case
    (``ogrsf_frmts.h:331-352``): every overlapping (left, method) pair
    decomposes the left rectangle into the intersection piece
    (``part='int'``) and ≤4 exact difference strips (``part='diff'``,
    bottom/top/left/right of the guillotine decomposition —
    ``predicates.difference_rects`` in closed SQL form). SymDifference
    and Update are selections over the same pieces. All coordinates
    are greatest/least arithmetic — JVM-side, oracle-exact."""
    lx0, ly0, lx1, ly1 = left_bbox
    pairs = clip_boxes(left, method, left_bbox, method_bbox, broadcast_clip=broadcast_method)
    # strict-overlap pairs only (Identity emits nothing for touches)
    pairs = pairs.filter(
        (F.col("clip_lon_min") < F.col("clip_lon_max"))
        & (F.col("clip_lat_min") < F.col("clip_lat_max"))
    )
    ix0, iy0 = F.col("clip_lon_min"), F.col("clip_lat_min")
    ix1, iy1 = F.col("clip_lon_max"), F.col("clip_lat_max")
    fx0, fy0 = F.col(lx0), F.col(ly0)
    fx1, fy1 = F.col(lx1), F.col(ly1)
    keep = [c for c in pairs.columns if not c.startswith("clip_")]

    def piece(part, x0, y0, x1, y1, cond=None):
        p = pairs.select(
            *keep,
            F.lit(part).alias("part"),
            x0.alias("px0"),
            y0.alias("py0"),
            x1.alias("px1"),
            y1.alias("py1"),
        )
        return p.filter(cond) if cond is not None else p

    out = piece("int", ix0, iy0, ix1, iy1)
    for cond, x0, y0, x1, y1 in (
        (fy0 < iy0, fx0, fy0, fx1, iy0),  # bottom strip
        (iy1 < fy1, fx0, iy1, fx1, fy1),  # top strip
        (fx0 < ix0, fx0, iy0, ix0, iy1),  # left strip
        (ix1 < fx1, ix1, iy0, fx1, iy1),  # right strip
    ):
        out = out.unionByName(piece("diff", x0, y0, x1, y1, cond))
    return out


def spatial_semi_join(left: DataFrame, polys: DataFrame, **kwargs) -> DataFrame:
    """Rows of ``left`` intersecting ≥1 polygon (the positive half of
    Identity): left_semi against the candidate pairs."""
    pairs = bbox_intersection_join(left, polys, **kwargs)
    key = left.columns[0]
    return left.join(pairs.select(key).distinct(), key, "left_semi")


def spatial_anti_join(left: DataFrame, polys: DataFrame, **kwargs) -> DataFrame:
    """``OGRLayer::Erase`` footprint-level analogue: rows of ``left``
    intersecting NO polygon (left_anti on the pair keys)."""
    pairs = bbox_intersection_join(left, polys, **kwargs)
    key = left.columns[0]
    return left.join(pairs.select(key).distinct(), key, "left_anti")


def union_layers(a: DataFrame, b: DataFrame) -> DataFrame:
    """``OGRUnionLayer`` (``ogrunionlayer.h:59``): schema-merging union
    of two layers; missing fields NULL-padded."""
    return a.unionByName(b, allowMissingColumns=True)
