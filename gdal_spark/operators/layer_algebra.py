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
