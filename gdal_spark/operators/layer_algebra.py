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

import numpy as np
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
    keep_lower_dims: bool = False,
    promote_to_multi: bool = False,
) -> DataFrame:
    """``OGRLayer::Identity`` piece output for the box×box case
    (``ogrsf_frmts.h:331-352``): every overlapping (left, method) pair
    decomposes the left rectangle into the intersection piece
    (``part='int'``) and ≤4 exact difference strips (``part='diff'``,
    bottom/top/left/right of the guillotine decomposition —
    ``predicates.difference_rects`` in closed SQL form). SymDifference
    and Update are selections over the same pieces. All coordinates
    are greatest/least arithmetic — JVM-side, oracle-exact.

    Options (``ogrlayer.cpp:5404-5410`` method-option parity):

    - ``keep_lower_dims`` = KEEP_LOWER_DIMENSION_GEOMETRIES: touching
      pairs contribute their degenerate (zero-area: a line or point)
      intersection piece instead of being dropped.
    - ``promote_to_multi`` = PROMOTE_TO_MULTI: one row per (left,
      method) pair with the pieces collected into a ``pieces`` array
      column (the MULTIPOLYGON promotion of the geometry model).
    """
    lx0, ly0, lx1, ly1 = left_bbox
    pairs = clip_boxes(left, method, left_bbox, method_bbox, broadcast_clip=broadcast_method)
    if keep_lower_dims:
        # touching pairs keep a degenerate intersection (dim < 2)
        pairs = pairs.filter(
            (F.col("clip_lon_min") <= F.col("clip_lon_max"))
            & (F.col("clip_lat_min") <= F.col("clip_lat_max"))
        )
    else:
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
    strict = (ix0 < ix1) & (iy0 < iy1)
    for cond, x0, y0, x1, y1 in (
        (strict & (fy0 < iy0), fx0, fy0, fx1, iy0),  # bottom strip
        (strict & (iy1 < fy1), fx0, iy1, fx1, fy1),  # top strip
        (strict & (fx0 < ix0), fx0, iy0, ix0, iy1),  # left strip
        (strict & (ix1 < fx1), ix1, iy0, fx1, iy1),  # right strip
    ):
        out = out.unionByName(piece("diff", x0, y0, x1, y1, cond))
    if keep_lower_dims:
        # a degenerate (line/point) intersection does not split the
        # input: its difference piece is the whole input rectangle
        out = out.unionByName(piece("diff", fx0, fy0, fx1, fy1, ~strict))
    if promote_to_multi:
        out = out.groupBy(*keep).agg(
            F.sort_array(
                F.collect_list(F.struct("part", "px0", "py0", "px1", "py1"))
            ).alias("pieces")
        )
    return out


def _slab_subtract(X0, Y0, X1, Y1, boxes):
    """Canonical vertical-slab decomposition of rect minus union(boxes)
    (boxes pre-clipped to the rect): slab edges are every distinct
    clipped x; within a slab the uncovered y-gaps of the merged
    covering intervals are the pieces. Canonical means a SQL engine
    can reproduce the EXACT same piece set (gaps-and-islands over the
    same greatest/least values) — the dual-oracle currency of the
    ``layer_update``/``layer_symdifference`` driver queries.

    Vectorized: pure comparison/selection over the input doubles (no
    arithmetic), so the emitted values are bit-identical to the scalar
    scan and to the SQL window-function construction."""
    if not boxes:
        return [(X0, Y0, X1, Y1)]
    b = np.asarray(boxes, dtype=np.float64)
    b0, b1, b2, b3 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    xs = np.unique(np.concatenate((np.array([X0, X1]), b0, b2)))
    nslab = len(xs) - 1
    # slab i (edges xs[i], xs[i+1]) is covered by box k iff
    # b0[k] <= xs[i] and b2[k] >= xs[i+1]; b0/b2 are members of xs, so
    # the covered slabs are exactly [pos(b0[k]), pos(b2[k]) - 1] —
    # total stabbing count T replaces the old O(m·slabs) mask.
    s_lo = np.searchsorted(xs, b0, side="left")
    s_hi = np.searchsorted(xs, b2, side="left")  # exclusive slab end
    counts = s_hi - s_lo
    T = int(counts.sum())
    out = []
    covered = np.zeros(nslab, dtype=bool)
    if T:
        box_ids = np.repeat(np.arange(len(b)), counts)
        offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
        sl = np.arange(T) - np.repeat(offs, counts) + np.repeat(s_lo, counts)
        a, e = b1[box_ids], b3[box_ids]
        o = np.lexsort((e, a, sl))
        sl, a, e = sl[o], a[o], e[o]
        covered[np.unique(sl)] = True
        starts = np.ones(T, dtype=bool)
        starts[1:] = sl[1:] != sl[:-1]
        seg_start = np.where(starts)[0]
        seg0 = np.repeat(seg_start, np.diff(np.append(seg_start, T)))
        # exclusive prefix values: p[i] = e[i-1] within segment, Y0 at
        # segment start; segmented inclusive prefix-max of p by offset
        # doubling reproduces the scalar scan's running `cur` exactly
        # (pure max/selection — no arithmetic, bit-identical)
        p = np.empty(T, dtype=np.float64)
        p[0] = Y0
        p[1:] = e[:-1]
        p[starts] = Y0
        idx = np.arange(T)
        val = p
        shift = 1
        while shift < T:
            can = idx - shift >= seg0
            cand = np.empty_like(val)
            cand[shift:] = val[:-shift]
            cand[:shift] = val[:shift]
            val = np.where(can, np.maximum(val, cand), val)
            shift *= 2
        cur = np.maximum(val, Y0)
        g = a > cur
        if g.any():
            sa_g, sb_g = xs[sl[g]], xs[sl[g] + 1]
            out.extend(
                zip(sa_g.tolist(), cur[g].tolist(), sb_g.tolist(), a[g].tolist())
            )
        # per-segment final cover end = max(Y0, max e in segment)
        ends = np.concatenate((seg_start[1:] - 1, [T - 1]))
        # cur[last] is the exclusive prefix max; including e[last]
        # gives the segment's full cover end (the scalar scan's final
        # `cur`), already floored at Y0
        last_cover = np.maximum(cur[ends], e[ends])
        tail = last_cover < Y1
        if tail.any():
            sl_t = sl[ends][tail]
            out.extend(
                zip(
                    xs[sl_t].tolist(),
                    last_cover[tail].tolist(),
                    xs[sl_t + 1].tolist(),
                    np.full(tail.sum(), Y1).tolist(),
                )
            )
    un = np.where(~covered)[0]
    out.extend(
        (float(xs[i]), Y0, float(xs[i + 1]), Y1) for i in un.tolist()
    )
    return out


def update_boxes(
    left: DataFrame,
    method: DataFrame,
    left_bbox=("lon_min", "lat_min", "lon_max", "lat_max"),
    method_bbox=("lon_min", "lat_min", "lon_max", "lat_max"),
    key: str | None = None,
    broadcast_method: bool = True,
) -> DataFrame:
    """``OGRLayer::Update`` (``ogrsf_frmts.h:331-352``, impl
    ``ogrlayer.cpp:5711+``) for the box model: the output contains

    - every *untouched* input feature unchanged (``part='orig'``),
    - each *touched* input feature's geometry MINUS the union of all
      intersecting method boxes, as the canonical vertical-slab
      decomposition of the difference region (``part='diff'``,
      :func:`_slab_subtract`) — a fully-covered input disappears,
      exactly as the reference drops empty difference geometries,
    - (the method layer itself is appended by the caller via
      :func:`union_layers` when full Update output is wanted — kept
      separate so schema policy stays explicit).

    Shape for scale: candidates from the cell equi-join (never a cross
    product), then the per-feature method boxes are gathered JVM-side
    (``groupBy(key).agg(collect_list)`` — map-side combinable) and ONE
    ``mapInPandas`` Arrow stage runs the slab-difference kernel per
    feature ROW. This deliberately avoids ``applyInPandas``: with
    hundreds of thousands of touched features the per-group pandas
    spin-up dominated wall time (~1 ms/group); batching features as
    rows makes per-feature cost just the vectorized kernel call."""
    import pandas as pd

    lx0, ly0, lx1, ly1 = left_bbox
    key = key or left.columns[0]
    pairs = clip_boxes(
        left, method, left_bbox, method_bbox, broadcast_clip=broadcast_method
    )
    pairs = pairs.filter(
        (F.col("clip_lon_min") < F.col("clip_lon_max"))
        & (F.col("clip_lat_min") < F.col("clip_lat_max"))
    )
    keep = [c for c in left.columns]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields
    )
    out_schema += ", part string, px0 double, py0 double, px1 double, py1 double"

    gathered = pairs.groupBy(key).agg(
        *[F.first(c).alias(c) for c in keep if c != key],
        F.collect_list(
            F.array("clip_lon_min", "clip_lat_min", "clip_lon_max", "clip_lat_max")
        ).alias("_boxes"),
    )

    def erase_rows(it):
        for pdf in it:
            out = {c: [] for c in keep + ["part", "px0", "py0", "px1", "py1"]}
            cols = {c: pdf[c].values for c in keep}
            bx0, by0 = pdf[lx0].values, pdf[ly0].values
            bx1, by1 = pdf[lx1].values, pdf[ly1].values
            boxes_col = pdf["_boxes"].values
            for i in range(len(pdf)):
                rects = _slab_subtract(
                    float(bx0[i]),
                    float(by0[i]),
                    float(bx1[i]),
                    float(by1[i]),
                    [tuple(b) for b in boxes_col[i]],
                )
                for a, b, c, d in rects:
                    for col in keep:
                        out[col].append(cols[col][i])
                    out["part"].append("diff")
                    out["px0"].append(a)
                    out["py0"].append(b)
                    out["px1"].append(c)
                    out["py1"].append(d)
            yield pd.DataFrame(out)

    touched = gathered.mapInPandas(erase_rows, schema=out_schema)
    untouched = left.join(pairs.select(key).distinct(), key, "left_anti").select(
        *keep,
        F.lit("orig").alias("part"),
        F.col(lx0).cast("double").alias("px0"),
        F.col(ly0).cast("double").alias("py0"),
        F.col(lx1).cast("double").alias("px1"),
        F.col(ly1).cast("double").alias("py1"),
    )
    return untouched.unionByName(touched)


def symdifference_boxes(
    a: DataFrame,
    b: DataFrame,
    a_bbox=("lon_min", "lat_min", "lon_max", "lat_max"),
    b_bbox=("lon_min", "lat_min", "lon_max", "lat_max"),
    a_key: str | None = None,
    b_key: str | None = None,
    broadcast_b: bool = True,
) -> DataFrame:
    """``OGRLayer::SymDifference`` (``ogrsf_frmts.h:331-352``, impl
    ``ogrlayer.cpp:5711+``) for the box model: (A − B) ∪ (B − A),
    each direction the multi-method union-difference of
    :func:`update_boxes` (canonical vertical-slab pieces, untouched
    features pass through as ``part='orig'``). The two sides are
    labeled ``side='a'``/``'b'`` and schema-merge-unioned, mirroring
    the reference's result layer that carries both input schemas
    NULL-padded.

    Scale shape: each direction is the cell equi-join + per-feature
    ``applyInPandas`` of Update — no cross product. ``broadcast_b``
    broadcasts B as the method side of A−B; the B−A direction never
    broadcasts A (A is the big layer by convention)."""
    da = update_boxes(
        a, b, a_bbox, b_bbox, key=a_key, broadcast_method=broadcast_b
    ).withColumn("side", F.lit("a"))
    db = update_boxes(
        b, a, b_bbox, a_bbox, key=b_key, broadcast_method=False
    ).withColumn("side", F.lit("b"))
    return union_layers(da, db)


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
