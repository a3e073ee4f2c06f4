"""Polygonal-coverage pipeline steps: check / clean / simplify.

Reference: ``apps/gdalalg_vector_check_coverage.cpp`` (GEOS
``GEOSCoverageIsValid``), ``apps/gdalalg_vector_clean_coverage.cpp``
(``GEOSCoverageClean``: snapping-distance, overlap merge-strategy
longest-border|max-area|min-area|min-index, maximum-gap-width) and
``apps/gdalalg_vector_simplify_coverage.cpp``
(``GEOSCoverageSimplifyVW``: tolerance, preserve-boundary). The
reference delegates to GEOS 3.12's coverage module (JTS
CoverageValidator / CoverageCleaner / CoverageSimplifier); this module
re-implements the same semantics as NumPy kernels over the engine's
parsed-WKB ``Geom`` model, distributed as grouped ``applyInPandas``
operators (one coverage patch per group — the same slab-partition
shape as ``dissolve.py``; at 100 TB a global coverage runs these
per spatial cell with a one-cell halo, exactly like the tiler's
compose levels).

Semantics implemented (and the two documented deviations):

- **check**: a boundary segment of polygon A is *invalid* when it
  (a) has its midpoint strictly inside a neighbor B (interior
  overlap), (b) properly crosses a neighbor's boundary segment, or
  (c) collinearly overlaps a neighbor's segment over a positive
  extent without being the exact vertex-matched shared edge
  ("misaligned edge" — valid coverages share edges vertex-exactly).
  With ``max_gap_width > 0``, enclosed holes of the patch union whose
  maximum-inscribed-circle diameter is below the threshold are gaps;
  segments lying on a gap's boundary are flagged. Deviation 1: whole
  offending segments are reported (GEOS reports the clipped invalid
  *portions*); the flagged set is a superset drawn on the same edges.
- **clean**: snap coordinates to the ``snap_dist`` grid, drop
  degenerate rings; assign each pairwise overlap to one claimant by
  the merge strategy and subtract it from the loser; close gaps
  (enclosed + narrower than ``max_gap_width``) by merging them into
  the neighbor with the longest shared border. Deviation 2: N-way
  overlap regions are resolved pair-at-a-time in deterministic
  (sorted-id) order rather than by GEOS's global node-first pass.
- **simplify**: the coverage's shared-edge topology is split into
  arcs (maximal chains whose segments have the same incident-polygon
  set); each arc is Visvalingam–Whyatt simplified (drop interior
  vertex of minimum effective triangle area while it is below
  ``tolerance²``), endpoints (nodes) always survive; both polygons of
  a shared arc recompute the identical survivor set (VW is
  deterministic and orientation-symmetric), so no cross-polygon
  exchange is needed and the coverage stays crack-free — the heart of
  JTS CoverageSimplifier. ``preserve_boundary=True`` leaves arcs with
  a single incident polygon (the coverage's outer boundary) intact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gdal_spark.functions import geometry as G
from gdal_spark.functions.clipper import boolean_rings, rings_to_wkb

__all__ = [
    "check_coverage_group",
    "clean_coverage_group",
    "simplify_coverage_group",
    "check_coverage",
    "clean_coverage",
    "simplify_coverage",
]


# ---------------------------------------------------------------------------
# segment utilities (exact arithmetic — the coverage model is
# vertex-exact, like GEOS's)
# ---------------------------------------------------------------------------


def _poly_segments(g: G.Geom) -> np.ndarray:
    """All boundary segments of a polygonal Geom as (n, 4) rows
    (x1, y1, x2, y2), ring closing edges included."""
    segs = []
    for ring in g.rings:
        a, b = ring[:-1], ring[1:]
        segs.append(np.column_stack([a, b]))
    if not segs:
        return np.zeros((0, 4))
    return np.concatenate(segs)


def _seg_key(s) -> tuple:
    """Canonical (order-independent) endpoint key of one segment."""
    p, q = (s[0], s[1]), (s[2], s[3])
    return (p, q) if p <= q else (q, p)


def _collinear_overlap(s: np.ndarray, t: np.ndarray) -> float:
    """Positive overlap length if segments s and t lie on the same
    line and overlap over a positive extent, else 0."""
    ax, ay, bx, by = s
    cx, cy, dx, dy = t
    ux, uy = bx - ax, by - ay
    vx, vy = dx - cx, dy - cy
    if ux * vy - uy * vx != 0.0:
        return 0.0
    if ux * (cy - ay) - uy * (cx - ax) != 0.0:
        return 0.0
    # project all four endpoints on s's direction
    L2 = ux * ux + uy * uy
    if L2 == 0.0:
        return 0.0
    t0, t1 = 0.0, 1.0
    tc = (ux * (cx - ax) + uy * (cy - ay)) / L2
    td = (ux * (dx - ax) + uy * (dy - ay)) / L2
    lo, hi = min(tc, td), max(tc, td)
    ov = min(t1, hi) - max(t0, lo)
    return ov * np.sqrt(L2) if ov > 0 else 0.0


def _proper_cross(s: np.ndarray, t: np.ndarray) -> bool:
    """Strict interior crossing of two segments."""
    ax, ay, bx, by = s
    cx, cy, dx, dy = t
    d1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    d2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
    d3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
    d4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
    return (d1 * d2 < 0) and (d3 * d4 < 0)


def _on_segment(px: float, py: float, segs: np.ndarray) -> bool:
    """Is (px,py) exactly on any of the segments (collinear + within
    extent)?"""
    if len(segs) == 0:
        return False
    ax, ay, bx, by = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    dot = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
    L2 = (bx - ax) ** 2 + (by - ay) ** 2
    return bool(((cross == 0) & (dot >= 0) & (dot <= L2)).any())


def _mid_strictly_inside(s: np.ndarray, g: G.Geom, gsegs: np.ndarray) -> bool:
    mx, my = (s[0] + s[2]) * 0.5, (s[1] + s[3]) * 0.5
    if _on_segment(mx, my, gsegs):
        return False
    return bool(G.points_in_geom(np.array([mx]), np.array([my]), g)[0])


# ---------------------------------------------------------------------------
# gap detection (maximum inscribed circle, JTS grid-refinement method)
# ---------------------------------------------------------------------------


def _max_inscribed_diameter(rings: list[np.ndarray], roles: list[bool]) -> float:
    """Approximate maximum-inscribed-circle diameter of the polygon
    defined by (rings, roles) via iterative grid refinement — the same
    successive-approximation scheme JTS MaximumInscribedCircle uses
    (it too is tolerance-bounded, not closed-form)."""
    exts = [r for r, ro in zip(rings, roles) if ro]
    if not exts:
        return 0.0
    allpts = np.concatenate(rings)
    xmin, ymin = allpts.min(axis=0)
    xmax, ymax = allpts.max(axis=0)
    segs = np.concatenate(
        [np.column_stack([r[:-1], r[1:]]) for r in rings]
    )

    def min_dist(px: np.ndarray, py: np.ndarray) -> np.ndarray:
        ax, ay, bx, by = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        L2 = np.where(L2 == 0, 1.0, L2)
        t = ((px[:, None] - ax) * dx + (py[:, None] - ay) * dy) / L2
        t = np.clip(t, 0.0, 1.0)
        qx = ax + t * dx
        qy = ay + t * dy
        return np.sqrt(
            ((px[:, None] - qx) ** 2 + (py[:, None] - qy) ** 2).min(axis=1)
        )

    def inside(px: np.ndarray, py: np.ndarray) -> np.ndarray:
        m = np.zeros(len(px), dtype=bool)
        for r, ro in zip(rings, roles):
            hit = G.points_in_rings(px, py, [r])
            m ^= hit  # even-odd across exterior + holes
        return m

    cx, cy = (xmin + xmax) * 0.5, (ymin + ymax) * 0.5
    span = max(xmax - xmin, ymax - ymin)
    best = 0.0
    n = 16
    for _ in range(4):  # 4 refinement levels → span/16^?; ample for flags
        gx = np.linspace(cx - span / 2, cx + span / 2, n)
        gy = np.linspace(cy - span / 2, cy + span / 2, n)
        PX, PY = np.meshgrid(gx, gy)
        px, py = PX.ravel(), PY.ravel()
        m = inside(px, py)
        if not m.any():
            break
        d = np.where(m, min_dist(px, py), -1.0)
        k = int(np.argmax(d))
        if d[k] > best:
            best = float(d[k])
        cx, cy = float(px[k]), float(py[k])
        span = span / (n / 4)  # zoom around the argmax
    return 2.0 * best


def _union_holes(geoms: list[G.Geom]):
    """Enclosed gap regions of the patch union: one entry per union
    hole, as (rings, inscribed_diameter) where ``rings`` is the hole
    ring plus any union islands enclosed by it (an island inside a
    hole — e.g. a shrunk center tile — is NOT part of the gap, and its
    boundary is part of the gap's boundary)."""
    rings, roles = boolean_rings([g.rings for g in geoms], "union")
    holes = [r for r, ro in zip(rings, roles) if not ro]
    exts = [r for r, ro in zip(rings, roles) if ro]
    out = []
    for h in holes:
        region = [h]
        flags = [True]
        for e in exts:
            px, py = e[0]
            if G.points_in_rings(np.array([px]), np.array([py]), [h])[0]:
                region.append(e)
                flags.append(False)
        out.append((region, _max_inscribed_diameter(region, flags)))
    return out


# ---------------------------------------------------------------------------
# check
# ---------------------------------------------------------------------------


def check_coverage_group(
    items: list[tuple[int, G.Geom]], max_gap_width: float = 0.0
) -> list[tuple[int, bytes | None, int, float, bool]]:
    """Validate one coverage patch. Returns per polygon:
    (id, invalid_multilinestring_wkb|None, n_invalid, invalid_len,
    is_valid). Mirrors GEOSCoverageIsValid's per-feature invalid-edge
    layer (``gdalalg_vector_check_coverage.cpp:95-107``)."""
    ids = [i for i, _ in items]
    geoms = [g for _, g in items]
    segsets = [_poly_segments(g) for g in geoms]
    keysets = [{_seg_key(s) for s in ss} for ss in segsets]
    bboxes = [G.geom_bbox(g) for g in geoms]
    n = len(items)
    invalid: list[list[np.ndarray]] = [[] for _ in range(n)]
    flagged: list[set] = [set() for _ in range(n)]

    def flag(i: int, s: np.ndarray) -> None:
        k = _seg_key(s)
        if k not in flagged[i]:
            flagged[i].add(k)
            invalid[i].append(s)

    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            bi, bj = bboxes[i], bboxes[j]
            if bi[2] < bj[0] or bj[2] < bi[0] or bi[3] < bj[1] or bj[3] < bi[1]:
                continue
            for s in segsets[i]:
                k = _seg_key(s)
                # (a) midpoint strictly inside neighbor
                if _mid_strictly_inside(s, geoms[j], segsets[j]):
                    flag(i, s)
                    continue
                # (b) proper crossing
                if any(_proper_cross(s, t) for t in segsets[j]):
                    flag(i, s)
                    continue
                # (c) collinear partial overlap that is not the exact
                # vertex-matched shared edge
                if k in keysets[j]:
                    continue  # exact shared edge with j — fine
                for t in segsets[j]:
                    if _collinear_overlap(s, t) > 0.0:
                        flag(i, s)
                        break

    if max_gap_width > 0.0 and n > 0:
        for region, diam in _union_holes(geoms):
            if diam >= max_gap_width:
                continue
            hsegs = np.concatenate(
                [np.column_stack([r[:-1], r[1:]]) for r in region]
            )
            for i in range(n):
                for s in segsets[i]:
                    if any(_collinear_overlap(s, t) > 0.0 for t in hsegs):
                        flag(i, s)

    out = []
    for i in range(n):
        segs = invalid[i]
        if segs:
            wkb = _multilinestring_wkb(segs)
            ln = float(sum(np.hypot(s[2] - s[0], s[3] - s[1]) for s in segs))
            out.append((ids[i], wkb, len(segs), ln, False))
        else:
            out.append((ids[i], None, 0, 0.0, True))
    return out


def _multilinestring_wkb(segs: list[np.ndarray]) -> bytes:
    import struct

    parts = [struct.pack("<BII", 1, G.WKB_MULTILINESTRING, len(segs))]
    for s in segs:
        parts.append(
            struct.pack("<BIIdddd", 1, G.WKB_LINESTRING, 2, s[0], s[1], s[2], s[3])
        )
    return b"".join(parts)


# ---------------------------------------------------------------------------
# clean
# ---------------------------------------------------------------------------


def _snap_geom(g: G.Geom, snap: float) -> G.Geom:
    if snap <= 0:
        return g
    rings = []
    roles = []
    for r, ro in zip(g.rings, g.ring_roles):
        rr = np.round(r / snap) * snap
        # drop consecutive duplicates introduced by snapping
        keep = np.ones(len(rr), dtype=bool)
        keep[1:] = (np.abs(np.diff(rr, axis=0)) > 0).any(axis=1)
        rr = rr[keep]
        if len(rr) == 0:
            continue
        if (rr[0] != rr[-1]).any():
            rr = np.vstack([rr, rr[0]])
        if len(rr) >= 4 and abs(G.ring_signed_area(rr)) > 0:
            rings.append(rr)
            roles.append(ro)
    return G.Geom(gtype=G.WKB_POLYGON, rings=rings, ring_roles=roles)


def _shared_border_len(rings_a: list[np.ndarray], rings_b: list[np.ndarray]) -> float:
    """Total length of collinear overlap between two ring sets'
    boundaries."""
    sa = np.concatenate(
        [np.column_stack([r[:-1], r[1:]]) for r in rings_a]
    ) if rings_a else np.zeros((0, 4))
    sb = np.concatenate(
        [np.column_stack([r[:-1], r[1:]]) for r in rings_b]
    ) if rings_b else np.zeros((0, 4))
    total = 0.0
    for s in sa:
        for t in sb:
            total += _collinear_overlap(s, t)
    return total


def clean_coverage_group(
    items: list[tuple[int, G.Geom]],
    snap_dist: float = 0.0,
    merge_strategy: str = "longest-border",
    max_gap_width: float = 0.0,
) -> list[tuple[int, bytes | None, float]]:
    """Clean one coverage patch → (id, wkb, area) per polygon.
    Strategies per ``gdalalg_vector_clean_coverage.cpp:113-133``."""
    if merge_strategy not in ("longest-border", "max-area", "min-area", "min-index"):
        raise ValueError(f"unknown merge strategy {merge_strategy!r}")
    ids = [i for i, _ in items]
    cur: dict[int, tuple[list[np.ndarray], list[bool]]] = {}
    for pid, g in sorted(zip(ids, (g for _, g in items)), key=lambda t: t[0]):
        sg = _snap_geom(g, snap_dist)
        cur[pid] = (list(sg.rings), list(sg.ring_roles))

    def area_of(pid: int) -> float:
        rings, roles = cur[pid]
        return float(
            sum(
                abs(G.ring_signed_area(r)) * (1 if ro else -1)
                for r, ro in zip(rings, roles)
            )
        )

    # pairwise overlap resolution (deterministic sorted-id order)
    spids = sorted(cur)
    for x in range(len(spids)):
        for y in range(x + 1, len(spids)):
            pa, pb = spids[x], spids[y]
            ra, _ = cur[pa]
            rb, _ = cur[pb]
            if not ra or not rb:
                continue
            inter_r, inter_ro = boolean_rings([ra, rb], "intersection")
            ia = sum(
                abs(G.ring_signed_area(r)) * (1 if ro else -1)
                for r, ro in zip(inter_r, inter_ro)
            )
            if ia <= 0:
                continue
            if merge_strategy == "longest-border":
                win_a = _shared_border_len(inter_r, ra) >= _shared_border_len(
                    inter_r, rb
                )
            elif merge_strategy == "max-area":
                win_a = area_of(pa) >= area_of(pb)
            elif merge_strategy == "min-area":
                win_a = area_of(pa) <= area_of(pb)
            else:  # min-index
                win_a = True
            loser = pb if win_a else pa
            lr, _ = cur[loser]
            new_r, new_ro = boolean_rings(
                [lr, inter_r], "difference"
            )
            cur[loser] = (new_r, new_ro)

    # gap closing
    if max_gap_width > 0.0:
        geoms_now = [
            G.Geom(gtype=G.WKB_POLYGON, rings=r, ring_roles=ro)
            for r, ro in (cur[p] for p in spids)
        ]
        for region, diam in _union_holes(geoms_now):
            if diam >= max_gap_width:
                continue
            # merge into the neighbor with the longest shared border
            best, best_len = None, -1.0
            for pid in spids:
                L = _shared_border_len(region, cur[pid][0])
                if L > best_len:
                    best, best_len = pid, L
            if best is not None and best_len > 0:
                r0, _ = cur[best]
                new_r, new_ro = boolean_rings([r0, region], "union")
                cur[best] = (new_r, new_ro)

    out = []
    for pid in ids:
        rings, roles = cur[pid]
        wkb = rings_to_wkb(rings, roles)
        area = float(
            sum(
                abs(G.ring_signed_area(r)) * (1 if ro else -1)
                for r, ro in zip(rings, roles)
            )
        )
        out.append((pid, wkb, area))
    return out


# ---------------------------------------------------------------------------
# simplify (shared-arc Visvalingam–Whyatt)
# ---------------------------------------------------------------------------


def _vw_survivors(chain: np.ndarray, tol2: float) -> np.ndarray:
    """Boolean keep-mask for a vertex chain under Visvalingam–Whyatt:
    repeatedly drop the interior vertex of minimum effective triangle
    area while that area < tol2. Endpoints always survive. Ties break
    on (area, x, y) so a reversed chain drops the same vertices."""
    n = len(chain)
    keep = np.ones(n, dtype=bool)
    if n <= 2 or tol2 <= 0:
        return keep
    alive = list(range(n))
    while len(alive) > 2:
        best_i = -1
        best = (float("inf"), float("inf"), float("inf"))
        for k in range(1, len(alive) - 1):
            a = chain[alive[k - 1]]
            b = chain[alive[k]]
            c = chain[alive[k + 1]]
            area = 0.5 * abs(
                (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            )
            cand = (area, b[0], b[1])
            if cand < best:
                best, best_i = cand, k
        if best[0] >= tol2:
            break
        keep[alive[best_i]] = False
        del alive[best_i]
    return keep


def simplify_coverage_group(
    items: list[tuple[int, G.Geom]],
    tolerance: float,
    preserve_boundary: bool = False,
) -> list[tuple[int, bytes | None, int, float]]:
    """Simplify one coverage patch → (id, wkb, n_pts, area)."""
    ids = [i for i, _ in items]
    geoms = [g for _, g in items]
    # segment incidence: canonical key → SORTED TUPLE of incident
    # polygon ids (a count is not enough: at a 4-tile corner both
    # adjacent edges have 2 incident polygons but different partners —
    # the corner must be a node or neighbors' arcs desynchronize)
    incidence: dict[tuple, tuple] = {}
    for pid, g in zip(ids, geoms):
        for s in _poly_segments(g):
            k = _seg_key(s)
            incidence[k] = tuple(sorted(incidence.get(k, ()) + (pid,)))
    tol2 = tolerance * tolerance

    out = []
    for pid, g in zip(ids, geoms):
        new_rings = []
        new_roles = []
        for ring, role in zip(g.rings, g.ring_roles):
            m = len(ring) - 1  # distinct vertices
            # incidence signature of each edge i: (v_i → v_{i+1})
            sig = [
                incidence[_seg_key(np.array([*ring[i], *ring[i + 1]]))]
                for i in range(m)
            ]
            # nodes: vertices whose two adjacent edges differ in signature
            is_node = np.array(
                [sig[(i - 1) % m] != sig[i] for i in range(m)], dtype=bool
            )
            if not is_node.any():
                # single closed arc (whole ring same incidence)
                if preserve_boundary and len(sig[0]) == 1:
                    new_rings.append(ring)
                    new_roles.append(role)
                    continue
                # anchor at the lexicographically smallest vertex so both
                # sides of a fully-shared ring pick the same anchor
                anchor = int(
                    np.lexsort((ring[:-1, 1], ring[:-1, 0]))[0]
                )
                chain = np.vstack(
                    [ring[anchor:-1], ring[:anchor], ring[anchor : anchor + 1]]
                )
                keep = _vw_survivors(chain, tol2)
                new = chain[keep]
                if len(new) >= 4:
                    new_rings.append(new)
                    new_roles.append(role)
                continue
            # split the cyclic vertex list into arcs between nodes
            nodes = np.flatnonzero(is_node)
            order = np.concatenate([np.arange(nodes[0], m), np.arange(0, nodes[0])])
            verts = ring[:-1][order]
            sigs = [sig[i] for i in order]
            node_pos = np.flatnonzero(is_node[order])
            kept_pts = []
            for a_i in range(len(node_pos)):
                s0 = node_pos[a_i]
                s1 = node_pos[a_i + 1] if a_i + 1 < len(node_pos) else len(verts)
                chain = np.vstack(
                    [verts[s0:s1], verts[s1 : s1 + 1] if s1 < len(verts) else verts[:1]]
                )
                if preserve_boundary and len(sigs[s0]) == 1:
                    keep = np.ones(len(chain), dtype=bool)
                else:
                    keep = _vw_survivors(chain, tol2)
                kept_pts.append(chain[:-1][keep[:-1]])
            new = np.vstack(kept_pts + [kept_pts[0][:1]])
            if len(new) >= 4:
                new_rings.append(new)
                new_roles.append(role)
        wkb = rings_to_wkb(new_rings, new_roles)
        n_pts = int(sum(len(r) - 1 for r in new_rings))
        area = float(
            sum(
                abs(G.ring_signed_area(r)) * (1 if ro else -1)
                for r, ro in zip(new_rings, new_roles)
            )
        )
        out.append((pid, wkb, n_pts, area))
    return out


# ---------------------------------------------------------------------------
# Spark operators (grouped applyInPandas, one patch per key)
# ---------------------------------------------------------------------------


def _grouped(polys: DataFrame, by: str, fn, schema: str) -> DataFrame:
    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        items = [
            (int(r.fid), G.parse_wkb(bytes(r.geom)))
            for r in pdf.sort_values("fid").itertuples()
        ]
        rows = fn(key, items, pdf)
        return pd.DataFrame(rows)

    return polys.groupBy(by).applyInPandas(run, schema=schema)


def check_coverage(
    polys: DataFrame, by: str = "patch", max_gap_width: float = 0.0
) -> DataFrame:
    """``gdal vector check-coverage`` over a (patch, fid, geom WKB)
    layer → (patch, fid, invalid_wkb, n_invalid, invalid_len,
    is_valid). A ``gap_w`` column, when present, overrides
    ``max_gap_width`` per patch (fixtures span AOIs of very different
    extents)."""
    schema = (
        f"{by} long, fid long, invalid_wkb binary, n_invalid int, "
        "invalid_len double, is_valid boolean"
    )

    def fn(key, items, pdf):
        gw = float(pdf["gap_w"].iloc[0]) if "gap_w" in pdf else max_gap_width
        return [
            {
                by: int(key[0]),
                "fid": pid,
                "invalid_wkb": wkb,
                "n_invalid": n,
                "invalid_len": ln,
                "is_valid": ok,
            }
            for pid, wkb, n, ln, ok in check_coverage_group(items, gw)
        ]

    return _grouped(polys, by, fn, schema)


def clean_coverage(
    polys: DataFrame,
    by: str = "patch",
    snap_dist: float = 0.0,
    merge_strategy: str = "longest-border",
    max_gap_width: float = 0.0,
) -> DataFrame:
    """``gdal vector clean-coverage`` → (patch, fid, geom, area).
    ``gap_w`` column overrides ``max_gap_width`` per patch."""
    schema = f"{by} long, fid long, geom binary, area double"

    def fn(key, items, pdf):
        gw = float(pdf["gap_w"].iloc[0]) if "gap_w" in pdf else max_gap_width
        return [
            {by: int(key[0]), "fid": pid, "geom": wkb, "area": area}
            for pid, wkb, area in clean_coverage_group(
                items, snap_dist, merge_strategy, gw
            )
        ]

    return _grouped(polys, by, fn, schema)


def simplify_coverage(
    polys: DataFrame,
    by: str = "patch",
    tolerance: float = 0.0,
    preserve_boundary: bool = False,
) -> DataFrame:
    """``gdal vector simplify-coverage`` → (patch, fid, geom, n_pts,
    area)."""
    schema = f"{by} long, fid long, geom binary, n_pts int, area double"

    def fn(key, items, pdf):
        return [
            {by: int(key[0]), "fid": pid, "geom": wkb, "n_pts": n, "area": area}
            for pid, wkb, n, area in simplify_coverage_group(
                items, tolerance, preserve_boundary
            )
        ]

    return _grouped(polys, by, fn, schema)
