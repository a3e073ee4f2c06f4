"""Constrained Delaunay triangulation — `ogr/ogr_geometry.h:605`.

Reference surface: ``OGRGeometry::ConstrainedDelaunayTriangulation``
(GEOS ``ConstrainedDelaunayTriangulator``): triangulate a polygon's
interior so that every boundary edge appears as a triangle edge.
Original implementation of the standard two-step algorithm:

1. unconstrained Delaunay of the ring vertices (the Bowyer–Watson
   kernel shared with the TIN gridder, ``operators/tin.py:25``);
2. for each missing constraint edge, remove the triangles the segment
   crosses and retriangulate the two cavity pseudo-polygons with
   Anglada's recursive method (pick the cavity vertex whose
   circumcircle with the constraint endpoints is empty — the
   published CDT insertion used by Triangle/CGAL-style engines);
3. keep the triangles whose centroid lies inside the polygon (drops
   convex-hull fill outside the shell and inside holes, which is how
   GEOS scopes the result to the interior).

Per-geometry NumPy kernel (runs inside the same Arrow batches as the
other constructive methods); triangulating a planet of polygons is a
map-only column transform.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.functions import geometry as G
from gdal_spark.operators.tin import delaunay


def _seg_crosses(a, b, p, q) -> bool:
    """Proper interior crossing of segments ab and pq (shared
    endpoints do not count)."""
    def orient(o, x, y):
        return (x[0] - o[0]) * (y[1] - o[1]) - (x[1] - o[1]) * (y[0] - o[0])

    for e in (p, q):
        if np.allclose(e, a) or np.allclose(e, b):
            return False
    d1 = orient(a, b, p)
    d2 = orient(a, b, q)
    d3 = orient(p, q, a)
    d4 = orient(p, q, b)
    return (d1 * d2 < 0) and (d3 * d4 < 0)


def _in_circumcircle(ax, ay, bx, by, cx, cy, px, py) -> bool:
    m = np.array(
        [
            [ax - px, ay - py, (ax - px) ** 2 + (ay - py) ** 2],
            [bx - px, by - py, (bx - px) ** 2 + (by - py) ** 2],
            [cx - px, cy - py, (cx - px) ** 2 + (cy - py) ** 2],
        ]
    )
    # sign convention requires CCW (a, b, c)
    area2 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    det = np.linalg.det(m)
    return det > 1e-12 if area2 > 0 else det < -1e-12


def _tri_pseudo(pts, a, b, cavity: list[int]) -> list[tuple[int, int, int]]:
    """Anglada: triangulate the pseudo-polygon (a, cavity..., b)."""
    if not cavity:
        return []
    if len(cavity) == 1:
        return [(a, cavity[0], b)]
    c = cavity[0]
    ci = 0
    for i, v in enumerate(cavity[1:], start=1):
        if _in_circumcircle(*pts[a], *pts[b], *pts[c], *pts[v]):
            c = v
            ci = i
    out = [(a, c, b)]
    out += _tri_pseudo(pts, a, c, cavity[:ci])
    out += _tri_pseudo(pts, c, b, cavity[ci + 1 :])
    return out


def constrained_delaunay(
    pts: np.ndarray, constraints: list[tuple[int, int]]
) -> list[tuple[int, int, int]]:
    """CDT of ``pts`` honoring ``constraints`` (vertex-index edges)."""
    tris = [tuple(t) for t in delaunay(pts)]

    def edges_of(t):
        return [(t[0], t[1]), (t[1], t[2]), (t[2], t[0])]

    for a, b in constraints:
        present = any(
            (a in t and b in t) for t in tris
        )
        if present:
            continue
        # triangles crossed by segment a-b
        crossed = []
        for t in tris:
            if any(
                _seg_crosses(pts[a], pts[b], pts[e0], pts[e1])
                for e0, e1 in edges_of(t)
            ):
                crossed.append(t)
        if not crossed:
            continue
        for t in crossed:
            tris.remove(t)
        # cavity boundary: edges of crossed triangles not shared twice
        cnt: dict[tuple, int] = {}
        for t in crossed:
            for e0, e1 in edges_of(t):
                k = (e0, e1) if e0 < e1 else (e1, e0)
                cnt[k] = cnt.get(k, 0) + 1
        boundary = [k for k, n in cnt.items() if n == 1]
        # split boundary vertices into the two sides of a-b
        ab = pts[b] - pts[a]
        above: list[int] = []
        below: list[int] = []
        seen = set()
        for e in boundary:
            for v in e:
                if v in (a, b) or v in seen:
                    continue
                seen.add(v)
                side = ab[0] * (pts[v][1] - pts[a][1]) - ab[1] * (
                    pts[v][0] - pts[a][0]
                )
                (above if side > 0 else below).append(v)

        # order each side by projection along the constraint
        def proj(v):
            return float((pts[v] - pts[a]) @ ab)

        above.sort(key=proj)
        below.sort(key=proj)
        tris += _tri_pseudo(pts, a, b, above)
        tris += _tri_pseudo(pts, b, a, below[::-1])
    return tris


def polygon_cdt(g: G.Geom) -> list[np.ndarray]:
    """Polygon (with holes) → interior triangles (closed CCW rings)."""
    if g.gtype not in (G.WKB_POLYGON, G.WKB_MULTIPOLYGON):
        raise ValueError("ConstrainedDelaunay expects polygonal input")
    pts_list: list = []
    index: dict[tuple, int] = {}
    constraints: list[tuple[int, int]] = []

    def add(p) -> int:
        k = (float(p[0]), float(p[1]))
        if k not in index:
            index[k] = len(pts_list)
            pts_list.append([k[0], k[1]])
        return index[k]

    for ring in g.rings:
        prev = None
        first = None
        for p in ring[:-1]:
            i = add(p)
            if first is None:
                first = i
            if prev is not None and prev != i:
                constraints.append((prev, i))
            prev = i
        if prev is not None and prev != first:
            constraints.append((prev, first))
    pts = np.asarray(pts_list, dtype=np.float64)
    tris = constrained_delaunay(pts, constraints)
    out = []
    for t in tris:
        tri = pts[list(t)]
        cx, cy = tri[:, 0].mean(), tri[:, 1].mean()
        if not G.points_in_geom(np.array([cx]), np.array([cy]), g)[0]:
            continue  # outside shell or inside a hole
        ring = np.vstack([tri, tri[:1]])
        if G.ring_signed_area(ring) < 0:
            ring = ring[::-1]
        out.append(ring)
    return out


def st_constrained_delaunay(wkb: bytes) -> bytes:
    """Polygon WKB → MULTIPOLYGON WKB of interior triangles."""
    g = G.parse_wkb(bytes(wkb))
    tris = polygon_cdt(g)
    return G.wkb_multipolygon([[r] for r in tris])
