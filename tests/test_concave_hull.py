"""Chi-shape concave hull kernel tests (vector_ops.concave_hull_points).

Oracles:
- closed-form star fixture (rect corners + one interior point) for
  both orientations — the same derivation the driver query's SQL
  oracle uses, but asserted on raw kernel output here;
- an independent scalar re-derivation of the chi erosion (different
  data structures: no heap, linear rescan each pass) on random point
  clouds;
- structural properties: every input point covered (winding test),
  simple ring, monotone area in ratio, ratio=1 == convex hull.
"""

import numpy as np

from gdal_spark.operators.vector_ops import concave_hull_points, convex_hull_points


def ring_area(r):
    return 0.5 * abs(float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])))


def point_in_ring(px, py, ring):
    """Winding/crossing test, boundary-inclusive (eps pad)."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    # on-segment check
    d = np.abs((x2 - x) * (py - y) - (y2 - y) * (px - x))
    seg_len2 = (x2 - x) ** 2 + (y2 - y) ** 2
    t = ((px - x) * (x2 - x) + (py - y) * (y2 - y)) / np.where(seg_len2 == 0, 1, seg_len2)
    on = (d <= 1e-9 * np.sqrt(seg_len2.max())) & (t >= -1e-12) & (t <= 1 + 1e-12)
    if on.any():
        return True
    cond = (y <= py) != (y2 <= py)
    xs = x + (py - y) * (x2 - x) / np.where(y2 == y, 1, y2 - y)
    return bool(np.sum(cond & (xs > px)) % 2)


def chi_scalar_oracle(pts, ratio):
    """Independent chi-shape erosion: recompute boundary each pass and
    scan linearly for the longest eligible edge (no heap, no
    incremental state)."""
    from gdal_spark.operators.tin import delaunay

    pts = np.unique(np.asarray(pts, float), axis=0)
    tris = set(delaunay(pts))
    edges_all = set()
    for t in tris:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edges_all.add((min(e), max(e)))
    L = {e: float(np.hypot(*(pts[e[0]] - pts[e[1]]))) for e in edges_all}
    target = min(L.values()) + ratio * (max(L.values()) - min(L.values()))
    dead = set()
    while True:
        count = {}
        for t in tris:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                count[k] = count.get(k, 0) + 1
        boundary = [e for e, c in count.items() if c == 1]
        bv = {v for e in boundary for v in e}
        cands = [e for e in boundary if L[e] > target and e not in dead]
        if not cands:
            return sum(
                0.5
                * abs(
                    (pts[t[1]][0] - pts[t[0]][0]) * (pts[t[2]][1] - pts[t[0]][1])
                    - (pts[t[1]][1] - pts[t[0]][1]) * (pts[t[2]][0] - pts[t[0]][0])
                )
                for t in tris
            )
        e = max(cands, key=lambda k: L[k])
        t = next(t for t in tris if set(e) <= set(t))
        v = next(x for x in t if x not in e)
        if v in bv:
            dead.add(e)
        else:
            tris.discard(t)


def test_star_fixture_closed_form_both_orientations():
    for (W, H, frac) in [(10.0, 4.0, 0.8), (4.0, 10.0, 0.75)]:
        pts = np.array([[0, 0], [W, 0], [W, H], [0, H], [W / 2, 0.4 * H]])
        r0 = concave_hull_points(pts, 0.0)
        r1 = concave_hull_points(pts, 1.0)
        assert abs(ring_area(r0) - frac * W * H) < 1e-9, (W, H)
        assert len(r0) - 1 == 5
        assert abs(ring_area(r1) - W * H) < 1e-9
        assert len(r1) - 1 == 4


def test_matches_scalar_chi_rederivation():
    rng = np.random.default_rng(11)
    for n in (20, 60, 120):
        pts = rng.random((n, 2)) * 50
        for ratio in (0.0, 0.2, 0.5):
            got = ring_area(concave_hull_points(pts, ratio))
            want = chi_scalar_oracle(pts, ratio)
            assert abs(got - want) < 1e-6 * max(want, 1.0), (n, ratio)


def test_contains_all_points_and_simple_ring():
    rng = np.random.default_rng(5)
    pts = rng.random((150, 2)) * 30
    for ratio in (0.0, 0.5, 1.0):
        ring = concave_hull_points(pts, ratio)
        # closed, no duplicate interior vertices
        assert np.array_equal(ring[0], ring[-1])
        interior = ring[:-1]
        assert len(np.unique(interior, axis=0)) == len(interior)
        for px, py in pts:
            assert point_in_ring(px, py, ring), (px, py, ratio)


def test_area_monotone_in_ratio_and_ratio1_is_convex():
    rng = np.random.default_rng(9)
    pts = rng.random((100, 2)) * 10
    areas = [ring_area(concave_hull_points(pts, r)) for r in (0.0, 0.25, 0.5, 0.75, 1.0)]
    assert all(a <= b + 1e-9 for a, b in zip(areas, areas[1:]))
    assert abs(areas[-1] - ring_area(convex_hull_points(pts))) < 1e-9
