"""Coverage check/clean/simplify kernel tests.

Fixtures are exact-grid 3x3 tilings with one injected defect, every
expectation hand-traced from the semantics of GEOS's coverage module
(reference surface: apps/gdalalg_vector_{check,clean,simplify}_coverage.cpp).
"""

import numpy as np
import pytest

from gdal_spark.functions import geometry as G
from gdal_spark.operators import coverage as C


def rect(x0, y0, x1, y1) -> G.Geom:
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)
    return G.Geom(gtype=G.WKB_POLYGON, rings=[ring], ring_roles=[True])


def grid3(x0=0.0, y0=0.0, w=9.0, h=9.0):
    """Perfect 3x3 tiling of [x0,x0+w]x[y0,y0+h]; tile id = 3*row+col."""
    xs = [x0 + w * i / 3 for i in range(4)]
    ys = [y0 + h * i / 3 for i in range(4)]
    tiles = {}
    for r in range(3):
        for c in range(3):
            tiles[3 * r + c] = rect(xs[c], ys[r], xs[c + 1], ys[r + 1])
    return tiles, xs, ys


# tile indices: 4 = center C, 5 = east E, 1 = south S, 7 = north N,
# 3 = west W; corners 0,2,6,8


def test_check_perfect_grid_is_valid():
    tiles, _, _ = grid3()
    out = C.check_coverage_group(sorted(tiles.items()))
    assert all(ok for _, _, _, _, ok in out)
    assert all(n == 0 for _, _, n, _, _ in out)


def test_check_overlap_variant_hand_traced():
    tiles, xs, ys = grid3()
    d = 0.3
    # east tile extended left into the center tile
    tiles[5] = rect(xs[2] - d, ys[1], xs[3], ys[2])
    out = {fid: (n, ln, ok) for fid, _, n, ln, ok in
           C.check_coverage_group(sorted(tiles.items()))}
    th = ys[2] - ys[1]  # tile height 3.0
    tw = xs[2] - xs[1]  # tile width 3.0
    ew = xs[3] - xs[2] + d  # east tile width 3.3
    # E: left edge (mid inside C), bottom + top (collinear partial)
    assert out[5] == (3, pytest.approx(th + 2 * ew), False)
    # C: right edge (mid inside E), bottom + top (partial with E's)
    assert out[4] == (3, pytest.approx(th + 2 * tw), False)
    # S top edge and N bottom edge partially overlapped by E's bottom/top
    assert out[1] == (1, pytest.approx(tw), False)
    assert out[7] == (1, pytest.approx(tw), False)
    # SE top / NE bottom partially overlapped by E's bottom/top
    assert out[2] == (1, pytest.approx(xs[3] - xs[2]), False)
    assert out[8] == (1, pytest.approx(xs[3] - xs[2]), False)
    # west column untouched
    for fid in (0, 3, 6):
        assert out[fid] == (0, 0.0, True)


def test_check_gap_variant_hand_traced():
    tiles, xs, ys = grid3()
    d = 0.2
    # center tile shrunk on all sides → enclosed ring gap of width d
    tiles[4] = rect(xs[1] + d, ys[1] + d, xs[2] - d, ys[2] - d)
    # without gap detection: valid (no overlap, no misalignment)
    out0 = {fid: ok for fid, _, _, _, ok in
            C.check_coverage_group(sorted(tiles.items()))}
    assert all(out0.values())
    # with max_gap_width > d: the ring gap (inscribed diameter = d) flags
    out = {fid: (n, ok) for fid, _, n, _, ok in
           C.check_coverage_group(sorted(tiles.items()), max_gap_width=2 * d)}
    assert out[4] == (4, False)  # all 4 shrunk-center edges on gap boundary
    for fid in (1, 3, 5, 7):  # N/S/E/W inner edges
        assert out[fid] == (1, False)
    for fid in (0, 2, 6, 8):  # corners only touch the gap at a point
        assert out[fid] == (0, True)
    # a wide threshold far below the gap diameter must NOT flag
    out2 = {fid: ok for fid, _, _, _, ok in
            C.check_coverage_group(sorted(tiles.items()), max_gap_width=d / 2)}
    assert all(out2.values())


def test_inscribed_diameter_rect_and_ring():
    # solid rectangle 6x2: inscribed diameter = 2 (short side)
    r = rect(0, 0, 6, 2)
    diam = C._max_inscribed_diameter(r.rings, r.ring_roles)
    assert diam == pytest.approx(2.0, rel=0.05)
    # rectangular frame of thickness t=0.5: the widest circle sits in a
    # corner touching both outer walls and the inner corner —
    # r = sqrt(2)·t/(1+sqrt(2)) = (2-sqrt(2))·t, diameter ≈ 0.5858
    outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    inner = np.array([[0.5, 0.5], [3.5, 0.5], [3.5, 3.5], [0.5, 3.5], [0.5, 0.5]],
                     float)
    diam = C._max_inscribed_diameter([outer, inner], [True, False])
    assert diam == pytest.approx(2 * (2 - np.sqrt(2)) * 0.5, rel=0.05)


def test_clean_overlap_max_area():
    tiles, xs, ys = grid3()
    d = 0.3
    tiles[5] = rect(xs[2] - d, ys[1], xs[3], ys[2])  # E overlaps C
    out = {fid: area for fid, _, area in
           C.clean_coverage_group(sorted(tiles.items()),
                                  merge_strategy="max-area")}
    th, tw = 3.0, 3.0
    # E is larger (3.3x3) → wins the overlap strip; C loses d*th
    assert out[5] == pytest.approx((tw + d) * th)
    assert out[4] == pytest.approx((tw - d) * th)
    for fid in (0, 1, 2, 3, 6, 7, 8):
        assert out[fid] == pytest.approx(tw * th)


def test_clean_overlap_min_index():
    tiles, xs, ys = grid3()
    d = 0.3
    tiles[5] = rect(xs[2] - d, ys[1], xs[3], ys[2])
    out = {fid: area for fid, _, area in
           C.clean_coverage_group(sorted(tiles.items()),
                                  merge_strategy="min-index")}
    # C (id 4) < E (id 5) → C keeps its full tile, E loses the strip
    assert out[4] == pytest.approx(9.0)
    assert out[5] == pytest.approx(3.0 * 3.0)


def test_clean_gap_merges_into_longest_border_neighbor():
    tiles, xs, ys = grid3()
    d = 0.2
    tiles[4] = rect(xs[1] + d, ys[1] + d, xs[2] - d, ys[2] - d)
    out = {fid: area for fid, _, area in
           C.clean_coverage_group(sorted(tiles.items()),
                                  max_gap_width=2 * d)}
    # the ring gap's longest border is the shrunk center's full
    # perimeter → merged into C, restoring the full tile
    assert out[4] == pytest.approx(9.0)
    for fid in (0, 1, 2, 3, 5, 6, 7, 8):
        assert out[fid] == pytest.approx(9.0)


def test_clean_snapping_removes_sliver():
    # two tiles nearly sharing an edge (1e-4 sliver); snapping closes it
    a = rect(0, 0, 3, 3)
    b = rect(3.0001, 0, 6, 3)
    out = {fid: (area, wkb) for fid, wkb, area in
           C.clean_coverage_group([(0, a), (1, b)], snap_dist=0.001)}
    assert out[1][0] == pytest.approx(3.0 * 3.0, abs=1e-6)
    g = G.parse_wkb(out[1][1])
    assert g.rings[0][:, 0].min() == pytest.approx(3.0)


def zigzag_pair(k=6, e=0.05):
    """Two tiles [0,3]x[0,3] / [3,6]x[0,3] whose shared edge x=3 is a
    zigzag with k interior points alternating 3±e (vertex-exact on
    both sides)."""
    ys = np.linspace(0, 3, k + 2)
    mid = [[3.0 + (e if i % 2 else -e), float(ys[i])] for i in range(1, k + 1)]
    left = np.array(
        [[3, 0]] + mid + [[3, 3], [0, 3], [0, 0], [3, 0]], float
    )
    right = np.array(
        [[3, 0], [6, 0], [6, 3], [3, 3]] + mid[::-1] + [[3, 0]], float
    )
    L = G.Geom(gtype=G.WKB_POLYGON, rings=[left], ring_roles=[True])
    R = G.Geom(gtype=G.WKB_POLYGON, rings=[right], ring_roles=[True])
    return L, R


def test_simplify_zigzag_shared_edge():
    L, R = zigzag_pair()
    tol = 1.0  # zigzag effective areas << 1 → all interior pts drop
    out = {fid: (n, area, wkb) for fid, wkb, n, area in
           C.simplify_coverage_group([(0, L), (1, R)], tolerance=tol)}
    assert out[0][0] == 4 and out[1][0] == 4  # clean rectangles
    assert out[0][1] == pytest.approx(9.0)
    assert out[1][1] == pytest.approx(9.0)
    # both sides produced the identical straight shared edge (no crack):
    ga, gb = G.parse_wkb(out[0][2]), G.parse_wkb(out[1][2])
    ea = {tuple(map(tuple, seg)) for seg in
          np.stack([ga.rings[0][:-1], ga.rings[0][1:]], axis=1)}
    shared_x = [s for s in ea if s[0][0] == 3.0 and s[1][0] == 3.0]
    assert shared_x  # the x=3 edge exists in the simplified left tile


def test_simplify_tolerance_zero_is_identity():
    L, R = zigzag_pair(k=6)
    out = {fid: n for fid, _, n, _ in
           C.simplify_coverage_group([(0, L), (1, R)], tolerance=0.0)}
    assert out[0] == 4 + 6 and out[1] == 4 + 6


def test_simplify_preserve_boundary():
    L, R = zigzag_pair()
    # outer boundary arcs (single-incidence) also get simplified when
    # preserve_boundary=False — here they are already minimal, so add
    # a redundant midpoint on L's outer left edge
    ring = L.rings[0]
    i = int(np.where((ring[:, 0] == 0) & (ring[:, 1] == 3))[0][0])
    ring2 = np.insert(ring, i + 1, [[0.0, 1.5]], axis=0)
    L2 = G.Geom(gtype=G.WKB_POLYGON, rings=[ring2], ring_roles=[True])
    out_keep = {fid: n for fid, _, n, _ in
                C.simplify_coverage_group([(0, L2), (1, R)], tolerance=1.0,
                                          preserve_boundary=True)}
    out_drop = {fid: n for fid, _, n, _ in
                C.simplify_coverage_group([(0, L2), (1, R)], tolerance=1.0,
                                          preserve_boundary=False)}
    # preserve: zigzag simplified (shared arc) but outer midpoint kept
    assert out_keep[0] == 5
    # no-preserve: collinear outer midpoint dropped too
    assert out_drop[0] == 4


def test_simplify_four_corner_node_detected():
    # 2x2 grid: the center vertex joins 4 tiles; both adjacent edges of
    # each ring at that vertex have 2 incident polygons but DIFFERENT
    # partners → must be a node (never dropped), even at huge tolerance
    tiles = {
        0: rect(0, 0, 2, 2), 1: rect(2, 0, 4, 2),
        2: rect(0, 2, 2, 4), 3: rect(2, 2, 4, 4),
    }
    out = {fid: (n, area) for fid, _, n, area in
           C.simplify_coverage_group(sorted(tiles.items()), tolerance=100.0,
                                     preserve_boundary=True)}
    for fid in range(4):
        assert out[fid] == (4, pytest.approx(4.0))
    # without preserve-boundary the huge tolerance collapses each
    # tile's own outer corner (a legitimate VW drop on the shell arc),
    # but the 4-way center vertex is a node and must still survive
    out2 = {fid: wkb for fid, wkb, n, area in
            C.simplify_coverage_group(sorted(tiles.items()), tolerance=100.0)}
    for fid in range(4):
        g = G.parse_wkb(out2[fid])
        assert any((v == (2.0, 2.0)).all() for v in [g.rings[0][i] for i in
                                                     range(len(g.rings[0]) - 1)])
