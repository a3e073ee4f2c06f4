"""GNM shortest-path tree: distributed Bellman-Ford vs heapq Dijkstra.

Reference semantics: gnm/gnmgraph.cpp:185 (DijkstraShortestPathTree),
blocked-vertex skip rule :129,:473. The contract under test is the
module's determinism invariant: both algorithms converge to the same
lexicographic (dist, hops, parent) fixed point, bit-for-bit.
"""

import math

import pytest

from gdal_spark.operators import gnm


def _tree_rows(df):
    return {
        r.node: (r.dist_m, r.hops, r.parent) for r in df.collect()
    }


def test_hand_graph_tree(spark):
    # 0-1-2 chain (w=1 each) + direct 0-2 (w=2): two equal-cost paths
    # to node 2 — the fewer-hops path (direct edge, 1 hop) must win.
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 1, 1.0),
         (0, 2, 2.0), (2, 0, 2.0), (3, 4, 5.0), (4, 3, 5.0)],
        "src long, dst long, w double",
    )
    got = _tree_rows(gnm.shortest_path_tree(edges, start=0))
    assert got[0] == (0.0, 0, -1)
    assert got[1] == (1.0, 1, 0)
    assert got[2] == (2.0, 1, 0)  # 1 hop beats 2 hops at equal dist
    assert 3 not in got and 4 not in got  # disconnected component


def test_equal_dist_equal_hops_min_parent(spark):
    # two 2-hop paths of identical cost into node 3 via parents 1 and
    # 2 — the smaller parent id must be chosen on both sides
    rows = [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0)]
    edges = spark.createDataFrame(
        rows + [(b, a, w) for a, b, w in rows], "src long, dst long, w double"
    )
    got = _tree_rows(gnm.shortest_path_tree(edges, start=0))
    assert got[3] == (2.0, 2, 1)
    adj = {}
    for a, b, w in rows:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    assert gnm.dijkstra_tree_py(adj, 0)[3] == (2.0, 2, 1)


def test_matches_python_dijkstra_on_synth_network(spark, sf_dir):
    from gdal_spark.sources import synth

    nodes = synth.sites(spark, sf_dir)
    n = nodes.count()
    edges = gnm.network_edges(nodes, n, blocked_sql="site_id % 97 = 13")
    got = _tree_rows(gnm.shortest_path_tree(edges, start=0))

    rows = nodes.collect()
    coord = {r.site_id: (r.lon, r.lat) for r in rows}
    blocked = {k for k in coord if k % 97 == 13}
    adj = {}
    for i in coord:
        if i in blocked:
            continue
        for s in gnm.DEFAULT_SKIPS:
            j = (i + s) % n
            if j == i or j in blocked:
                continue
            w = gnm.haversine_m_py(*coord[i], *coord[j])
            adj.setdefault(i, []).append((j, w))
            adj.setdefault(j, []).append((i, w))
    want = gnm.dijkstra_tree_py(adj, 0)
    assert set(got) == set(want)
    for k, (d, h, p) in want.items():
        gd, gh, gp = got[k]
        assert (gd, gh, gp) == (d, h, p), k  # bit-for-bit, no tolerance
    assert all(k not in got for k in blocked)


def test_weight_snap_is_shared(spark):
    # the SQL haversine and the Python mirror agree exactly after the
    # 1 mm floor snap (JVM Math vs libm trig may differ by 1 ulp raw)
    pairs = [
        (-179.9, -84.0, 12.3, 45.6),
        (0.001, 0.002, 0.003, 0.004),
        (100.0, 30.0, 100.0, 30.0),
    ]
    df = spark.createDataFrame(
        pairs, "lon1 double, lat1 double, lon2 double, lat2 double"
    ).selectExpr(f"{gnm.HAVERSINE_MM_SQL} AS w")
    got = [r.w for r in df.collect()]
    want = [gnm.haversine_m_py(*p) for p in pairs]
    assert got == want
    assert want[2] == 0.0


def test_dijkstra_py_basics():
    adj = {0: [(1, 1.5)], 1: [(0, 1.5), (2, 2.5)], 2: [(1, 2.5)]}
    best = gnm.dijkstra_tree_py(adj, 0)
    assert best[2] == (4.0, 2, 1)
    assert best[0] == (0.0, 0, -1)
    assert math.isinf(best.get(99, (math.inf, 0, 0))[0])


def test_components_ring_segments(spark, sf_dir):
    # skip-1 ring with blocked vertices: every blocked vertex cuts the
    # ring -> one component per gap (GATConnectedComponents semantics,
    # gnm/gnmgraph.cpp:377+), golden-pinned via the union-find mirror
    import pyarrow.parquet as pq
    import __spark_entry__ as em

    got = {
        r.node: (r.component_id, r.size)
        for r in em._q_gnm_components(spark, sf_dir).collect()
    }
    t = pq.read_table("golden/sf0.001/gnm_components.parquet")
    want = {
        n: (c, s)
        for n, c, s in zip(
            t.column("node").to_pylist(),
            t.column("component_id").to_pylist(),
            t.column("size").to_pylist(),
        )
    }
    assert got == want
    assert len({c for c, _ in got.values()}) == 2  # two blocked gaps at sf0.001
