"""GNM (Geographic Network Model) analyses, Spark-first.

Reference scope (gnm/gnmgraph.h:120-196, gnm/gnm.h:57-63): a network
layer (vertices + weighted edges with a blocked flag) over which GDAL
runs GATDijkstraShortestPath (gnm/gnmgraph.cpp:185
``DijkstraShortestPathTree`` — full tree from the start vertex, then a
backtrack gnmgraph.cpp:242), GATKShortestPath (Yen,
gnmgraph.cpp:246+), and GATConnectedComponents (BFS,
gnmgraph.cpp:377+). Blocked vertices/edges are skipped during
relaxation (gnmgraph.cpp:129-167, :473-474).

Spark re-expression: the graph is an edge DataFrame ``(src, dst,
w)``; the single-source shortest-path TREE is computed by frontier
Bellman-Ford relaxation — each round is one hash join (frontier ×
edges) + one struct-min groupBy, the standard Pregel/GraphX SSSP
shape. The driver loop sees only a per-round improved-count scalar;
rounds are O(graph diameter), each localCheckpoint'ed to truncate
lineage (same idiom as dedup.connected_components). At 10¹² edges the
per-round join shuffles on the frontier only (monotonically shrinking
after the wavefront passes), which is exactly how Pregel SSSP scales.

Determinism contract (drives the golden-parquet oracle in
tools/make_golden.py): the tree is defined algorithm-independently as
the lexicographic minimum of ``(dist, hops, parent)`` per node —
shortest distance, then fewest edges, then smallest parent id. Both
the distributed relaxation here and the single-process heapq Dijkstra
mirror converge to that unique fixed point, so results match
bit-for-bit. Edge weights are floor-snapped to 1 mm
(``floor(x*1000)/1000``) so JVM ``Math`` trig and libm trig produce
the identical double.

GATConnectedComponents maps to the existing
``dedup.connected_components`` (min-label propagation) over the same
edge table — no second implementation needed.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

EARTH_R_M = 6371000.0

# shared SQL text: haversine great-circle metres between (lon1,lat1)
# and (lon2,lat2) degree columns, snapped to 1 mm (floor, not round:
# floor is order-exact so a 1-ulp trig difference between JVM and
# libm cannot flip the snapped value except on a ~2^-40 boundary).
# Every literal is CAST to DOUBLE (Spark types bare decimals as
# DECIMAL and floor(double) as BIGINT — see synth._scatter_sql); the
# outer CAST keeps the snapped value DOUBLE in both dialects.
HAVERSINE_MM_SQL = (
    "CAST(floor(CAST(1000.0 AS DOUBLE) * (CAST(2.0 AS DOUBLE) * "
    "CAST({R} AS DOUBLE) * asin(sqrt("
    "pow(sin(radians(lat2 - lat1) / CAST(2.0 AS DOUBLE)), CAST(2.0 AS DOUBLE)) + "
    "cos(radians(lat1)) * cos(radians(lat2)) * "
    "pow(sin(radians(lon2 - lon1) / CAST(2.0 AS DOUBLE)), CAST(2.0 AS DOUBLE))"
    ")))) AS DOUBLE) / CAST(1000.0 AS DOUBLE)"
).format(R=repr(EARTH_R_M))


def haversine_m_py(lon1: float, lat1: float, lon2: float, lat2: float) -> float:
    """Python mirror of HAVERSINE_MM_SQL (same op order, same snap)."""
    s1 = math.sin(math.radians(lat2 - lat1) / 2)
    s2 = math.sin(math.radians(lon2 - lon1) / 2)
    h = s1 * s1 + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2)) * s2 * s2
    return math.floor(1000.0 * (2.0 * EARTH_R_M * math.asin(math.sqrt(h)))) / 1000.0


DEFAULT_SKIPS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


def network_edges(
    nodes: DataFrame,
    n_nodes: int,
    skips: tuple[int, ...] = DEFAULT_SKIPS,
    id_col: str = "site_id",
    blocked_sql: str | None = None,
) -> DataFrame:
    """Deterministic small-world network over a point layer.

    GDAL GNM builds topology by snapping line endpoints
    (gnm/gnmgenericnetwork.cpp ``ConnectFeatures``); this sandbox has
    no line layer, so the fixture network connects node ``i`` to
    ``(i+skip) % n`` for power-of-two skips — contiguous 0-based ids
    are assumed (partkeys). Power-of-two skips give O(log n)
    diameter, so the SSSP driver loop stays bounded at any scale.
    Weights are great-circle metres between the node coordinates.

    ``blocked_sql`` (SQL boolean over ``site_id``) marks blocked
    vertices (gnmgraph.cpp:129 ``ChangeBlockState``): every edge
    touching a blocked vertex is dropped, exactly the reference's
    skip-blocked rule during relaxation (gnmgraph.cpp:473-474).

    Returns (src, dst, w) with both directions of each undirected
    edge. Pure Spark SQL end-to-end — one self-join on the computed
    neighbour id, no UDFs.
    """
    base = nodes.select(
        F.col(id_col).cast("long").alias("src"),
        F.col("lon").alias("lon1"),
        F.col("lat").alias("lat1"),
    )
    if blocked_sql is not None:
        base = base.filter(~F.expr(blocked_sql.replace("site_id", "src")))
    nbr = (
        base.withColumn("skip", F.explode(F.array(*[F.lit(s) for s in skips])))
        .withColumn("dst", (F.col("src") + F.col("skip")) % F.lit(n_nodes))
        .filter(F.col("dst") != F.col("src"))
        .drop("skip")
    )
    coords = base.select(
        F.col("src").alias("dst"),
        F.col("lon1").alias("lon2"),
        F.col("lat1").alias("lat2"),
    )
    # joining back on dst keeps blocked vertices out of the target side
    fwd = nbr.join(coords, "dst").select(
        "src", "dst", F.expr(HAVERSINE_MM_SQL).alias("w")
    )
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).dropDuplicates(["src", "dst"])


def shortest_path_tree(
    edges: DataFrame, start: int, max_iter: int = 100
) -> DataFrame:
    """Single-source shortest-path tree (GNMGraph::DijkstraShortestPathTree,
    gnm/gnmgraph.cpp:185 — dist + parent for every reachable vertex).

    Frontier Bellman-Ford: per round, relax only edges leaving nodes
    improved last round; merge candidates with the running best by
    lexicographic struct-min on (dist, hops, parent). Converges in
    O(diameter) rounds to the unique algorithm-independent tree (see
    module docstring). Driver sees only the improved-count scalar.

    Returns (node, dist_m, hops, parent); the start vertex has
    parent = -1 (the reference marks the tree root the same way,
    gnmgraph.cpp:213).
    """
    sess = edges.sparkSession
    e = edges.select("src", "dst", "w").localCheckpoint(eager=True)
    best = sess.createDataFrame(
        [(int(start), 0.0, 0, -1)], "node long, dist double, hops int, parent long"
    ).localCheckpoint(eager=True)
    frontier = best
    for _ in range(max_iter):
        cand = (
            frontier.join(e, frontier.node == e.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
                (F.col("hops") + 1).alias("hops"),
                F.col("src").alias("parent"),
            )
            .groupBy("node")
            .agg(F.min(F.struct("dist", "hops", "parent")).alias("c"))
            .select("node", "c.dist", "c.hops", "c.parent")
        )
        # explicit renames instead of dataframe aliases: alias + USING
        # join + localCheckpoint trips a Spark analyzer edge case
        # ("key not found" on the join key) when the inputs share
        # checkpoint lineage
        prev = best.select(
            "node",
            F.col("dist").alias("b_dist"),
            F.col("hops").alias("b_hops"),
            F.col("parent").alias("b_parent"),
        )
        improved = (
            cand.join(prev, "node", "left")
            .filter(
                F.col("b_dist").isNull()
                | (
                    F.struct("dist", "hops", "parent")
                    < F.struct(
                        F.col("b_dist").alias("dist"),
                        F.col("b_hops").alias("hops"),
                        F.col("b_parent").alias("parent"),
                    )
                )
            )
            .select("node", "dist", "hops", "parent")
            .localCheckpoint(eager=True)
        )
        n_improved = improved.count()
        if n_improved == 0:
            break
        best = (
            best.join(improved.select("node"), "node", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    return best.select(
        "node", F.col("dist").alias("dist_m"), "hops", "parent"
    )


def dijkstra_tree_py(
    edges: dict[int, list[tuple[int, float]]], start: int
) -> dict[int, tuple[float, int, int]]:
    """Single-process heapq Dijkstra mirror (the golden-oracle side).

    Same fixed point as shortest_path_tree: lexicographic
    (dist, hops, parent) minimum per node. Used by
    tools/make_golden.py and the pytest oracle.
    """
    import heapq

    best: dict[int, tuple[float, int, int]] = {start: (0.0, 0, -1)}
    heap = [(0.0, 0, -1, start)]
    while heap:
        d, h, p, u = heapq.heappop(heap)
        if (d, h, p) > best.get(u, (math.inf, 0, 0)):
            continue
        for v, w in edges.get(u, ()):
            nd = (d + w, h + 1, u)
            if nd < best.get(v, (math.inf, 0, 0)):
                best[v] = nd
                heapq.heappush(heap, (*nd, v))
    return best
