"""Approximate-nearest-neighbor search over embedding columns.

Two paths over ``embeddings(vec_id, embedding: array<float>, label)``:

- **Brute-force cosine top-k** (the correctness baseline): JVM-side
  ``zip_with``/``aggregate`` fold for the dot product — no Python in
  the loop; broadcast the (small) query set against all candidates.
- **Hyperplane-LSH bucketed top-k** (the scale path): B deterministic
  pseudo-hyperplanes with ±1 components derived from md5 hex bits;
  candidates = bucket equi-join on the B-bit signature, exact cosine
  within bucket. At 10¹² rows the bucket join replaces the cross
  product; recall is tunable via B and multi-probe.

Scores are rounded to 6 decimals so cross-engine float-summation-order
noise cannot flip equality checks; ordering ties broken by vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 8

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
NORM = (
    "sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
)


def cosine_expr(a: str, b: str) -> str:
    return f"({DOT.format(a=a, b=b)} / ({NORM.format(a=a)} * {NORM.format(a=b)}))"


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    n_queries: int = 8,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of each query vector against all candidates
    (excluding itself). Query side broadcast (small); candidate scan
    is a single pass — the plan a 1000-executor cluster wants."""
    if query_ids is not None:
        q = embeddings.filter(F.col("vec_id").isin(query_ids))
    else:
        q = embeddings.filter(F.col("vec_id") < n_queries)
    q = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    joined = (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("score", F.round(F.expr(cosine_expr("q_emb", "embedding")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def plane_sign_expr(plane: int, i: int) -> str:
    """±1 component i of pseudo-hyperplane ``plane``: high bit of a
    md5 hex digit of a fixed seed string — identical in Spark/DuckDB."""
    pos = (plane * DIM + i) % 32 + 1
    return (
        f"CASE WHEN substr(md5('plane{plane}_{i // 32}'), {pos}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END"
    )


def signature_expr(emb: str, n_planes: int = N_PLANES, accessor: str = "element_at({emb}, {i})") -> str:
    """B-bit hyperplane signature of an embedding column as a string
    of 0/1 digits (string keeps it engine-portable). ``accessor``
    formats 1-based element access — default Spark ``element_at``;
    pass ``"{emb}[{i}]"`` for the DuckDB oracle. The ``+`` fold order
    is identical in both engines, and the ±1 factors are exact, so
    the projections (and therefore the buckets) match bit-for-bit."""
    bits = []
    for p in range(n_planes):
        terms = " + ".join(
            f"CAST({accessor.format(emb=emb, i=i + 1)} AS DOUBLE) * ({plane_sign_expr(p, i)})"
            for i in range(DIM)
        )
        bits.append(f"(CASE WHEN ({terms}) > 0 THEN '1' ELSE '0' END)")
    return "concat(" + ", ".join(bits) + ")"


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup use of the
    vector space, distinct from top-k search): candidates = the
    hyperplane-LSH bucket self-join (vectors this similar agree on
    every projection with high probability), verify = exact cosine ≥
    threshold. Returns (vec_a, vec_b, score) with vec_a < vec_b.

    At 10¹² rows the bucket self-join replaces the all-pairs product
    exactly like the MinHash band join does for text; recall for
    near-identical vectors is governed by n_planes (each plane flips
    with probability θ/π ≈ 0.045 at cosine 0.99)."""
    sig = embeddings.withColumn("sig", F.expr(signature_expr("embedding", n_planes)))
    a = sig.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), "sig"
    )
    b = sig.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), "sig"
    )
    return (
        a.join(b, "sig")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("score", F.round(F.expr(cosine_expr("emb_a", "emb_b")), 6))
        .filter(F.col("score") >= threshold)
        .select("vec_a", "vec_b", "score")
    )


def lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Bucketed ANN: exact cosine only within the query's LSH bucket.
    Deterministic (md5-derived planes) so the DuckDB oracle reproduces
    the same buckets and therefore the same result set."""
    sig = embeddings.withColumn("sig", F.expr(signature_expr("embedding", n_planes)))
    q = sig.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("sig").alias("q_sig"),
    )
    joined = (
        sig.join(F.broadcast(q), F.col("sig") == F.col("q_sig"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("score", F.round(F.expr(cosine_expr("q_emb", "embedding")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )
