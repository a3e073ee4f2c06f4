"""OGR SQL dialect semantics ported to the Spark surface.

Each test mirrors a behavior asserted by the reference's SQL corpus
(``autotest/ogr/ogr_sql_test.py``, ``ogr_join_test.py``,
``ogr_sql_rfc28.py``) — the behavior is reimplemented, none of the
reference code is copied. Citations note the semantic source.
"""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.ogr_join import first_match_left_join, summary_aggregates


@pytest.fixture(scope="module")
def poly(spark):
    # shape of the classic autotest poly.shp layer: EAS_ID + PRFEDEA
    rows = [
        (168, "35043369"), (179, "35043408"), (171, "35043414"),
        (173, "35043416"), (172, "35043417"), (169, "35043423"),
        (166, "35043424"), (158, "35043425"), (165, "35043427"),
        (170, "35043429"),
    ]
    return spark.createDataFrame(rows, "eas_id long, prfedea string")


def test_like_is_case_insensitive(spark):
    """OGR SQL LIKE is ILIKE (swq_test_like, ogr/swq_op_general.cpp:41;
    autotest ogr_sql_test.py:329-381)."""
    df = spark.createDataFrame([("Liberty",), ("liberty",), ("Fraternity",)], "v string")
    # the engine's OGR-compat mapping: LIKE → ilike
    got = {r.v for r in df.filter(F.col("v").ilike("lib%")).collect()}
    assert got == {"Liberty", "liberty"}


def test_substr_is_one_based(spark):
    """SUBSTR offsets are 1-based (ogr/ogr_swq.h:64) — matches Spark."""
    df = spark.createDataFrame([("abcdef",)], "v string")
    assert df.select(F.substring("v", 2, 3).alias("s")).collect()[0].s == "bcd"


def test_between_inclusive(spark, poly):
    got = poly.filter(F.col("eas_id").between(165, 169)).count()
    assert got == 4  # 165,166,168,169 — inclusive both ends


def test_in_list_and_null(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "v int")
    assert df.filter(F.col("v").isin(1, 3)).count() == 1
    # NULL never matches IN (3-valued logic, ogr/ogr_swq.h:44-57)
    assert df.filter(~F.col("v").isin(1)).count() == 1  # only 2; NULL filtered
    assert df.filter(F.col("v").isNull()).count() == 1


def test_distinct_and_count_distinct(spark, poly):
    df = poly.withColumn("b", F.col("eas_id") % 2)
    assert df.select("b").distinct().count() == 2
    assert df.agg(F.countDistinct("b").alias("c")).collect()[0].c == 2


def test_order_by_nulls_first(spark):
    """OGR ORDER BY puts NULLs first ascending (CreateOrderByIndex
    comparator, ogr_gensql.cpp:2495)."""
    df = spark.createDataFrame([(3,), (None,), (1,)], "v int")
    got = [r.v for r in df.orderBy(F.col("v").asc_nulls_first()).collect()]
    assert got == [None, 1, 3]


def test_limit_offset(spark, poly):
    """LIMIT n OFFSET m (ogr/ogr_swq.h:479-484) via row_number."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("eas_id").asc())
    got = [
        r.eas_id
        for r in poly.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") > 3) & (F.col("_rn") <= 6))
        .collect()
    ]
    assert got == [168, 169, 170]


def test_cast_string_and_numeric(spark):
    df = spark.createDataFrame([(170.5, "171")], "d double, s string")
    r = df.select(
        F.col("d").cast("int").alias("i"),  # truncates toward zero
        F.col("s").cast("double").alias("f"),
        F.col("d").cast("string").alias("t"),
    ).collect()[0]
    assert r.i == 170 and r.f == 171.0 and r.t == "170.5"


def test_concat_and_hstore(spark):
    df = spark.createDataFrame([("a=>b,c=>d",)], "h string")
    r = df.select(
        F.concat(F.lit("x"), F.lit("-"), F.lit("y")).alias("c"),
        F.element_at(F.expr("str_to_map(h, ',', '=>')"), "c").alias("hv"),
    ).collect()[0]
    assert r.c == "x-y"
    assert r.hv == "d"  # hstore_get_value (ogr/ogr_swq.h:65)


def test_union_all_schema_merge(spark):
    a = spark.createDataFrame([(1, "x")], "k int, a string")
    b = spark.createDataFrame([(2, 2.0)], "k int, b double")
    u = a.unionByName(b, allowMissingColumns=True)
    assert u.count() == 2 and set(u.columns) == {"k", "a", "b"}


def test_first_match_join_exactly_one_row(spark, poly):
    """OGR LEFT JOIN: one output row per primary row, FIRST matching
    secondary in FID order, NULL-padded otherwise
    (ogr_sql_dialect.rst:508-513; ogr_join_test.py semantics)."""
    idlink = spark.createDataFrame(
        [(168, "foo", 1), (168, "bar", 2), (170, "baz", 1)],
        "eas_id long, name string, fid int",
    )
    out = first_match_left_join(
        poly, idlink, left_on="eas_id", right_on="eas_id", secondary_fid="fid",
        prefix="il_",
    )
    assert out.count() == poly.count()  # one row per primary, always
    by_id = {r.eas_id: r for r in out.collect()}
    assert by_id[168].il_name == "foo"  # first by FID, not "bar"
    assert by_id[170].il_name == "baz"
    assert by_id[179].il_name is None  # NULL-padded


def test_summary_mode(spark, poly):
    """SWQM_SUMMARY_RECORD single-row aggregates (ogr/ogr_swq.h:320)."""
    r = summary_aggregates(poly, "eas_id").collect()
    assert len(r) == 1
    r = r[0]
    assert r.min_v == 158 and r.max_v == 179 and r.count_v == 10
    assert r.sum_v == sum(
        [168, 179, 171, 173, 172, 169, 166, 158, 165, 170]
    )


def test_arithmetic_promotion(spark):
    """int/int → int in OGR (C semantics); engine documents Spark's
    int division returning int via div, / returning double."""
    df = spark.createDataFrame([(7, 2)], "a int, b int")
    r = df.select(
        (F.col("a") / F.col("b")).alias("fdiv"),
        F.expr("a div b").alias("idiv"),
        (F.col("a") % F.col("b")).alias("mod"),
    ).collect()[0]
    assert r.fdiv == 3.5 and r.idiv == 3 and r.mod == 1


def test_like_escape(spark):
    """LIKE ESCAPE (ogr/ogr_swq.h:53-54; swq_test_like handles the
    escape char): a literal % matches only itself."""
    df = spark.createDataFrame([("100%",), ("100x",), ("100",)], "v string")
    got = {r.v for r in df.filter(F.expr(r"v LIKE '100\%'")).collect()}
    assert got == {"100%"}


def test_in_with_null_three_valued(spark):
    """IN over a NULL value is NULL, not false — the row is filtered
    out but NOT matched by the negation either (3VL, ogr/ogr_swq.h:
    44-46 AND/OR/NOT with null propagation)."""
    df = spark.createDataFrame([(1,), (2,), (None,)], "v int")
    assert df.filter(F.col("v").isin(1, 3)).count() == 1
    assert df.filter(~F.col("v").isin(1, 3)).count() == 1  # NULL drops from both
    assert df.filter(F.col("v").isNull()).count() == 1


def test_not_between(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    assert df.filter(~F.col("v").between(3, 6)).count() == 6


def test_arithmetic_null_propagation(spark):
    """NULL propagates through arithmetic (SWQGeneralEvaluator null
    handling, ogr/swq_op_general.cpp)."""
    df = spark.createDataFrame([(1, None), (2, 3)], "a int, b int")
    rows = df.selectExpr("a + b AS s").collect()
    assert sorted([r.s for r in rows], key=lambda x: (x is None, x)) == [5, None]


def test_order_by_desc_nulls_and_limit_zero(spark):
    """DESC ordering + OGR's NULLs-first ascending convention
    (ogr_gensql.cpp:2495 comparator); LIMIT 0 is a valid empty set."""
    df = spark.createDataFrame([(3,), (None,), (1,)], "v int")
    asc = [r.v for r in df.orderBy(F.col("v").asc_nulls_first()).collect()]
    assert asc == [None, 1, 3]
    desc = [r.v for r in df.orderBy(F.col("v").desc_nulls_last()).collect()]
    assert desc == [3, 1, None]
    assert df.limit(0).count() == 0


def test_string_equality_case_sensitive(spark):
    """= on strings stays case-SENSITIVE even though LIKE is not
    (ogr_sql_test.py: WHERE 'x' = 'X' does not match)."""
    df = spark.createDataFrame([("Apple",), ("apple",)], "v string")
    assert df.filter(F.col("v") == "apple").count() == 1


def test_cast_truncates_not_rounds(spark):
    """CAST(double AS int) truncates toward zero (SWQCastEvaluator /
    C semantics), unlike round()."""
    df = spark.createDataFrame([(2.7,), (-2.7,)], "v double")
    got = sorted(r.i for r in df.selectExpr("CAST(v AS INT) AS i").collect())
    assert got == [-2, 2]


def test_concat_null_propagates(spark):
    """CONCAT with a NULL argument yields NULL (SQL semantics the OGR
    evaluator follows for string ops)."""
    df = spark.createDataFrame([("a", None), ("a", "b")], "x string, y string")
    rows = [r.c for r in df.select(F.concat("x", "y").alias("c")).collect()]
    assert sorted(rows, key=lambda v: (v is None, v)) == ["ab", None]
