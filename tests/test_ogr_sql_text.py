"""OGR SQL text front-end (gdal_spark/sql/ogr_sql.py).

Statements mirror the reference's own suite
(``autotest/ogr/ogr_sql_test.py``): IN lists, quoted table names,
LIKE vs ILIKE case behavior (test_ogr_sql_like/ilike), aggregates on
empty layers returning one NULL row and DISTINCT returning none
(test_ogr_sql_11/12), ``count_*``-style unaliased aggregate naming
(test_ogr_sql_5/30), FID selection (test_ogr_sql_7), ORDER BY FID
DESC, and the dialect's first-match LEFT JOIN
(``ogr_sql_dialect.rst:508-513``).
"""

from __future__ import annotations

import pytest

from gdal_spark.sql import OgrSqlError, execute_ogr_sql


@pytest.fixture(scope="module")
def layers(spark):
    poly = spark.createDataFrame(
        [
            (168, "35043411", "first"),
            (179, "35043423", "second"),
            (171, "35043414", "third"),
            (173, "35043416", "Fourth"),
            (172, "35043415", "FIFTH"),
            (165, "35043408", "sixth"),
            (158, "35043369", "seventh"),
        ],
        "eas_id int, prfedea string, name string",
    )
    empty = spark.createDataFrame([], "eas_id int, prfedea string, name string")
    link = spark.createDataFrame(
        [
            (168, "A", 1),
            (168, "B", 2),
            (171, "C", 3),
        ],
        "eas_id int, code string, link_fid int",
    )
    return {"poly": poly, "empty": empty, "idlink": link}


def _vals(df, col):
    return [r[col] for r in df.collect()]


def test_in_list_and_quoted_table(spark, layers):
    out = execute_ogr_sql(
        spark, "select * from poly where eas_id in (158,165)", layers
    )
    assert sorted(_vals(out, "prfedea")) == ["35043369", "35043408"]
    out = execute_ogr_sql(
        spark, 'select * from "poly" where eas_id in (158,165)', layers
    )
    assert out.count() == 2


def test_like_case_sensitive_ilike_insensitive(spark, layers):
    # modern reference default: LIKE is case-sensitive
    assert (
        execute_ogr_sql(spark, "select * from poly where name like 'F%'", layers).count()
        == 2  # 'Fourth', 'FIFTH'
    )
    assert (
        execute_ogr_sql(spark, "select * from poly where name like 'f%'", layers).count()
        == 1  # 'first'
    )
    assert (
        execute_ogr_sql(spark, "select * from poly where name ilike 'f%'", layers).count()
        == 3
    )
    # OGR_SQL_LIKE_AS_ILIKE=YES compatibility switch
    assert (
        execute_ogr_sql(
            spark, "select * from poly where name like 'f%'", layers, like_as_ilike=True
        ).count()
        == 3
    )


def test_aggregate_naming_and_empty_semantics(spark, layers):
    out = execute_ogr_sql(spark, "select max(eas_id) from empty", layers)
    assert out.columns == ["max_eas_id"]
    rows = out.collect()
    assert len(rows) == 1 and rows[0][0] is None  # test_ogr_sql_11
    out = execute_ogr_sql(spark, "select distinct eas_id from empty", layers)
    assert out.count() == 0  # test_ogr_sql_12
    out = execute_ogr_sql(spark, "select count(*), min(eas_id) from poly", layers)
    assert out.columns == ["count_*", "min_eas_id"]
    r = out.collect()[0]
    assert r[0] == 7 and r[1] == 158


def test_fid_special_field_and_order(spark, layers):
    # FID of poly defaults to its first column (eas_id)
    out = execute_ogr_sql(
        spark, "select eas_id, fid from poly where eas_id in (158,165)", layers
    )
    assert sorted(_vals(out, "fid")) == [158, 165]
    out = execute_ogr_sql(spark, "select eas_id from poly order by fid desc", layers)
    assert _vals(out, "eas_id")[0] == 179


def test_first_match_left_join(spark, layers):
    """One row per primary row; secondary dedup in FID order (link_fid
    declared as idlink's FID)."""
    out = execute_ogr_sql(
        spark,
        "select p.eas_id, il.code from poly p left join idlink il "
        "on p.eas_id = il.eas_id order by p.eas_id",
        layers,
        fids={"idlink": "link_fid"},
    )
    rows = out.collect()
    assert len(rows) == 7  # one per primary row, never duplicated
    got = {r.eas_id: r.code for r in rows}
    assert got[168] == "A"  # first match in FID order, not 'B'
    assert got[171] == "C"
    assert got[158] is None  # NULL-padded non-match


def test_cast_character_truncates(spark, layers):
    out = execute_ogr_sql(
        spark,
        "select cast(prfedea as character(4)) as p4 from poly where eas_id = 158",
        layers,
    )
    assert _vals(out, "p4") == ["3504"]


def test_distinct_order_limit_offset(spark, layers):
    out = execute_ogr_sql(
        spark,
        "select distinct substr(name, 1, 1) as initial from poly "
        "order by initial limit 3 offset 1",
        layers,
    )
    vals = _vals(out, "initial")
    assert len(vals) == 3 and vals == sorted(vals)


def test_star_exclude_and_exprs(spark, layers):
    out = execute_ogr_sql(spark, "select * exclude (name) from poly", layers)
    assert out.columns == ["eas_id", "prfedea"]
    out = execute_ogr_sql(
        spark,
        "select eas_id, eas_id % 7 as m, concat(name, '!') as shout from poly "
        "where eas_id between 165 and 171",
        layers,
    )
    rows = {r.eas_id: (r.m, r.shout) for r in out.collect()}
    assert rows[168] == (0, "first!")


def test_errors(spark, layers):
    with pytest.raises(OgrSqlError):
        execute_ogr_sql(spark, "select * from nosuch", layers)
    with pytest.raises(OgrSqlError):
        execute_ogr_sql(spark, "delete from poly", layers)
    with pytest.raises(OgrSqlError):
        execute_ogr_sql(
            spark,
            "select * from poly p left join idlink il on p.eas_id < il.eas_id",
            layers,
        )


def test_hstore_get_value(spark):
    df = spark.createDataFrame(
        [(1, 'a=>x, b=>2'), (2, 'a=>y')], "id int, hs string"
    )
    out = execute_ogr_sql(
        spark,
        "select id, hstore_get_value(hs, 'a') as va, "
        "hstore_get_value(hs, 'b') as vb from t order by id",
        {"t": df},
    )
    rows = out.collect()
    assert [r.va for r in rows] == ["x", "y"]
    assert [r.vb for r in rows] == ["2", None]


def test_union_all_two_selects(spark, layers):
    """gcore/gdaldataset.cpp:7560 splits on top-level UNION ALL and
    concatenates positionally under the first SELECT's schema."""
    df = execute_ogr_sql(
        spark,
        "SELECT eas_id, name FROM poly WHERE eas_id < 165 "
        "UNION ALL SELECT eas_id, prfedea FROM poly WHERE eas_id > 178",
        layers,
    )
    rows = sorted((r[0], r[1]) for r in df.collect())
    assert rows == [(158, "seventh"), (179, "35043423")]
    assert df.columns == ["eas_id", "name"]  # first branch names win


def test_union_all_three_chain_with_orderby_limit(spark, layers):
    df = execute_ogr_sql(
        spark,
        "SELECT eas_id FROM poly ORDER BY eas_id LIMIT 1 "
        "UNION ALL SELECT eas_id FROM poly ORDER BY eas_id DESC LIMIT 1 "
        "UNION ALL SELECT COUNT(*) FROM poly",
        layers,
    )
    assert sorted(r[0] for r in df.collect()) == [7, 158, 179]


def test_union_all_aggregates_both_sides(spark, layers):
    df = execute_ogr_sql(
        spark,
        "SELECT MIN(eas_id), MAX(eas_id) FROM poly "
        "UNION ALL SELECT COUNT(*), COUNT(DISTINCT name) FROM poly",
        layers,
    )
    assert sorted(tuple(r) for r in df.collect()) == [(7, 7), (158, 179)]


def test_union_without_all_rejected(spark, layers):
    with pytest.raises(OgrSqlError, match="UNION without ALL"):
        execute_ogr_sql(
            spark,
            "SELECT eas_id FROM poly UNION SELECT eas_id FROM poly",
            layers,
        )


def test_union_all_column_count_mismatch(spark, layers):
    with pytest.raises(OgrSqlError, match="column count"):
        execute_ogr_sql(
            spark,
            "SELECT eas_id FROM poly UNION ALL SELECT eas_id, name FROM poly",
            layers,
        )


def test_union_all_inside_in_list_not_split(spark, layers):
    # parenthesized subexpressions must not trigger the top-level split
    df = execute_ogr_sql(
        spark,
        "SELECT eas_id FROM poly WHERE eas_id IN (158, 179) "
        "UNION ALL SELECT eas_id FROM poly WHERE name = 'third'",
        layers,
    )
    assert sorted(r[0] for r in df.collect()) == [158, 171, 179]
