"""Public Sneller-dialect surface (sneller_spark.partiql).

Exercises translate()/sql() over ordinary session temp views — i.e.
the user-facing path, not the corpus-replay harness — across the
dialect deltas a reference user would actually type.
"""

from __future__ import annotations

import pytest

from sneller_spark import partiql


def test_translate_is_pure_text():
    out = partiql.translate('SELECT "x" FROM input WHERE y IS MISSING')
    assert "`x`" in out
    assert "MISSING" not in out.upper()


@pytest.fixture(scope="module")
def pq_tables(spark):
    spark.createDataFrame(
        [
            (1, "widget", 4.0, ["a", "b"]),
            (2, "gadget", 2.5, ["b"]),
            (3, "widget", 7.5, []),
        ],
        "id BIGINT, kind STRING, price DOUBLE, tags ARRAY<STRING>",
    ).createOrReplaceTempView("items")
    yield
    spark.catalog.dropTempView("items")


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_sql_basic_agg(spark, pq_tables):
    df = partiql.sql(
        spark,
        'SELECT "kind", COUNT(*), SUM(price) AS total FROM items '
        "GROUP BY kind ORDER BY kind",
    )
    assert df.columns == ["kind", "count", "total"]
    assert _rows(df) == [("gadget", 1, 2.5), ("widget", 2, 11.5)]


def test_sql_constructors_and_unnest(spark, pq_tables):
    df = partiql.sql(
        spark,
        "SELECT id, t AS tag FROM items, items.tags AS t ORDER BY id, t",
    )
    assert _rows(df) == [(1, "a"), (1, "b"), (2, "b")]


def test_sql_struct_constructor(spark, pq_tables):
    df = partiql.sql(
        spark,
        "SELECT {'k': kind, 'p': price} AS rec FROM items WHERE id = 1",
    )
    r = df.collect()[0]["rec"]
    assert (r["k"], r["p"]) == ("widget", 4.0)


def test_sql_distinct_on(spark, pq_tables):
    # reference DISTINCT ON keeps one (unspecified) row per key group
    df = partiql.sql(
        spark,
        "SELECT DISTINCT ON (kind) kind, price FROM items ORDER BY kind",
    )
    rows = _rows(df)
    assert [r[0] for r in rows] == ["gadget", "widget"]
    assert rows[0][1] == 2.5 and rows[1][1] in (4.0, 7.5)


def test_sql_reference_builtins(spark, pq_tables):
    df = partiql.sql(
        spark,
        "SELECT id, EQUALS_FUZZY(kind, 'widgte', 1) AS fz FROM items "
        "ORDER BY id",
    )
    assert _rows(df) == [(1, True), (2, False), (3, True)]


def test_sql_error_discipline(spark, pq_tables):
    # the reference never aborts: double/0 is IEEE ±Inf, int/0 and a
    # failed cast are MISSING (-> NULL) — not exceptions
    df = partiql.sql(
        spark,
        "SELECT id, price / (id - 1) AS fdiv, 7 / 2 AS idiv, "
        "CAST(kind AS INTEGER) AS bad FROM items ORDER BY id",
    )
    rows = _rows(df)
    assert rows[0][1] == float("inf")
    assert rows[1][1:] == (2.5, 3, None)
