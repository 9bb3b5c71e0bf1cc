"""SQL veneer (sneller_spark/sql_registry.py): every registered SQL
UDF must agree value-for-value with the DataFrame implementation it
mirrors, and must inline into the plan (no Python eval node).

The veneer is the package's answer to the reference's SQL-first
surface (/root/reference/expr/partiql/partiql.y): same builtin names,
same semantics, zero Python boundary.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sneller_spark.functions import scalar as sc
from sneller_spark.operators import curation, sketch
from sneller_spark.sql_registry import SQL_FUNCTION_NAMES, register_sql_functions


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_sql_functions(spark)


@pytest.fixture(scope="module")
def rows(spark):
    data = [
        Row(
            id="doc-%03d" % i,
            s=s,
            needle=n,
            ip=ip,
            vec_a=[float(i), 1.0, -2.5],
            vec_b=[0.5, float(i % 7), 3.0],
            ts="2023-06-0%d 0%d:17:4%d" % (i % 9 + 1, i % 10, i % 10),
            lat=(i * 17.3) % 170 - 85,
            lon=(i * 39.1) % 350 - 175,
            stratum=["wiki", "crawl", "code"][i % 3],
        )
        for i, (s, n, ip) in enumerate(
            [
                ("Hello World", "WORLD", "10.1.2.3"),
                ("kitten", "sitting", "192.168.0.255"),
                ("", "x", "256.1.2.3"),
                ("ÜNICODE text", "ünicode", "1.2.3"),
                ("same", "same", "not-an-ip"),
                ("abcdef", "abXdef", "0.0.0.0"),
                ("repeat repeat", "peat", "255.255.255.255"),
                ("tab\tsep", "sep", "10.001.2.3"),
            ]
        )
    ]
    df = spark.createDataFrame(data).withColumn("ts", F.col("ts").cast("timestamp"))
    df.createOrReplaceTempView("veneer_input")
    return df


def _pairs(spark, df, sql_expr: str, df_col, tol=1e-9):
    """Collect (sql, dataframe) value pairs keyed by id and assert
    pairwise equality (with float tolerance)."""
    got_sql = {
        r["id"]: r["v"]
        for r in spark.sql(
            f"SELECT id, {sql_expr} AS v FROM veneer_input"
        ).collect()
    }
    got_df = {r["id"]: r["v"] for r in df.select("id", df_col.alias("v")).collect()}
    assert got_sql.keys() == got_df.keys()
    for k in got_sql:
        a, b = got_sql[k], got_df[k]
        if isinstance(a, float) and isinstance(b, float):
            assert a == pytest.approx(b, abs=tol), (k, a, b)
        else:
            assert a == b, (k, a, b)


def test_strings_match_dataframe_impl(spark, rows):
    # the DF API takes a Python-constant needle (sc.contains_ci(col,
    # "lit")); the SQL veneer generalizes it to a column needle —
    # compare against the same expression applied per-row, plus the
    # constant-needle DF form on a fixed needle
    _pairs(spark, rows, "contains_ci(s, needle)", F.instr(F.lower("s"), F.lower("needle")) > 0)
    _pairs(spark, rows, "contains_ci(s, 'EAT')", sc.contains_ci(F.col("s"), "EAT"))
    _pairs(spark, rows, "equals_ci(s, needle)", F.lower("s") == F.lower("needle"))
    _pairs(spark, rows, "equals_ci(s, 'SAME')", sc.equals_ci(F.col("s"), "SAME"))


def test_equals_fuzzy_exact_levenshtein(spark, rows):
    # kitten/sitting = 3 edits; abcdef/abXdef = 1
    got = {
        r["id"]: r["v"]
        for r in spark.sql(
            "SELECT id, equals_fuzzy(s, needle, 2) AS v FROM veneer_input"
        ).collect()
    }
    assert got["doc-001"] is False  # kitten->sitting needs 3
    assert got["doc-005"] is True   # abcdef->abXdef needs 1
    assert got["doc-004"] is True   # identical


def test_ip_to_long_matches(spark, rows):
    _pairs(spark, rows, "ip_to_long(ip)", sc.ip_to_long(F.col("ip")))


@pytest.mark.parametrize("cidr", ["10.1.0.0/16", "0.0.0.0/0", "255.255.255.255/32", "192.168.0.0/24"])
def test_is_subnet_of_matches(spark, rows, cidr):
    _pairs(spark, rows, f"is_subnet_of('{cidr}', ip)", sc.is_subnet_of(cidr, F.col("ip")))


def test_ip_in_range_matches(spark, rows):
    # the reference's 3-arg IS_SUBNET_OF(start, end, ip): inclusive
    # range, leading zeros fine, malformed -> null (golden 0418)
    _pairs(
        spark, rows,
        "ip_in_range('10.0.0.0', '192.168.0.255', ip)",
        sc.ip_in_range(F.lit("10.0.0.0"), F.lit("192.168.0.255"), F.col("ip")),
    )
    got = spark.sql(
        "SELECT ip_in_range('128.1.2.3', '128.1.2.5', '128.001.002.005') AS a, "
        "       ip_in_range('128.1.2.3', '128.1.2.5', '128.1.2.6') AS b, "
        "       ip_in_range('128.1.2.3', '128.1.2.5', 'junk') AS c"
    ).collect()[0]
    assert got["a"] is True and got["b"] is False and got["c"] is None


def test_vector_distances_match(spark, rows):
    _pairs(spark, rows, "inner_product(vec_a, vec_b)", sc.inner_product(F.col("vec_a"), F.col("vec_b")))
    _pairs(spark, rows, "l1_distance(vec_a, vec_b)", sc.l1_distance(F.col("vec_a"), F.col("vec_b")))
    _pairs(spark, rows, "l2_distance(vec_a, vec_b)", sc.l2_distance(F.col("vec_a"), F.col("vec_b")))
    _pairs(spark, rows, "cosine_distance(vec_a, vec_b)", sc.cosine_distance(F.col("vec_a"), F.col("vec_b")), tol=1e-9)


def test_time_buckets_match(spark, rows):
    _pairs(spark, rows, "time_bucket(ts, 3600)", sc.time_bucket(F.col("ts"), 3600))
    _pairs(
        spark, rows,
        "date_bin(900, ts, timestamp'2023-01-01 00:00:00')",
        sc.date_bin(F.col("ts"), 900, "2023-01-01 00:00:00"),
    )


def test_geo_match(spark, rows):
    _pairs(
        spark, rows,
        "geo_distance(lat, lon, 48.8566d, 2.3522d)",
        sc.geo_distance_m(F.col("lat"), F.col("lon"), F.lit(48.8566), F.lit(2.3522)),
        tol=1e-6,
    )
    _pairs(spark, rows, "geo_tile_x(lon, 8)", sc.geo_tile_x(F.col("lon"), 8))
    _pairs(spark, rows, "geo_tile_y(lat, 8)", sc.geo_tile_y(F.col("lat"), 8))
    _pairs(spark, rows, "geo_tile_es(lat, lon, 8)", sc.geo_tile_es(F.col("lat"), F.col("lon"), 8))


def test_split_bucket_and_label_match(spark, rows):
    _pairs(spark, rows, "split_bucket(id, 'salt1')", curation.split_bucket_col(F.col("id"), "salt1"))
    # split_label == hash_split 3-way labels
    labeled = curation.hash_split(rows, "id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s2")
    got_df = {r["id"]: r["split"] for r in labeled.select("id", "split").collect()}
    got_sql = {
        r["id"]: r["v"]
        for r in spark.sql(
            "SELECT id, split_label(id, 's2', 0.8d, 0.1d) AS v FROM veneer_input"
        ).collect()
    }
    assert got_sql == got_df


def test_sample_keep_matches_deterministic_sample(spark, rows):
    kept_df = {r["id"] for r in curation.deterministic_sample(rows, "id", 0.5, salt="z").select("id").collect()}
    kept_sql = {
        r["id"]
        for r in spark.sql(
            "SELECT id FROM veneer_input WHERE sample_keep(id, 0.5d, 'z')"
        ).collect()
    }
    assert kept_sql == kept_df


def test_cm_estimate_recipe_in_pure_sql(spark, rows):
    """Full count-min flow in SQL text only — build with LATERAL VIEW
    explode(sequence(..)) + cm_bucket, estimate with a join + min —
    must equal the DataFrame operator's estimates exactly."""
    depth, width, seed = 4, 64, 7
    sk = sketch.cm_sketch(rows, "stratum", depth=depth, width=width, seed=seed)
    est_df = {
        r["stratum"]: r["est"]
        for r in sketch.cm_estimate(sk, rows.select("stratum").distinct(), "stratum").collect()
    }
    spark.sql(
        f"""
        SELECT d, cm_bucket(stratum, d, {width}, {seed}) AS bucket, count(*) AS cnt
        FROM veneer_input
        LATERAL VIEW explode(sequence(0, {depth - 1})) t AS d
        WHERE stratum IS NOT NULL
        GROUP BY 1, 2
        """
    ).createOrReplaceTempView("veneer_cm")
    est_sql = {
        r["stratum"]: r["est"]
        for r in spark.sql(
            f"""
            SELECT p.stratum, min(coalesce(s.cnt, 0)) AS est
            FROM (
              SELECT DISTINCT stratum, d,
                     cm_bucket(stratum, d, {width}, {seed}) AS bucket
              FROM veneer_input
              LATERAL VIEW explode(sequence(0, {depth - 1})) t AS d
            ) p
            LEFT JOIN veneer_cm s ON p.d = s.d AND p.bucket = s.bucket
            GROUP BY p.stratum
            """
        ).collect()
    }
    assert est_sql == est_df
    # never-undercount: estimate >= true count
    true = {r["stratum"]: r["c"] for r in rows.groupBy("stratum").agg(F.count("*").alias("c")).collect()}
    for k, v in true.items():
        assert est_sql[k] >= v


def test_veneer_inlines_no_python_boundary(spark, rows):
    """The whole point of SQL UDFs: calls inline into Catalyst.  The
    physical plan of a veneer-heavy query must contain no Python eval
    operator and keep whole-stage codegen."""
    plan = (
        spark.sql(
            """
            SELECT id, inner_product(vec_a, vec_b) AS ip,
                   geo_tile_es(lat, lon, 6) AS tile,
                   time_bucket(ts, 900) AS tb,
                   is_subnet_of('10.0.0.0/8', ip) AS in10
            FROM veneer_input
            """
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "PythonMapInArrow" not in plan
    # '*(n)' prefixes mark whole-stage-codegen stages in executedPlan
    # toString; the veneer expressions must sit inside one
    assert "*(1)" in plan


def test_registry_names_complete(spark):
    """Every advertised name resolves as a function in this session."""
    for name in SQL_FUNCTION_NAMES:
        # DESCRIBE FUNCTION raises if unresolvable
        spark.sql(f"DESCRIBE FUNCTION {name}").collect()
