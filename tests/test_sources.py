"""Sources/sinks: suffix-dispatched readers, TABLE_GLOB, append,
zero-row/one-row sources, gated Iceberg writer."""

from __future__ import annotations

import json

import pytest

from sneller_spark.sources import (
    append_tables,
    dummy_output,
    no_output,
    read_table,
    table_glob,
    write_iceberg_or_parquet,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sources")
    with open(d / "a.ndjson", "w") as f:
        for i in range(5):
            f.write(json.dumps({"id": i, "name": f"a{i}"}) + "\n")
    with open(d / "b.csv", "w") as f:
        f.write("id,name\n10,b0\n11,b1\n")
    with open(d / "c.tsv", "w") as f:
        f.write("id\tname\n20\tc0\n")
    return d


def test_read_ndjson_csv_tsv(spark, data_dir):
    assert read_table(spark, str(data_dir / "a.ndjson")).count() == 5
    csv = read_table(spark, str(data_dir / "b.csv"))
    assert csv.count() == 2 and set(csv.columns) == {"id", "name"}
    assert read_table(spark, str(data_dir / "c.tsv")).count() == 1


def test_table_glob_union(spark, data_dir, tmp_path):
    spark.createDataFrame([(1, "x")], ["id", "name"]).write.parquet(str(tmp_path / "t1.parquet"))
    spark.createDataFrame([(2, "y"), (3, "z")], ["id", "name"]).write.parquet(
        str(tmp_path / "t2.parquet")
    )
    got = table_glob(spark, str(tmp_path / "t*.parquet"))
    assert got.count() == 3
    with pytest.raises(FileNotFoundError):
        table_glob(spark, str(tmp_path / "nope*.parquet"))


def test_append_tables_schema_reconciliation(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "name"])
    b = spark.createDataFrame([(2, 3.5)], ["id", "score"])
    got = append_tables(a, b)
    assert got.count() == 2
    assert set(got.columns) == {"id", "name", "score"}


def test_no_output_dummy_output(spark):
    assert no_output(spark).count() == 0
    assert dummy_output(spark).count() == 1  # SELECT 3 semantics
    assert dummy_output(spark).selectExpr("3 AS v").first()["v"] == 3


def test_write_sink_falls_back_to_parquet(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "part"])
    fmt = write_iceberg_or_parquet(df, str(tmp_path / "out"), partition_by=["part"])
    assert fmt == "parquet"  # no Iceberg jar in this sandbox
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 2 and set(back.columns) == {"id", "part"}


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must join with zero
    Exchange in the plan — the co-location contract that matters at
    100 TB (bucketing == reference's pre-partitioned tables,
    /root/reference/db/def.go:31-118)."""
    from pyspark.sql import functions as F

    from sneller_spark.plans import assert_no_exchange
    from sneller_spark.sources.bucketing import bucketed_join, write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        facts = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        )
        dims = spark.range(0, 10_000, 7).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("d")
        )
        write_bucketed(facts, "b_facts", ["k"], n_buckets=8, sort_cols=["k"])
        write_bucketed(dims, "b_dims", ["k"], n_buckets=8, sort_cols=["k"])

        joined = bucketed_join(spark, "b_facts", "b_dims", on=["k"])
        assert_no_exchange(joined)
        assert joined.count() == dims.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_facts")
        spark.sql("DROP TABLE IF EXISTS b_dims")


def test_write_bucketed_qualified_name_orphan_cleanup(spark):
    """Overwrite of a db-qualified bucketed table must survive an
    orphaned warehouse directory (files on disk, no entry in the
    in-memory catalog): the managed path for 'db.tbl' is
    <warehouse>/<db>.db/<tbl>, not <warehouse>/<db.tbl>."""
    import os
    from urllib.parse import urlparse

    from pyspark.sql import functions as F

    from sneller_spark.sources.bucketing import write_bucketed

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    spark.sql("CREATE DATABASE IF NOT EXISTS qdb")
    try:
        # plant an orphaned location where the managed table would live
        stale = os.path.join(warehouse, "qdb.db", "q_orphan")
        os.makedirs(stale, exist_ok=True)
        open(os.path.join(stale, "junk"), "w").write("stale")
        assert not spark.catalog.tableExists("qdb.q_orphan")

        df = spark.range(0, 100).select(F.col("id").alias("k"))
        write_bucketed(df, "qdb.q_orphan", ["k"], n_buckets=4)
        assert spark.table("qdb.q_orphan").count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS qdb.q_orphan")
        spark.sql("DROP DATABASE IF EXISTS qdb CASCADE")


def test_bucketed_partitionwise_agg_build_cached(spark):
    """The catalog entry builds its bucketed table once per source
    identity: a second invocation finds the table and must not plan a
    write job (same discipline as the persisted ANN indexes)."""
    import os

    from sneller_spark import query_catalog_ml  # noqa: F401 — registers the entry
    from sneller_spark.query_catalog import CATALOG

    sf_dir = "/root/testdata/sf0.001"
    first = CATALOG["bucketed_partitionwise_agg"].fn(spark, sf_dir).toPandas()
    tables = [t.name for t in spark.catalog.listTables()
              if t.name.startswith("pw_agg_lineitem_")]
    assert len(tables) == 1
    # directory mtime freezes once built; a rewrite would bump it
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    tdir = os.path.join(warehouse, tables[0])
    mtime = os.path.getmtime(tdir)
    second = CATALOG["bucketed_partitionwise_agg"].fn(spark, sf_dir).toPandas()
    assert sorted(first["flag"]) == sorted(second["flag"])
    assert os.path.getmtime(tdir) == mtime


def test_table_pattern_regex_subset(spark, tmp_path):
    """TABLE_PATTERN (plan/multi.go:73-103): regex over table NAMES
    selects a subset, schemas reconciled by name; no match raises."""
    from sneller_spark.sources import table_pattern

    spark.createDataFrame([(1, "x")], ["id", "name"]).write.parquet(
        str(tmp_path / "logs_2024.parquet")
    )
    spark.createDataFrame([(2, "y")], ["id", "name"]).write.parquet(
        str(tmp_path / "logs_2025.parquet")
    )
    # different schema + name that must NOT match the pattern
    spark.createDataFrame([(3, 1.5)], ["id", "score"]).write.parquet(
        str(tmp_path / "metrics_2025.parquet")
    )

    got = table_pattern(spark, str(tmp_path), r"logs_\d{4}")
    assert got.count() == 2 and set(got.columns) == {"id", "name"}

    # regex is anchored (fullmatch): a prefix alone must not match
    both = table_pattern(spark, str(tmp_path), r"(logs|metrics)_2025")
    assert both.count() == 2 and set(both.columns) == {"id", "name", "score"}

    with pytest.raises(FileNotFoundError):
        table_pattern(spark, str(tmp_path), r"logs")  # no full-name match


def test_read_records_json_cloudtrail_shape(spark, tmp_path):
    """{"Records": [...]} flattening (jsonrl/cloudtrail.go:27-36)."""
    import json

    from sneller_spark.sources import read_records_json

    p = tmp_path / "trail.json"
    p.write_text(json.dumps({
        "Records": [
            {"eventName": "PutObject", "awsRegion": "us-east-1", "n": 1},
            {"eventName": "GetObject", "awsRegion": "eu-west-2", "n": 2},
        ]
    }))
    got = read_records_json(spark, str(p))
    assert got.count() == 2
    assert set(got.columns) == {"eventName", "awsRegion", "n"}
    assert {r["eventName"] for r in got.collect()} == {"PutObject", "GetObject"}

    (tmp_path / "bad.json").write_text(json.dumps({"NotRecords": []}))
    with pytest.raises(ValueError):
        read_records_json(spark, str(tmp_path / "bad.json"))


def test_bucketed_aggregation_has_no_shuffle(spark):
    """GROUP BY on the bucket column must aggregate with zero Exchange
    — the partition-wise aggregation the reference builds when the
    GROUP BY contains partition keys
    (/root/reference/plan/pir/partition.go:23-77).  Both the plan shape
    and the values are checked."""
    from pyspark.sql import functions as F

    from sneller_spark.plans import assert_no_exchange
    from sneller_spark.sources.bucketing import bucketed_agg, write_bucketed

    try:
        rows = spark.range(0, 10_000).select(
            (F.col("id") % 50).cast("string").alias("source"),
            (F.col("id") % 997).alias("n_tok"),
        )
        write_bucketed(rows, "b_agg_tokens", ["source"], n_buckets=8)
        agg = bucketed_agg(
            spark,
            "b_agg_tokens",
            ["source"],
            F.sum("n_tok").alias("sum_tok"),
            F.count(F.lit(1)).alias("n"),
        )
        assert_no_exchange(agg)
        got = agg.toPandas().set_index("source").sort_index()
        exp = (
            rows.groupBy("source")
            .agg(F.sum("n_tok").alias("sum_tok"), F.count(F.lit(1)).alias("n"))
            .toPandas()
            .set_index("source")
            .sort_index()
        )
        assert got.equals(exp)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_agg_tokens")
