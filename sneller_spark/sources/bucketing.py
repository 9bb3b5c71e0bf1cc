"""Bucketed tables — co-located joins and aggregations without a
shuffle.

At 100 TB the dominant cost of a repeated big-big join is re-shuffling
both sides on every query.  Writing both tables bucketed on the join
key (`bucketBy`) fixes the partitioning ON DISK: Spark's scan reports
the bucket spec, Catalyst sees both sides hash-distributed identically,
and the join plans with NO Exchange on either side.  This is the Spark
analog of the reference pre-partitioning tables by synthetic partition
fields (/root/reference/db/def.go:31-118) so queries prune and join
within partitions.

Bucketed writes go through the session catalog (saveAsTable — bucket
metadata lives in the metastore, a plain parquet path cannot carry it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) catalog table.

    Overwrite is made robust against ORPHANED managed-table locations:
    the session catalog is in-memory, so a table directory left by a
    previous session has no catalog entry and a plain overwrite fails
    with LOCATION_ALREADY_EXISTS — detect that case and clear the
    stale directory first."""
    spark = df.sparkSession
    if mode == "overwrite" and not spark.catalog.tableExists(table):
        import os
        import shutil
        from urllib.parse import urlparse

        # managed-table layout: default db lives at the warehouse root
        # (<warehouse>/<tbl>), any other db under <warehouse>/<db>.db/<tbl>
        if "." in table:
            db, tbl = table.rsplit(".", 1)
        else:
            db, tbl = spark.catalog.currentDatabase(), table
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        if db.lower() in ("", "default"):
            stale = os.path.join(warehouse, tbl.lower())
        else:
            stale = os.path.join(warehouse, f"{db.lower()}.db", tbl.lower())
        shutil.rmtree(stale, ignore_errors=True)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_agg(
    spark: SparkSession, table: str, group_cols: list[str], *aggs
) -> DataFrame:
    """Partition-wise aggregation: GROUP BY on the table's bucket
    column(s) runs both partial and final HashAggregate inside the
    scan's bucket distribution — NO Exchange anywhere in the plan
    (verify with plans.assert_no_exchange).  The Spark analog of the
    reference splitting a grouped query into per-partition sub-plans
    when the GROUP BY contains the partition keys
    (/root/reference/plan/pir/partition.go:23-77)."""
    return spark.table(table).groupBy(*group_cols).agg(*aggs)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    physical plan contains no Exchange (verify with
    plans.assert_no_shuffle_join)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
