"""Explicit skew handling — the deterministic analog of the
reference's weighted block distribution
(/root/reference/plan/unionmap.go:208-341 `distribute()`), and the
manual counterpart to AQE's skew-join splitting.

``repartition_salted`` spreads a hot key's rows over ``buckets``
sub-partitions deterministically (xxhash64 of a per-row unique column),
so a stage keyed on a Zipf-skewed column (syslog-a carries ~35% of all
rows) never serializes on one task.  Aggregations over salted
partitions must be two-phase (see pipeline/aggregate.py) — counts/sums
reassociate exactly, so results never change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, unique_col: str, buckets: int = 16) -> DataFrame:
    """Deterministic per-row salt in [0, buckets)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(buckets))
    )


def repartition_salted(
    df: DataFrame,
    keys: list[str],
    unique_col: str,
    buckets: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Hash-repartition on (keys + salt): each hot key spreads over
    ``buckets`` partitions instead of one.  The salt column is kept so
    a following groupBy can do the exact two-phase merge; drop it with
    .drop(SALT_COL) for write paths."""
    salted = with_salt(df, unique_col, buckets)
    cols = [F.col(k) for k in keys] + [F.col(SALT_COL)]
    if num_partitions is not None:
        return salted.repartition(num_partitions, *cols)
    return salted.repartition(*cols)


def partition_histogram(df: DataFrame) -> list[int]:
    """Rows per physical partition — the skew measurement used in
    tests (reference analog: block weights)."""
    counts = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    return [r["count"] for r in counts]
