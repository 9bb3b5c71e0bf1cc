"""Time-series joins Spark lacks as built-ins: as-of join and bucketed
range (interval) join.

The reference's query surface is log analytics over timestamped events
(vm/ scans + time filters; TIME_BUCKET in expr/builtin.go); joining a
log stream to the "latest state at or before t" (as-of) or to
enclosing intervals (range) are the two lookups every telemetry
pipeline eventually needs and Spark only offers via inequality joins
— which Catalyst plans as BroadcastNestedLoopJoin, O(n*m) and
undriveable at 100 TB.  Both operators here are pure DataFrame
compositions with bounded shuffles, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    t_col: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    tolerance: float | None = None,
    matched_t_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach `value_cols`
    from the LATEST right row with the same `by` keys and
    right.t <= left.t (inclusive, matching DuckDB/pandas merge_asof
    defaults); no match -> NULLs.

    Implementation is the distributed merge shape — NOT an inequality
    join: both sides union (right rows carry the values, left rows
    carry nulls), ONE shuffle on the `by` keys, one sort by (t, side)
    within each key, and a running last(value, ignorenulls) window
    fills each left row from the most recent right row at or before
    it.  Wall cost is sort-merge, identical to co-partitioned
    merge_asof; right rows with equal (by, t) are tie-broken
    arbitrarily — pre-aggregate the right side to one row per (by, t)
    for determinism.

    `tolerance` (same units as t_col after arithmetic — use numeric /
    epoch seconds) nulls out matches older than left.t - tolerance.
    `matched_t_col` optionally exposes the matched right timestamp.
    With by=None the series is global and the sort degenerates to a
    single partition — inherently sequential; supply keys at scale.

    The fill carries the matched right ROW as a unit (one struct per
    right row, last(ignorenulls) over the struct): a NULL field in the
    matched row stays NULL — it is never papered over by an older
    non-NULL value — and every value column comes from the SAME
    matched row, exactly like DuckDB ASOF / merge_asof."""
    by = by or []
    value_cols = value_cols or [
        c for c in right.columns if c != t_col and c not in by
    ]
    # the whole right row travels as one struct: non-null for every
    # right row even when its fields are null, so last(ignorenulls)
    # always picks the latest right ROW, not the latest non-null field
    rstruct = F.struct(
        F.col(t_col).alias("_rt"), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(
        *[F.col(c) for c in by], F.col(t_col), rstruct.alias("_rrow")
    ).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*[F.col(c) for c in by] or [F.lit(1)])
        .orderBy(F.col(t_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn(
        "_m", F.last("_rrow", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    if tolerance is not None:
        stale = F.col("_m._rt") < (F.col(t_col) - F.lit(tolerance))
        out = out.withColumn("_m", F.when(~stale, F.col("_m")))
    keep = [F.col(c) for c in left.columns]
    keep += [F.col(f"_m.{c}").alias(c) for c in value_cols]
    if matched_t_col:
        keep.append(F.col("_m._rt").alias(matched_t_col))
    return out.select(*keep)


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bucket_width: float = 3600.0,
) -> DataFrame:
    """Range (interval) join: every (point, interval) pair with the
    same `by` keys and start <= t < end — as an EQUI-join, never a
    nested-loop.

    Both sides map to buckets of `bucket_width` (numeric domain — pass
    epoch seconds for timestamps): a point has one bucket, an interval
    explodes to every bucket it overlaps, the join runs on
    (by..., bucket) and an exact start/end filter removes the edge
    overcount.  A point matches an interval in exactly one bucket (its
    own), so no dedup pass is needed.  Interval replication is
    ceil(length / bucket_width) + 1 — pick bucket_width near the
    median interval length so replication stays O(1) while bucket
    cardinality keeps the shuffle balanced."""
    assert bucket_width > 0, bucket_width
    by = by or []
    w = float(bucket_width)
    p = points.withColumn("_bkt", F.floor(F.col(t_col) / w).cast("long"))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    joined = p.join(iv, on=by + ["_bkt"], how="inner").filter(
        (F.col(t_col) >= F.col(start_col)) & (F.col(t_col) < F.col(end_col))
    )
    return joined.drop("_bkt")


_GRAN_ORDER = ["minute", "hour", "day", "week", "month", "year"]


def rollup_time_buckets(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    granularities: tuple[str, ...] = ("hour", "day"),
) -> dict[str, DataFrame]:
    """Hypertable-style hierarchical rollups: partial aggregates
    (n, sum, min, max — avg is sum/n at read time) per time bucket and
    key, one DataFrame per granularity.

    The finest level aggregates the raw events ONCE; every coarser
    level re-aggregates the NEXT-FINER ROLLUP, not the raw table — a
    day bucket reads 24 hour-rows instead of the day's raw events, a
    month reads ~30 day-rows.  That is the continuous-aggregate trick
    that makes multi-granularity dashboards O(rollup) instead of
    O(raw) at 100 TB: the raw table is scanned exactly once no matter
    how many levels are materialized (each level is persisted before
    the next derives from it — without that, lazy lineage would
    re-execute the raw scan per materialized level; Spark's
    ContextCleaner releases the caches when the returned DataFrames
    are garbage-collected, or write each level out and read it back
    for a durable hierarchy).  Partials compose losslessly
    (sum of sums, sum of counts, min of mins, max of maxs), which is
    also what makes merge_rollup's incremental maintenance exact."""
    key_cols = key_cols or []
    grans = list(granularities)
    order = [g for g in _GRAN_ORDER if g in grans]
    assert order == grans, f"granularities must be finest-first from {_GRAN_ORDER}"
    # weeks straddle month/year boundaries: a month derived from week
    # buckets would be wrong, so 'week' may only terminate the chain
    assert "week" not in grans[:-1], "'week' must be the last granularity"

    from pyspark import StorageLevel

    out: dict[str, DataFrame] = {}
    finest = grans[0]
    out[finest] = (
        df.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket"), *key_cols
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )
    if len(grans) > 1:
        out[finest] = out[finest].persist(StorageLevel.MEMORY_AND_DISK)
    for prev, gran in zip(grans, grans[1:]):
        out[gran] = (
            out[prev]
            .groupBy(F.date_trunc(gran, F.col("bucket")).alias("bucket"), *key_cols)
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_v").alias("sum_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            )
        )
        if gran != grans[-1]:
            out[gran] = out[gran].persist(StorageLevel.MEMORY_AND_DISK)
    return out


def merge_rollup(
    existing: DataFrame,
    delta: DataFrame,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental rollup maintenance: fold a new batch's partials into
    an existing rollup of the same granularity — union + one groupBy
    on (bucket, keys).  Because the partials compose losslessly, the
    merged rollup is EXACTLY the rollup of the union of the raw data
    (pytest-proven), so a streaming/batch ingest only ever aggregates
    its new files and touches rollup rows for the buckets it saw."""
    key_cols = key_cols or []
    return (
        existing.unionByName(delta)
        .groupBy("bucket", *key_cols)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )
