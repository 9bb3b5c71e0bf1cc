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
    global_chunks: int = 1,
    global_bounds: tuple[float, float] | None = None,
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
    matched row, exactly like DuckDB ASOF / merge_asof.

    With by=None pass `global_chunks` > 1 to run the global series in
    parallel: rows are range-chunked on t, each chunk fills locally,
    and a tiny per-chunk carry (the latest right row of every earlier
    chunk) is broadcast back — two scans + one n_chunks-row window
    instead of a single-partition sort.  Chunk edges come from a
    1-row min/max aggregate broadcast-joined IN-PLAN (a pure lazy
    transformation — no Spark job runs at call time); the 1-row
    result is persist()ed so the stats scan runs once per action, at
    the cost of one session-lifetime cache entry per call and bounds
    frozen at the FIRST action.  Imperfect or stale bounds can never
    produce wrong results — chunk ids clamp into [0, chunks) and the
    carry covers every chunk — they only degrade chunk balance.  Pass
    `global_bounds=(lo, hi)` (t cast to double) to skip the stats
    scan and the cache entirely, e.g. from parquet footer min/max."""
    by = by or []
    _reserved = {"_side", "_rrow", "_m", "_chunk", "_carry", "_lo", "_hi"}
    bad = _reserved & (set(left.columns) | set(right.columns))
    if bad:
        raise ValueError(
            f"asof_join: reserved internal column names present in input: {sorted(bad)}"
        )
    value_cols = value_cols or [
        c for c in right.columns if c != t_col and c not in by
    ]
    collide = set(value_cols) & set(left.columns)
    if collide:
        raise ValueError(
            "asof_join: value_cols collide with left columns (rename or "
            f"drop them on one side): {sorted(collide)}"
        )
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

    if not by and global_chunks > 1:
        # parallel global as-of: range-chunk on t so each chunk sorts
        # independently, then carry each chunk's latest right row
        # forward.  The carry table has exactly `global_chunks` rows,
        # so its single-partition window is O(chunks), and it joins
        # back as a broadcast — the big table is shuffled once on the
        # chunk id instead of collapsing to one task.
        tnum = F.col(t_col).cast("double")
        if global_bounds is not None:
            u = u.withColumn(
                "_lo", F.lit(float(global_bounds[0]))
            ).withColumn("_hi", F.lit(float(global_bounds[1])))
        else:
            # chunk edges stay IN the plan: a 1-row min/max aggregate
            # broadcast-joined to every row — one action total, and the
            # bounds always describe the same data snapshot the main
            # pass reads (no eager .first() frozen at construction).
            # The 1-row result is persisted because the plan references
            # it from two subtrees (chunk fill + per-chunk carry) and
            # exchange reuse does not dedupe them — without the cache
            # the bounds scan would run twice per action.
            stats = u.agg(
                F.min(tnum).alias("_lo"), F.max(tnum).alias("_hi")
            ).persist()
            u = u.crossJoin(F.broadcast(stats))
        width = (F.col("_hi") - F.col("_lo")) / F.lit(float(global_chunks))
        degenerate = (
            F.col("_lo").isNull()
            | F.col("_hi").isNull()
            | (F.col("_hi") <= F.col("_lo"))
        )
        chunk = F.when(degenerate, F.lit(0)).otherwise(
            F.least(
                F.greatest(
                    F.floor((tnum - F.col("_lo")) / width).cast("int"),
                    F.lit(0),
                ),
                F.lit(global_chunks - 1),
            )
        )
        u = u.withColumn("_chunk", chunk).drop("_lo", "_hi")
        w = (
            Window.partitionBy("_chunk")
            .orderBy(F.col(t_col).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = u.withColumn("_m", F.last("_rrow", ignorenulls=True).over(w))
        # latest right row per chunk -> prefix carry over earlier chunks
        per_chunk = (
            u.filter(F.col("_side") == 0)
            .groupBy("_chunk")
            .agg(
                F.max_by(
                    F.col("_rrow"), F.struct(F.col(t_col), F.col("_side"))
                ).alias("_last")
            )
        )
        # dense spine over ALL chunk ids: a chunk with no right rows is
        # absent from per_chunk, but its rows still need the carry from
        # earlier chunks — without the spine they'd join to NULL
        spine = (
            left.sparkSession.range(global_chunks)
            .select(F.col("id").cast("int").alias("_chunk"))
            .join(per_chunk, "_chunk", "left")
        )
        cw = (
            Window.orderBy(F.asc("_chunk"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = spine.select(
            "_chunk", F.last("_last", ignorenulls=True).over(cw).alias("_carry")
        )
        out = (
            filled.join(F.broadcast(carry), "_chunk", "left")
            .withColumn("_m", F.coalesce(F.col("_m"), F.col("_carry")))
            .filter(F.col("_side") == 1)
        )
    else:
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
    max_repl: int = 4096,
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
    cardinality keeps the shuffle balanced.

    `max_repl` caps per-interval replication: an interval spanning
    more than max_repl buckets (a corpus-spanning outlier, or a
    mis-chosen bucket_width) would explode to millions of rows and
    flatten one executor — the offending row FAILS FAST with a clear
    runtime error naming its bucket span instead of silently melting.
    The guard is an in-plan assert_true on the pre-explode row — zero
    extra jobs, zero cost when every interval is sane.  Raise the cap
    or widen bucket_width deliberately.

    Intervals with a NULL start or end are DROPPED, matching standard
    join semantics for NULL bounds (sequence(NULL, ...) yields NULL
    and explode skips it); the replication guard is null-safe and only
    fires on intervals whose span is actually known to exceed the
    cap."""
    assert bucket_width > 0, bucket_width
    by = by or []
    overlap = (set(points.columns) & set(intervals.columns)) - set(by)
    if overlap or "_bkt" in points.columns or "_bkt" in intervals.columns:
        raise ValueError(
            "range_join_bucketed: non-key column names must be disjoint "
            f"(and '_bkt' is reserved); overlapping: {sorted(overlap)}"
        )
    w = float(bucket_width)
    p = points.withColumn("_bkt", F.floor(F.col(t_col) / w).cast("long"))
    start_bkt = F.floor(F.col(start_col) / w).cast("long")
    end_bkt = F.floor(F.col(end_col) / w).cast("long")
    repl = end_bkt - start_bkt + F.lit(1)
    # null-safe: a NULL-bounded interval has repl NULL — coalesce keeps
    # the assert quiet so the row falls through to sequence(NULL)/explode
    # (dropped, standard NULL-bound join semantics) instead of aborting
    # the job; the message is null-safe too so a REAL violation renders
    guard = F.assert_true(
        F.coalesce(repl <= F.lit(int(max_repl)), F.lit(True)),
        F.concat(
            F.lit("range_join_bucketed: interval spans "),
            F.coalesce(repl.cast("string"), F.lit("NULL")),
            F.lit(
                f" buckets > max_repl={int(max_repl)} at bucket_width={w};"
                " widen bucket_width or raise max_repl deliberately"
            ),
        ),
    )
    iv = intervals.withColumn(
        "_bkt",
        F.explode(F.when(guard.isNull(), F.sequence(start_bkt, end_bkt))),
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
