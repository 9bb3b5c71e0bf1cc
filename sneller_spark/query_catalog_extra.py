"""Second wave of catalog entries: heavier join/aggregate shapes
(TPC-H-style), sessionization, pivot, array/struct builtins, and the
SNELLER_DATASHAPE schema-profiling analog."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .query_catalog import load, register

# =====================================================================
# heavier join/aggregate shapes
# =====================================================================

@register(
    "q3_shipping_priority",
    """SELECT l.l_orderkey,
              ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
              strftime(o.o_orderdate, '%Y-%m-%d') AS odate
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < TIMESTAMP '1996-01-01'
         AND l.l_shipdate > TIMESTAMP '1996-01-01'
       GROUP BY l.l_orderkey, o.o_orderdate
       ORDER BY revenue DESC, l_orderkey LIMIT 10""",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective filters on both join sides, aggregate,
    top-k — exercises filter pushdown + broadcast + TakeOrdered."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-01-01")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-01-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "pivot_status_by_flag",
    """SELECT l_returnflag,
              CAST(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS O,
              CAST(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS F
       FROM lineitem GROUP BY l_returnflag""",
)
def pivot_status_by_flag(spark, sf_dir):
    """PIVOT — not in the reference grammar; native Spark upside."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
    )


@register(
    "sessionization_gaps",
    """WITH gaps AS (
         SELECT user_id, ts, event_id,
                CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                          OR LAG(ts) OVER w IS NULL
                     THEN 1 ELSE 0 END AS new_sess
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ), sess AS (
         SELECT user_id,
                SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
         FROM gaps
       )
       SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events
       FROM sess GROUP BY user_id, session_id""",
)
def sessionization_gaps(spark, sf_dir):
    """Sessionization: 30-min-gap sessions via lag + running sum —
    the lakehouse-standard composition (no native operator needed).
    Gaps compare FRACTIONAL epoch seconds (ts cast to double), matching
    DuckDB's epoch(); unix_timestamp() truncates to whole seconds and
    flips sessions whose gap falls in (1800, 1801)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ: hop through timestamp (session tz is UTC) to
    # get fractional epoch seconds; gap DIFFERENCES are tz-invariant
    epoch = F.col("ts").cast("timestamp").cast("double")
    prev_epoch = F.lag(epoch).over(w)
    gaps = ev.withColumn(
        "new_sess",
        F.when((epoch - prev_epoch > 1800) | prev_epoch.isNull(), 1).otherwise(0),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "hash_lookup_inline",
    """SELECT event_type,
              CASE event_type WHEN 'click' THEN 10 WHEN 'view' THEN 1
                              WHEN 'purchase' THEN 100 ELSE -1 END AS weight,
              COUNT(*) AS n
       FROM events GROUP BY event_type""",
)
def hash_lookup_inline(spark, sf_dir):
    """HASH_LOOKUP constant map with else-default
    (expr/node.go:1656-1743) -> element_at(create_map(...))."""
    ev = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("click"), F.lit(10), F.lit("view"), F.lit(1), F.lit("purchase"), F.lit(100)
    )
    return ev.groupBy(
        "event_type",
        F.coalesce(F.element_at(m, F.col("event_type")), F.lit(-1)).alias("weight"),
    ).agg(F.count(F.lit(1)).alias("n"))


# =====================================================================
# array / struct builtins (expr/builtin.go:1190-1216)
# =====================================================================

@register(
    "array_functions",
    """SELECT doc_id,
              len(string_split(text, ' ')) AS n_words,
              list_contains(string_split(text, ' '), 'spark') AS has_spark,
              COALESCE(list_position(string_split(text, ' '), 'spark'), 0) AS pos_spark,
              len(string_split(text, ' ')[1:5]) AS head_len
       FROM documents WHERE doc_id < 200""",
)
def array_functions(spark, sf_dir):
    """SIZE/ARRAY_CONTAINS/ARRAY_POSITION + slice (MAKE_LIST family)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_position(words, "spark").cast("bigint").alias("pos_spark"),
        F.size(F.slice(words, 1, 5)).alias("head_len"),
    )


@register(
    "struct_make_and_access",
    """SELECT o_orderkey,
              struct_extract(struct_pack(k := o_orderkey, p := o_totalprice), 'p') AS price_out,
              struct_extract(struct_pack(k := o_orderkey, p := o_totalprice), 'k') AS key_out
       FROM orders WHERE o_orderkey <= 1000""",
)
def struct_make_and_access(spark, sf_dir):
    """MAKE_STRUCT + path deref round trip (expr/builtin.go:1210,
    expr/node.go:1206-1349)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    s = F.struct(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p"))
    return o.select(
        "o_orderkey",
        s.getField("p").alias("price_out"),
        s.getField("k").alias("key_out"),
    )


@register(
    "array_sum_fold",
    """SELECT vec_id,
              ROUND(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x)), 4) + 0 AS vec_sum,
              ROUND(list_max(CAST(embedding AS DOUBLE[])), 4) + 0 AS vec_max
       FROM embeddings WHERE vec_id < 100""",
)
def array_sum_fold(spark, sf_dir):
    """ARRAY_SUM via fold (expr/builtin.go:1194)."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id",
        (
            F.round(
                F.aggregate(
                    F.transform("embedding", lambda x: x.cast("double")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                4,
            )
            + F.lit(0.0)  # normalize IEEE -0.0 for the value-hash compare
        ).alias("vec_sum"),
        (
            F.round(F.array_max(F.transform("embedding", lambda x: x.cast("double"))), 4)
            + F.lit(0.0)
        ).alias("vec_max"),
    )


@register(
    "octet_char_length",
    """SELECT c_custkey,
              strlen(c_name) AS olen,
              length(c_name) AS clen
       FROM customer""",
)
def octet_char_length(spark, sf_dir):
    """OCTET_LENGTH / CHAR_LENGTH (expr/builtin.go:1090-1091)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.octet_length("c_name").alias("olen"),
        F.char_length("c_name").alias("clen"),
    )


# =====================================================================
# SNELLER_DATASHAPE analog (vm/sysdatashape.go:24-80)
# =====================================================================

@register(
    "datashape_profile",
    """WITH stats AS (
         SELECT 'event_id' AS field, 'bigint' AS type, COUNT(*) AS n,
                CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null FROM events
         UNION ALL SELECT 'ts', 'timestamp_ntz', COUNT(*),
                CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events
         UNION ALL SELECT 'user_id', 'bigint', COUNT(*),
                CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events
         UNION ALL SELECT 'event_type', 'string', COUNT(*),
                CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events
         UNION ALL SELECT 'value', 'double', COUNT(*),
                CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events
         UNION ALL SELECT 'props', 'string', COUNT(*),
                CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events)
       SELECT field, type, n, n_null FROM stats""",
)
def datashape_profile(spark, sf_dir):
    """Schema-profiling aggregate: per-field (type, null/missing)
    histogram — the reference's SNELLER_DATASHAPE
    (vm/sysdatashape.go:24-80).  The oracle maps DuckDB's engine type
    names onto Spark typeof() names explicitly (bigint/timestamp_ntz/
    string/double), making the profile value-checked, not rows-only."""
    ev = load(spark, sf_dir, "events")
    fields = []
    for c in ev.columns:
        fields.append(
            F.struct(
                F.lit(c).alias("field"),
                F.expr(f"typeof({c})").alias("type"),
                F.col(c).isNull().cast("int").alias("is_null"),
            )
        )
    exploded = ev.select(F.explode(F.array(*fields)).alias("f"))
    return exploded.groupBy("f.field", "f.type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("f.is_null").alias("n_null")
    )


# =====================================================================
# inventory gap-fill (SURVEY.md §2 line items)
# =====================================================================

@register(
    "count_star_metadata",
    "SELECT COUNT(*) AS n FROM lineitem",
)
def count_star_metadata(spark, sf_dir):
    """CountStar — the reference answers COUNT(*) from index metadata
    (plan/plan.go:649-672); Spark answers it from parquet row-group
    stats without reading data columns (LocalLimit over statistics)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n"))


@register(
    "select_star_passthrough",
    """SELECT doc_id, lang, source, n_chars, text
       FROM documents WHERE doc_id < 50""",
)
def select_star_passthrough(spark, sf_dir):
    """Star passthrough of the whole record (expr/node.go:1350-1373)."""
    return load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id", "lang", "source", "n_chars", "text"
    )


@register(
    "is_null_true_false",
    """SELECT
         CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null,
         CAST(SUM(CASE WHEN (k > 50) IS TRUE THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         CAST(SUM(CASE WHEN (k > 50) IS FALSE THEN 1 ELSE 0 END) AS BIGINT) AS n_false
       FROM (SELECT NULLIF(TRY_CAST(regexp_extract(props, 'k": (\\d+)', 1) AS INT) % 97, 0) AS k
             FROM events)""",
)
def is_null_true_false(spark, sf_dir):
    """IsKey: IS NULL / IS NOT NULL / IS TRUE / IS FALSE
    (expr/node.go:2678-2886) over a column with real nulls."""
    ev = load(spark, sf_dir, "events")
    k = F.nullif(
        F.regexp_extract("props", r'k": (\d+)', 1).try_cast("int") % 97, F.lit(0)
    )
    kdf = ev.select(k.alias("k"))
    pred = F.col("k") > 50
    return kdf.agg(
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0)).alias("n_not_null"),
        F.sum(F.when(pred.eqNullSafe(F.lit(True)), 1).otherwise(0)).alias("n_true"),
        F.sum(F.when(pred.eqNullSafe(F.lit(False)), 1).otherwise(0)).alias("n_false"),
    )


@register(
    "ilike_case_insensitive",
    """SELECT lang, COUNT(*) AS n FROM documents
       WHERE text ILIKE '%THE FAST%' GROUP BY lang""",
)
def ilike_case_insensitive(spark, sf_dir):
    """ILIKE / CONTAINS_CI (expr/node.go:1789-1888)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(F.col("text").ilike("%THE FAST%"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "window_rolling_frames",
    """SELECT o_orderkey,
              ROUND(SUM(o_totalprice) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS roll_sum_4,
              ROUND(AVG(o_totalprice) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_avg,
              CAST(COUNT(*) OVER (
                  ORDER BY o_totalprice
                  RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_price_n
       FROM orders WHERE o_orderkey <= 2000""",
)
def window_rolling_frames(spark, sf_dir):
    """Explicit window FRAMES beyond the running-sum shape: a bounded
    ROWS frame (rolling 4-row sum), an unbounded ROWS frame (running
    avg), and a numeric RANGE frame (peers within a 1000-wide price
    band) — frame semantics the reference's window implementation
    lacks entirely (capability upside).

    Scale note: the RANGE frame here is deliberately UNPARTITIONED to
    exercise the semantics, which serializes onto one task — hence the
    hard o_orderkey bound.  At 100 TB a global order-based frame must
    be range-partitioned first (or re-expressed as a join against
    bucketed quantiles); the keyed frames above shuffle once on
    o_custkey and scale normally."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    wk = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = W.orderBy(F.col("o_totalprice")).rangeBetween(-1000, 0)
    return o.select(
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(wk.rowsBetween(-3, 0)), 4).alias("roll_sum_4"),
        F.round(
            F.avg("o_totalprice").over(wk.rowsBetween(W.unboundedPreceding, 0)), 4
        ).alias("run_avg"),
        F.count(F.lit(1)).over(wr).alias("near_price_n"),
    )


@register(
    "geo_tile_functions",
    """SELECT event_id,
              CAST(FLOOR((lon + 180.0) / 360.0 * 256) AS BIGINT) AS tile_x,
              CAST(FLOOR((1.0 - LN(TAN(lat * PI() / 180.0)
                                   + 1.0 / COS(lat * PI() / 180.0)) / PI()) / 2.0 * 256)
                   AS BIGINT) AS tile_y,
              '8/' || CAST(FLOOR((lon + 180.0) / 360.0 * 256) AS BIGINT)
                   || '/' ||
                   CAST(FLOOR((1.0 - LN(TAN(lat * PI() / 180.0)
                                        + 1.0 / COS(lat * PI() / 180.0)) / PI()) / 2.0 * 256)
                        AS BIGINT) AS tile_key,
              ROUND(2 * 6371000.0 * ASIN(SQRT(
                  SIN((0 - lat) * PI() / 180.0 / 2) * SIN((0 - lat) * PI() / 180.0 / 2)
                + COS(lat * PI() / 180.0) * COS(0)
                  * SIN((0 - lon) * PI() / 180.0 / 2) * SIN((0 - lon) * PI() / 180.0 / 2)
              )) / 1000, 3) AS dist_km
       FROM (SELECT event_id,
                    (event_id % 16000) / 100.0 - 80.0 AS lat,
                    ((event_id * 7) % 36000) / 100.0 - 180.0 AS lon
             FROM events WHERE event_id < 2000)""",
)
def geo_tile_functions(spark, sf_dir):
    """GEO_TILE_X/Y/ES + GEO_DISTANCE (expr/builtin.go:1183-1188) over
    deterministic synthetic coordinates derived from event_id (the
    testdata carries no geo columns; both engines derive identically)."""
    from .functions import geo_distance_m, geo_tile_es, geo_tile_x, geo_tile_y

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    lat = (F.col("event_id") % 16000) / 100.0 - 80.0
    lon = ((F.col("event_id") * 7) % 36000) / 100.0 - 180.0
    return ev.select(
        "event_id",
        geo_tile_x(lon, 8).alias("tile_x"),
        geo_tile_y(lat, 8).alias("tile_y"),
        geo_tile_es(lat, lon, 8).alias("tile_key"),
        F.round(geo_distance_m(lat, lon, F.lit(0.0), F.lit(0.0)) / 1000, 3).alias(
            "dist_km"
        ),
    )


@register("geo_hash_buckets", None)  # base32 geohash: pytest-verified vs python ref
def geo_hash_buckets(spark, sf_dir):
    """GEO_HASH (expr/builtin.go:1183) bucketing: geohash-5 prefix
    histogram over the same synthetic coordinates.  No SQL oracle
    (DuckDB has no geohash); tests/test_functions.py checks the kernel
    against an independent python implementation."""
    from .functions import geo_hash

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    lat = (F.col("event_id") % 16000) / 100.0 - 80.0
    lon = ((F.col("event_id") * 7) % 36000) / 100.0 - 180.0
    return (
        ev.select(geo_hash(lat, lon, 5).alias("gh"))
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "contains_fuzzy_parts",
    """SELECT p_partkey,
              CAST(len(list_filter(
                flatten(list_transform(range(1, greatest(len(p_name), 1) + 1), i ->
                  list_transform([7, 8, 9], w ->
                    levenshtein(substr(p_name, i, w), 'choclate')))),
                d -> d <= 1)) > 0 AS INT) AS fuzzy_hit
       FROM part WHERE p_partkey <= 400""",
)
def contains_fuzzy_parts(spark, sf_dir):
    """CONTAINS_FUZZY (expr/builtin.go:1088,
    fuzzy/edit_distance_approx.go:325): substring within edit distance
    1 of a misspelled needle.  Oracle enumerates the same (start,
    window) set through DuckDB levenshtein."""
    from .functions import contains_fuzzy

    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 400)
    return p.select(
        "p_partkey",
        contains_fuzzy(F.col("p_name"), "choclate", 1).cast("int").alias("fuzzy_hit"),
    )


@register(
    "unpivot_dynamic_json",
    """SELECT key, COUNT(*) AS n,
              CAST(SUM(TRY_CAST(json_extract_string(props, key) AS INT)) AS BIGINT) AS sum_val
       FROM (SELECT props, unnest(json_keys(props)) AS key FROM events)
       GROUP BY key""",
)
def unpivot_dynamic_json(spark, sf_dir):
    """UnpivotAtDistinct over dynamic structs (vm/unpivot.go:40-536):
    explode each record's *fields* into (key, value) rows without a
    fixed schema — from_json to a map + explode(map_entries)."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        ev.select(F.explode(F.map_entries(m)).alias("kv"))
        .groupBy(F.col("kv.key").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("kv.value").alias("sum_val"),
        )
    )


@register(
    "ip_subnet_filter",
    """SELECT COUNT(*) AS n_in_subnet FROM (
         SELECT '10.' || CAST(user_id % 4 AS VARCHAR) || '.' ||
                CAST(event_id % 256 AS VARCHAR) || '.1' AS ip
         FROM events)
       WHERE CAST(string_split(ip, '.')[1] AS BIGINT) = 10
         AND CAST(string_split(ip, '.')[2] AS BIGINT) = 1""",
)
def ip_subnet_filter(spark, sf_dir):
    """IS_SUBNET_OF (expr/builtin.go:1092) — CIDR membership as pure
    bit math on IPv4 strings (functions/scalar.py); the oracle checks
    the same membership via octet comparison."""
    from .functions import is_subnet_of

    ev = load(spark, sf_dir, "events")
    ip = F.concat_ws(
        ".",
        F.lit("10"),
        (F.col("user_id") % 4).cast("string"),
        (F.col("event_id") % 256).cast("string"),
        F.lit("1"),
    )
    ips = ev.select(ip.alias("ip"))
    return ips.filter(is_subnet_of("10.1.0.0/16", F.col("ip"))).agg(
        F.count(F.lit(1)).alias("n_in_subnet")
    )


# =====================================================================
# third wave: string/date builtin breadth + fused window-over-aggregate
# =====================================================================

@register(
    "string_functions_2",
    """SELECT c_custkey,
              lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
              reverse(c_mktsegment) AS rseg,
              regexp_replace(c_name, '\\d', '#', 'g') AS masked,
              trim(c_mktsegment, 'AY') AS trimmed_set,
              left(c_name, 4) AS l4, right(c_name, 4) AS r4,
              repeat('-', 3) AS dashes,
              position('#' in c_name) AS hash_pos
       FROM customer""",
)
def string_functions_2(spark, sf_dir):
    """LPAD/REVERSE/regex replace/TRIM-with-charset/LEFT/RIGHT/REPEAT/
    POSITION (expr/builtin.go:1083-1094 charset trim variants)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("rseg"),
        F.regexp_replace("c_name", r"\d", "#").alias("masked"),
        F.expr("trim(BOTH 'AY' FROM c_mktsegment)").alias("trimmed_set"),
        F.substring("c_name", 1, 4).alias("l4"),
        F.expr("right(c_name, 4)").alias("r4"),
        F.repeat(F.lit("-"), 3).alias("dashes"),
        F.instr("c_name", "#").alias("hash_pos"),
    )


@register(
    "greatest_least_dates",
    """SELECT o_orderkey,
              greatest(o_totalprice, 100000.0) AS hi,
              least(o_totalprice, 100000.0) AS lo,
              quarter(o_orderdate) AS q,
              dayofmonth(o_orderdate) AS dom
       FROM orders WHERE o_orderkey <= 2000""",
)
def greatest_least_dates(spark, sf_dir):
    """LEAST/GREATEST (expr/builtin.go:1130) + EXTRACT quarter/day."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("hi"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("lo"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofmonth("o_orderdate").alias("dom"),
    )


@register(
    "width_bucket_histogram",
    """SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                        WHEN o_totalprice >= 500000 THEN 11
                        ELSE FLOOR(o_totalprice / 50000) + 1 END AS BIGINT) AS bucket,
              COUNT(*) AS n
       FROM orders GROUP BY 1""",
)
def width_bucket_histogram(spark, sf_dir):
    """WIDTH_BUCKET(x, 0, 500000, 10) (expr/builtin.go:1133) — Spark
    has it natively; the oracle spells out the same bucketing."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(500000.0), F.lit(10))
        .alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "window_over_aggregate",
    """SELECT l_returnflag, l_linestatus, sum_qty, rnk FROM (
         SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
                RANK() OVER (PARTITION BY l_returnflag ORDER BY SUM(l_quantity) DESC) AS rnk
         FROM lineitem GROUP BY l_returnflag, l_linestatus)""",
)
def window_over_aggregate(spark, sf_dir):
    """Window functions evaluated over hash-aggregate GROUP rows — the
    only window placement the reference supports
    (vm/hash_aggregate_window.go:23-154, plan/lower.go:113 splitWindows)."""
    from pyspark.sql import Window as W2

    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty")
    )
    w = W2.partitionBy("l_returnflag").orderBy(F.desc("sum_qty"))
    return agg.withColumn("rnk", F.rank().over(w))


@register(
    "grouping_cube",
    """SELECT l_returnflag, l_linestatus,
              GROUPING(l_returnflag) AS g1, GROUPING(l_linestatus) AS g2,
              COUNT(*) AS n
       FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
)
def grouping_cube(spark, sf_dir):
    """CUBE grouping sets (reference has none)."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").alias("g1"),
        F.grouping("l_linestatus").alias("g2"),
        F.count(F.lit(1)).alias("n"),
    )


# =====================================================================
# SQL veneer (sql_registry.py) exercised end-to-end as SQL text — the
# reference's SQL-first surface (expr/partiql/partiql.y) over the same
# operators the DataFrame catalog verifies
# =====================================================================

@register(
    "sql_veneer_bucket_subnet_agg",
    """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
              COUNT(*) FILTER (WHERE user_id % 4 = 1) AS n_in_subnet,
              COUNT(*) AS n
       FROM events GROUP BY 1""",
)
def sql_veneer_bucket_subnet_agg(spark, sf_dir):
    """The SQL veneer end-to-end: TIME_BUCKET + IS_SUBNET_OF called as
    registered SQL UDFs (sql_registry.py) in a plain SQL-text query —
    the reference's PartiQL-style spelling.  The functions inline into
    Catalyst (no Python boundary; plan-asserted in
    tests/test_sql_veneer.py).  Membership in 10.1.0.0/16 for the
    synthesized ips is exactly user_id % 4 == 1, which is how the
    oracle cross-checks the bit math."""
    from .sql_registry import register_sql_functions

    register_sql_functions(spark)
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT CAST(CAST(time_bucket(ts, 86400) AS DATE) AS STRING) AS day,
               COUNT(*) FILTER (WHERE is_subnet_of('10.1.0.0/16', ip)) AS n_in_subnet,
               COUNT(*) AS n
        FROM (
          SELECT ts,
                 concat_ws('.', '10', CAST(user_id % 4 AS STRING),
                           CAST(event_id % 256 AS STRING), '1') AS ip
          FROM events)
        GROUP BY 1
        """
    )


@register(
    "sql_veneer_split_label_counts",
    """SELECT CASE WHEN b < 8000 THEN 'train'
                   WHEN b < 9000 THEN 'val'
                   ELSE 'test' END AS split,
              COUNT(*) AS n
       FROM (
         SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                % 10000 AS b
         FROM documents)
       GROUP BY 1""",
)
def sql_veneer_split_label_counts(spark, sf_dir):
    """SPLIT_LABEL as a SQL UDF (sql_registry.py): the 80/10/10
    train/val/test assignment in one scalar call, value-checked
    against DuckDB reproducing the md5-bucket arithmetic."""
    from .sql_registry import register_sql_functions

    register_sql_functions(spark)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT split_label(CAST(doc_id AS STRING), '', 0.8d, 0.1d) AS split,
               COUNT(*) AS n
        FROM documents GROUP BY 1
        """
    )


@register(
    "partiql_surface_pricing",
    """SELECT l_returnflag AS flag, l_linestatus AS status,
              COUNT(*) AS n,
              ROUND(SUM(l_quantity), 4) AS sum_qty,
              MIN(l_shipdate) AS first_ship
       FROM lineitem
       WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
       GROUP BY 1, 2 ORDER BY 1, 2""",
)
def partiql_surface_pricing(spark, sf_dir):
    """The public Sneller-dialect surface (sneller_spark.partiql;
    reference grammar expr/partiql/partiql.y), value-checked end-to-end:
    reference-spelled text — double-quoted identifiers, an ion
    backtick timestamp literal — translated and executed by
    partiql.sql(), compared against DuckDB running the ANSI spelling.
    ansi="keep": the entry leaves session conf untouched (the query has
    no error-producing expressions, so both modes agree)."""
    from . import partiql

    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return partiql.sql(
        spark,
        """SELECT "l_returnflag" AS flag, "l_linestatus" AS status,
                  COUNT(*) AS n,
                  ROUND(SUM(l_quantity), 4) AS sum_qty,
                  MIN(l_shipdate) AS first_ship
           FROM lineitem
           WHERE l_shipdate < `1996-01-01T00:00:00Z`
           GROUP BY "l_returnflag", "l_linestatus"
           ORDER BY flag, status""",
        ansi="keep",
    )
