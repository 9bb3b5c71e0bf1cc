"""Operator query catalog — the driver-facing inventory of implemented
operators (SURVEY.md §2), each as a (spark_fn, oracle_sql) pair.

Every entry's Spark implementation is the idiomatic DataFrame/Catalyst
form of a reference operator (citations inline); the oracle is the
equivalent ANSI SQL that DuckDB runs over the same parquet tables.
Column names are aliased identically on both sides (the driver's
compare hashes values after sorting columns by name).

Determinism discipline:
  * doubles produced by arithmetic are ROUND()ed on both sides (raw
    column passthroughs are left exact — both engines read the same
    parquet bits);
  * timestamps are cast to DATE or VARCHAR (Spark session tz is UTC,
    DuckDB is UTC-naive);
  * LIMIT queries always carry a total ORDER BY with a unique
    tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


@dataclass
class CatalogEntry:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> driver does a rows-only check


CATALOG: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        CATALOG[name] = CatalogEntry(fn=fn, oracle=oracle)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# =====================================================================
# §2.1/2.2 scans, projection, filter  (IterTable/Projection/Filter —
# plan/pir/pir.go:84-208, vm/selector.go:73, vm/filter.go:27)
# =====================================================================

@register(
    "scan_project_filter",
    """SELECT l_orderkey, l_partkey, l_quantity,
              strftime(l_shipdate, '%Y-%m-%d') AS ship_date
       FROM lineitem
       WHERE l_shipdate < TIMESTAMP '1996-03-01' AND l_quantity > 45""",
)
def scan_project_filter(spark, sf_dir):
    """Projection + predicate; Catalyst pushes both into the parquet
    scan (PushedFilters/ReadSchema), the analog of zion selective
    decompression (ion/zion/doc.go:15-29)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") < "1996-03-01") & (F.col("l_quantity") > 45))
        .select(
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
    )


@register(
    "case_when_projection",
    """SELECT o_orderkey,
              CASE WHEN o_orderstatus = 'F' THEN 'finished'
                   WHEN o_orderstatus = 'O' THEN 'open'
                   ELSE 'other' END AS status_label,
              COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio,
              CAST(o_totalprice > 200000 AS INT) AS is_big
       FROM orders""",
)
def case_when_projection(spark, sf_dir):
    """CASE/COALESCE/NULLIF (expr/node.go:2886-3115)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_label"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("URGENT!")
        ).alias("prio"),
        (F.col("o_totalprice") > 200000).cast("int").alias("is_big"),
    )


@register(
    "cast_try_cast",
    """SELECT event_id,
              TRY_CAST(regexp_extract(props, 'k": (\\d+)', 1) AS INT) AS k_int,
              TRY_CAST(event_type AS INT) AS bad_cast
       FROM events""",
)
def cast_try_cast(spark, sf_dir):
    """Cast with MISSING-on-failure -> try_cast null-on-failure
    (expr/node.go:3115-3222)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", r'k": (\d+)', 1).try_cast("int").alias("k_int"),
        F.col("event_type").try_cast("int").alias("bad_cast"),
    )


@register(
    "in_list_member",
    """SELECT o_orderpriority, COUNT(*) AS n
       FROM orders
       WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '5-LOW')
       GROUP BY o_orderpriority""",
)
def in_list_member(spark, sf_dir):
    """Member / hashed IN-list (expr/node.go:1543-1656)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "5-LOW"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# =====================================================================
# §2.4 aggregations (SimpleAggregate/HashAggregate —
# plan/plan.go:243-316,749-915; partial/final split mapreduce.go:46)
# =====================================================================

@register(
    "agg_q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              SUM(l_quantity) AS sum_qty,
              ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              ROUND(AVG(l_quantity), 4) AS avg_qty,
              ROUND(AVG(l_discount), 6) AS avg_disc,
              COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def agg_q1_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "agg_minmax_earliest_latest",
    """SELECT l_returnflag,
              MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
              strftime(MIN(l_shipdate), '%Y-%m-%d') AS earliest,
              strftime(MAX(l_shipdate), '%Y-%m-%d') AS latest,
              COUNT(DISTINCT l_suppkey) AS n_supp
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_minmax_earliest_latest(spark, sf_dir):
    """MIN/MAX incl. EARLIEST/LATEST timestamp aggregates
    (expr/node.go:105-206)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("earliest"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("latest"),
        F.count_distinct("l_suppkey").alias("n_supp"),
    )


@register(
    "agg_filter_clause",
    """SELECT l_returnflag,
              COUNT(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
              SUM(l_quantity) FILTER (WHERE l_linestatus = 'F') AS qty_f,
              COUNT(*) AS n_all
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_filter_clause(spark, sf_dir):
    """Per-aggregate FILTER (WHERE ...) (expr/node.go:404-406,
    plan/pir/aggfilter.go:20)."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """SELECT l_returnflag,
                  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
                  SUM(l_quantity) FILTER (WHERE l_linestatus = 'F') AS qty_f,
                  COUNT(*) AS n_all
           FROM lineitem GROUP BY l_returnflag"""
    )


@register(
    "bit_bool_aggs",
    """SELECT o_orderstatus,
              BIT_AND(o_orderkey) AS band, BIT_OR(o_orderkey) AS bor,
              BIT_XOR(o_orderkey) AS bxor,
              BOOL_AND(o_totalprice > 0) AS all_pos,
              BOOL_OR(o_totalprice > 400000) AS any_big
       FROM orders GROUP BY o_orderstatus""",
)
def bit_bool_aggs(spark, sf_dir):
    """BIT_AND/OR/XOR, BOOL_AND/OR (EVERY) (expr/node.go:105-206)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("band"),
        F.bit_or("o_orderkey").alias("bor"),
        F.bit_xor("o_orderkey").alias("bxor"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_pos"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_big"),
    )


@register(
    "count_distinct_exact",
    """SELECT l_linestatus,
              COUNT(DISTINCT l_orderkey) AS n_orders,
              COUNT(DISTINCT l_partkey) AS n_parts
       FROM lineitem GROUP BY l_linestatus""",
)
def count_distinct_exact(spark, sf_dir):
    """Exact COUNT(DISTINCT) — the reference rewrites it to a distinct
    subquery (plan/pir/aggdistinct.go:20); Spark plans an expand+2-phase
    aggregate natively."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.count_distinct("l_partkey").alias("n_parts"),
    )


@register("approx_count_distinct_hll", None)  # approx: rows-only check
def approx_count_distinct_hll(spark, sf_dir):
    """APPROX_COUNT_DISTINCT — HLL in the reference
    (vm/aggcountdistinct.go:15, precision 4-16), HLL++ in Spark; sketch
    internals differ so there is no exact SQL oracle."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )


@register(
    "percentile_exact",
    """SELECT l_returnflag,
              ROUND(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4) AS p50,
              ROUND(CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE), 4) AS p90
       FROM lineitem GROUP BY l_returnflag""",
)
def percentile_exact(spark, sf_dir):
    """Exact percentile (linear interpolation — matches DuckDB
    quantile_cont); the reference only has the t-digest approximation
    (vm/aggtdigest.go:26), so this is strictly stronger."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
    )


@register("approx_percentile_tdigest", None)  # approx: rows-only check
def approx_percentile_tdigest(spark, sf_dir):
    """APPROX_PERCENTILE/APPROX_MEDIAN (vm/aggtdigest.go:26-50).

    Result columns are scalars only: the driver's canonicalizer sorts
    result values through pandas factorize, which cannot hash an
    array-typed cell — so the quartile pair is unpacked via element_at
    instead of returned as array<double> (the round-1 crash)."""
    li = load(spark, sf_dir, "lineitem")
    iqr = F.percentile_approx("l_extendedprice", F.array(F.lit(0.25), F.lit(0.75)), 10000)
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median"),
        F.element_at(iqr, 1).alias("p25"),
        F.element_at(iqr, 2).alias("p75"),
    )


@register(
    "stddev_variance_pop",
    """SELECT l_returnflag,
              ROUND(var_pop(l_quantity), 6) AS var_qty,
              ROUND(stddev_pop(l_quantity), 6) AS std_qty
       FROM lineitem GROUP BY l_returnflag""",
)
def stddev_variance_pop(spark, sf_dir):
    """VARIANCE_POP / STDDEV_POP (expr/node.go:105-206)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.var_pop("l_quantity"), 6).alias("var_qty"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("std_qty"),
    )


@register(
    "grouping_rollup",
    """SELECT l_returnflag, l_linestatus,
              GROUPING(l_returnflag) AS g1, GROUPING(l_linestatus) AS g2,
              SUM(l_quantity) AS sum_qty, COUNT(*) AS n
       FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
)
def grouping_rollup(spark, sf_dir):
    """ROLLUP with GROUPING markers — capability upside: the reference
    has no grouping sets (expr/partiql/keywords.txt)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").alias("g1"),
        F.grouping("l_linestatus").alias("g2"),
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# =====================================================================
# §2.3 joins (EquiJoin->broadcast joinelim.go:23; semi subplan.go:184;
# cross sfw.go:124; decorrelation decorrelate.go:21)
# =====================================================================

@register(
    "broadcast_join_agg",
    """SELECT p.p_brand, COUNT(*) AS n, SUM(l.l_quantity) AS sum_qty
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       GROUP BY p.p_brand""",
)
def broadcast_join_agg(spark, sf_dir):
    """INNER equi-join, small side broadcast — the only join shape the
    reference supports (joinelim.go:23-120, RHS <= 10k rows)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("sum_qty"))
    )


@register(
    "join_three_way_star",
    """SELECT r.r_name, COUNT(*) AS n_customers,
              ROUND(SUM(c.c_acctbal), 2) AS sum_bal
       FROM customer c
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY r.r_name""",
)
def join_three_way_star(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


@register(
    "left_join_null_default",
    """SELECT c.c_mktsegment, COUNT(o.o_orderkey) AS n_orders, COUNT(*) AS n_rows
       FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       GROUP BY c.c_mktsegment""",
)
def left_join_null_default(spark, sf_dir):
    """LEFT JOIN — parsed but rejected by the reference planner
    (plan/pir/build.go:102-112); native capability upside here."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"), F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "semi_join_in_subquery",
    """SELECT p_partkey FROM part
       WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 48)""",
)
def semi_join_in_subquery(spark, sf_dir):
    """IN (SELECT ...) -> left_semi (plan/subplan.go:184-230)."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 48)
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select("p_partkey")


@register(
    "anti_join_not_exists",
    """SELECT p_partkey FROM part p
       WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)""",
)
def anti_join_not_exists(spark, sf_dir):
    """NOT EXISTS -> left_anti (not supported by the reference at all —
    plan/pir/build.go:110)."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49)
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select("p_partkey")


@register(
    "cross_join_unnested",
    "SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
)
def cross_join_unnested(spark, sf_dir):
    """CROSS JOIN (expr/sfw.go:124-150)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "exists_correlated",
    """SELECT c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""",
)
def exists_correlated(spark, sf_dir):
    """Correlated EXISTS — Catalyst decorrelates to a semi join, the
    reference's decorrelate.go:21-60 rewrite done for us."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """SELECT c_custkey, c_name FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)"""
    )


@register(
    "scalar_subquery_avg",
    """SELECT o_orderstatus, COUNT(*) AS n FROM orders
       WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
       GROUP BY o_orderstatus""",
)
def scalar_subquery_avg(spark, sf_dir):
    """Scalar subquery substitution (plan/tree.go:126-176
    SCALAR_REPLACEMENT)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """SELECT o_orderstatus, COUNT(*) AS n FROM orders
           WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
           GROUP BY o_orderstatus"""
    )


# =====================================================================
# §2.5 windows (hash_aggregate_window.go:23; ROW_NUMBER/RANK/DENSE_RANK)
# =====================================================================

@register(
    "window_topn_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) WHERE rn <= 3""",
)
def window_topn_per_group(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_rank_dense",
    """SELECT o_orderpriority, o_orderkey, rnk, drnk FROM (
         SELECT o_orderpriority, o_orderkey,
                RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
                DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
         FROM orders) WHERE rnk <= 5""",
)
def window_rank_dense(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    return (
        o.withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 5)
        .select("o_orderpriority", "o_orderkey", "rnk", "drnk")
    )


# =====================================================================
# §2.6 sort / limit / top-k (vm/sort.go:97 k-heap; vm/limit.go:27)
# =====================================================================

@register(
    "topk_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS odate
       FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def topk_orders(spark, sf_dir):
    """ORDER BY + LIMIT -> TakeOrderedAndProject, Spark's built-in
    top-k analog of the reference's k-heap sort (vm/sort.go:299-660)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        )
        .limit(10)
    )


@register(
    "limit_offset",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 10",
)
def limit_offset(spark, sf_dir):
    """LIMIT x OFFSET y (vm/limit.go:27-60; map-side clone
    mapreduce.go:125-160)."""
    o = load(spark, sf_dir, "orders")
    return o.orderBy("o_orderkey").select("o_orderkey", "o_totalprice").offset(10).limit(20)


# =====================================================================
# §2.7 set ops & dedup (vm/distinct.go:34; ++ append node.go:2561)
# =====================================================================

@register(
    "distinct_tuple",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_tuple(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@register(
    "distinct_on_earliest",
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS first_date FROM (
         SELECT o_custkey, o_orderkey, o_orderdate,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS rn
         FROM orders) WHERE rn = 1""",
)
def distinct_on_earliest(spark, sf_dir):
    """SELECT DISTINCT ON (expr) (expr/sfw.go:373-375) as
    row_number()=1."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_date"),
        )
    )


@register(
    "union_all_append",
    """SELECT n_name AS name, 'nation' AS src FROM nation
       UNION ALL SELECT r_name, 'region' FROM region""",
)
def union_all_append(spark, sf_dir):
    """`++` table append (expr/node.go:2561-2600) ->
    unionByName."""
    n = load(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"), F.lit("nation").alias("src")
    )
    r = load(spark, sf_dir, "region").select(
        F.col("r_name").alias("name"), F.lit("region").alias("src")
    )
    return n.unionByName(r)


@register(
    "intersect_nationkeys",
    """SELECT c_nationkey AS nationkey FROM customer
       INTERSECT SELECT s_nationkey FROM supplier""",
)
def intersect_nationkeys(spark, sf_dir):
    """INTERSECT — absent from the reference grammar; native here."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "except_nationkeys",
    """SELECT n_nationkey AS nationkey FROM nation
       EXCEPT SELECT c_nationkey FROM customer WHERE c_acctbal > 9990""",
)
def except_nationkeys(spark, sf_dir):
    n = load(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9990)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    return n.subtract(c)


# =====================================================================
# unnest / explode / unpivot (vm/unnest.go:27, vm/unpivot.go:40)
# =====================================================================

@register(
    "explode_words_topk",
    """SELECT word, COUNT(*) AS n FROM (
         SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       GROUP BY word ORDER BY n DESC, word LIMIT 20""",
)
def explode_words_topk(spark, sf_dir):
    """FROM t, t.arr AS x unnesting cross join (vm/unnest.go:27-70) ->
    explode."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@register(
    "posexplode_embedding_head",
    """SELECT e.vec_id, g.i - 1 AS pos,
              ROUND(CAST(e.embedding[g.i] AS DOUBLE), 4) + 0 AS val
       FROM embeddings e, generate_series(1, 3) g(i)""",
)
def posexplode_embedding_head(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    # slice BEFORE exploding: emit 3 rows per vector, not 64-then-filter;
    # + 0.0 normalizes IEEE -0.0 (DuckDB keeps the sign bit, the
    # canonicalizer stringifies '-0.0' != '0.0')
    return e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 3)).alias("pos", "v")
    ).select(
        "vec_id",
        "pos",
        (F.round(F.col("v").cast("double"), 4) + F.lit(0.0)).alias("val"),
    )


@register(
    "unpivot_part_metrics",
    """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
       UNION ALL
       SELECT p_partkey, 'retailprice', p_retailprice FROM part""",
)
def unpivot_part_metrics(spark, sf_dir):
    """UNPIVOT (expr/node.go:3697-3777) via stack()."""
    p = load(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice) AS (metric, value)",
    )


# =====================================================================
# §2.8 scalar builtins: strings / dates / math
# =====================================================================

@register(
    "string_functions",
    """SELECT c_custkey,
              UPPER(c_name) AS uname, LOWER(c_mktsegment) AS lseg,
              SUBSTR(c_name, 1, 8) AS prefix,
              LENGTH(c_name) AS name_len,
              SPLIT_PART(c_name, '#', 2) AS cust_num,
              CONCAT(c_mktsegment, ':', c_name) AS tagged,
              REPLACE(c_name, 'Customer', 'Cust') AS shortname,
              TRIM('  pad  ') AS trimmed
       FROM customer""",
)
def string_functions(spark, sf_dir):
    """CONCAT/TRIM/UPPER/LOWER/SUBSTRING/SPLIT_PART/CHAR_LENGTH
    (expr/builtin.go:1083-1094)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").alias("name_len"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_num"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("shortname"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
    )


@register(
    "like_contains_ci",
    """SELECT lang, COUNT(*) AS n FROM documents
       WHERE text LIKE '%spark%' AND text LIKE '%query%'
       GROUP BY lang""",
)
def like_contains_ci(spark, sf_dir):
    """LIKE / CONTAINS (expr/node.go:1789-1888,
    expr/builtin.go:1086)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(F.col("text").like("%spark%") & F.col("text").contains("query"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "regexp_similar_to",
    """SELECT source, COUNT(*) AS n FROM documents
       WHERE regexp_matches(text, 'join\\s+\\w*\\s*merge|scan\\s+sort')
       GROUP BY source""",
)
def regexp_similar_to(spark, sf_dir):
    """SIMILAR TO / ~ regex matching (regexp2/Regexp2.go:14-60)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(F.col("text").rlike(r"join\s+\w*\s*merge|scan\s+sort"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "fuzzy_levenshtein",
    """SELECT n_name, levenshtein(n_name, 'UNITED STATES') AS dist
       FROM nation""",
)
def fuzzy_levenshtein(spark, sf_dir):
    """EQUALS_FUZZY approximate matching
    (fuzzy/edit_distance_approx.go) via exact levenshtein."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_name", F.levenshtein(F.col("n_name"), F.lit("UNITED STATES")).alias("dist")
    )


@register(
    "date_trunc_day_agg",
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
              COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
       FROM events GROUP BY 1""",
)
def date_trunc_day_agg(spark, sf_dir):
    """DATE_TRUNC (expr/builtin.go:1138-1181)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


@register(
    "date_extract_parts",
    """SELECT YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m, COUNT(*) AS n
       FROM orders GROUP BY 1, 2""",
)
def date_extract_parts(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "date_add_diff",
    """SELECT o_orderkey,
              strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
              datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
       FROM orders WHERE o_orderkey <= 2000""",
)
def date_add_diff(spark, sf_dir):
    """DATE_ADD / DATE_DIFF (expr/builtin.go:1138-1150)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.date_format(F.expr("o_orderdate + INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
    )


@register(
    "time_bucket_epoch",
    """SELECT CAST(FLOOR(FLOOR(epoch(ts)) / 21600) AS BIGINT) AS bucket,
              COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
       FROM events GROUP BY 1""",
)
def time_bucket_epoch(spark, sf_dir):
    """TIME_BUCKET / TO_UNIX_EPOCH (expr/builtin.go:1155-1170)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 21600).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


@register(
    "tumbling_window_6h",
    """SELECT CAST(time_bucket(INTERVAL '6 hours', ts) AS VARCHAR) AS win_start,
              event_type, COUNT(*) AS n
       FROM events GROUP BY 1, 2""",
)
def tumbling_window_6h(spark, sf_dir):
    """Tumbling event-time window — Spark window() (streaming-capable;
    the reference has no stream windows at all, SURVEY.md §2.9)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("string").alias("win_start"), "event_type", "n"
        )
    )


@register(
    "math_functions",
    """SELECT l_orderkey, l_linenumber,
              ABS(l_extendedprice - 30000) AS dev,
              CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
              CAST(CEIL(l_extendedprice) AS BIGINT) AS ce,
              ROUND(SQRT(l_extendedprice), 6) AS sq,
              ROUND(LN(l_extendedprice), 6) AS lg,
              ROUND(POW(l_discount + 1, 3), 6) AS pw,
              CAST(SIGN(l_extendedprice - 30000) AS DOUBLE) AS sg
       FROM lineitem WHERE l_orderkey <= 400""",
)
def math_functions(spark, sf_dir):
    """ABS/SIGN/ROUND/FLOOR/CEIL/SQRT/LN/POW (expr/builtin.go:1101-1136)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000).alias("dev"),
        F.floor("l_extendedprice").alias("fl"),
        F.ceil("l_extendedprice").alias("ce"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sq"),
        F.round(F.log("l_extendedprice"), 6).alias("lg"),
        F.round(F.pow(F.col("l_discount") + 1, 3), 6).alias("pw"),
        F.signum(F.col("l_extendedprice") - 30000).cast("double").alias("sg"),
    )


@register(
    "math_functions_2",
    """SELECT l_orderkey, l_linenumber,
              CAST(bit_count(l_orderkey) AS INT) AS bits,
              ROUND(round_even(l_extendedprice, 0), 1) AS rev,
              CAST(trunc(l_extendedprice) AS DOUBLE) AS tr,
              ROUND(cbrt(l_extendedprice), 6) AS cb,
              ROUND(exp(l_discount) - 1, 6) AS em1,
              ROUND(ln(1 + l_discount), 6) AS l1p,
              ROUND(SQRT(l_tax * l_tax + l_discount * l_discount), 6) AS hyp,
              ROUND(atan2(l_tax, l_discount + 1), 6) AS at2,
              ROUND(degrees(l_discount), 6) AS deg,
              ROUND(radians(l_extendedprice / 1000), 6) AS rad,
              CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT) AS pm
       FROM lineitem WHERE l_orderkey <= 400""",
)
def math_functions_2(spark, sf_dir):
    """The rest of the math family (expr/builtin.go:1101-1136):
    BIT_COUNT, ROUND_EVEN (bankers), TRUNC, CBRT, EXPM1, LN1P, HYPOT,
    ATAN2, DEGREES, RADIANS, PMOD."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    price, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.bit_count("l_orderkey").alias("bits"),
        F.round(F.bround(price, 0), 1).alias("rev"),
        # numeric TRUNC: toward-zero — bigint cast (Spark's 1-arg trunc
        # is date-only); equals DuckDB trunc() on these positive prices
        price.cast("bigint").cast("double").alias("tr"),
        F.round(F.cbrt(price), 6).alias("cb"),
        F.round(F.expm1(disc), 6).alias("em1"),
        F.round(F.log1p(disc), 6).alias("l1p"),
        F.round(F.hypot(tax, disc), 6).alias("hyp"),
        F.round(F.atan2(tax, disc + 1), 6).alias("at2"),
        F.round(F.degrees(disc), 6).alias("deg"),
        F.round(F.radians(price / 1000), 6).alias("rad"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("pm"),
    )


@register(
    "histogram_width_bucket",
    """SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket, COUNT(*) AS n
       FROM orders GROUP BY 1""",
)
def histogram_width_bucket(spark, sf_dir):
    """WIDTH_BUCKET-style histogram (expr/builtin.go:1133)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
