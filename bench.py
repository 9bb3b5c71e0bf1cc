"""Benchmark harness.

Measures (1) the flagship parse -> enrich -> route -> aggregate
pipeline over a deterministically generated tokenized-sequence table,
and (2) the headline operator queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "derived": {...}}

Env:
  SPARK_GRAFT_SF_DIR   parquet dir for catalog queries (default sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  SNELLER_BENCH_ROWS   pipeline input rows (default 1,000,000)

Flags:
  --pipeline-only      skip catalog queries (used by the N-vs-4N
                       scaling harness, tools/bench_scaling.py)
  --rows N             override SNELLER_BENCH_ROWS
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sneller_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 500k default keeps a cold driver-run (generation + warmup + suite)
# under ~3 minutes on this box; the scaling harness overrides to 4M
BENCH_ROWS = int(os.environ.get("SNELLER_BENCH_ROWS", "500000"))
BENCH_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_data")

HEADLINE_QUERIES = [
    "agg_q1_pricing_summary",
    "broadcast_join_agg",
    "join_three_way_star",
    "window_topn_per_group",
    "topk_orders",
    "count_distinct_exact",
    "explode_words_topk",
    "scan_project_filter",
    "docs_pipeline_route_agg",
    "ann_cosine_topk_brute",
    "ann_cosine_topk_ivf_pruned",
    "embedding_cosine_near_dup_blocked",
    "minhash_lsh_candidates",
    "time_bucket_epoch",
    # round-4 operator tier: tracked so regressions in the new ops are
    # as visible round-over-round as the original fourteen
    "asof_join_latest_value",
    "range_join_first_day_counts",
    "hypertable_rollup_day_from_hour",
    "curation_paragraph_dedup",
    "sketch_heavy_hitters_exact",
    # round 6: the request->Spark->Elastic-envelope round-trip (one
    # two-phase bucket agg + driver-side assembly)
    "elastic_search_json_envelope",
]


def calibration_probe() -> float:
    """Seconds for a FIXED single-thread CPU workload (sha256 over
    64 MiB of constant bytes, no allocation in the loop).  The workload
    never changes, so probe-time variance across a bench run measures
    the box, not the code: on an idle machine successive probes agree
    within a few percent; a co-tenant burst inflates them.  BENCH_r05
    recorded a 65%% across-the-board phantom regression that took a
    manual re-run to rule environmental — the probe makes that
    adjudication part of the official artifact."""
    import hashlib

    block = b"\xa5" * (1 << 20)
    t0 = time.monotonic()
    h = hashlib.sha256()
    for _ in range(64):
        h.update(block)
    assert h.digest()  # keep the loop un-elidable
    return time.monotonic() - t0


def contention_report(probes: list[float], load1: list[float]) -> dict:
    """Honesty fields: probe spread + load averages.  contention_index
    is worst/best probe time — ~1.0 on a quiet box; >1.3 means timed
    sections overlapped a busy window and round-over-round comparisons
    of THIS artifact need re-run confirmation."""
    best, worst = min(probes), max(probes)
    return {
        "calib_sec_best": round(best, 4),
        "calib_sec_worst": round(worst, 4),
        "contention_index": round(worst / best, 3),
        "load1_samples": [round(x, 2) for x in load1],
        "os_cpus": os.cpu_count(),
    }


def ensure_input(spark, n_rows: int) -> str:
    """Materialize the pipeline input once (generation is not timed)."""
    path = os.path.join(BENCH_DATA, f"tokens_{n_rows}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from sneller_spark.datagen import write_tokens_table

        write_tokens_table(spark, path, n_rows, partitions=max(CPUS * 2, 16))
    return path


def bench_pipeline(spark, n_rows: int, rounds: int = 3) -> dict:
    """rounds=1 when an OUTER harness already interleaves repeats
    (tools/bench_scaling.py): nested best-of would triple each
    level's wall-clock for no extra signal."""
    from sneller_spark.pipeline.aggregate import aggregate_per_sink_salted
    from sneller_spark.pipeline.route import write_routed
    from sneller_spark.pipeline.runner import transform

    path = ensure_input(spark, n_rows)
    df = spark.read.parquet(path)

    # warmup: JIT + python workers + broadcast, on a slice
    aggregate_per_sink_salted(transform(spark, df.limit(20_000))).collect()

    # aggregation path: explicit pruning — tokens feed the kernel but
    # are not echoed back (see parse_stage passthrough).  Best-of-3:
    # a single sample on a shared box measures the neighbor's workload
    # (round-2 lesson — same discipline as bench_queries below).
    agg_cols = ["doc_id", "source", "n_tok"]
    agg_sec = float("inf")
    for _ in range(rounds):
        t0 = time.monotonic()
        agg = aggregate_per_sink_salted(transform(spark, df, passthrough=agg_cols))
        total = agg.groupBy().sum("n_rows").collect()[0][0]
        agg_sec = min(agg_sec, time.monotonic() - t0)
        assert total == n_rows, (total, n_rows)

    # pure-scan throughput (no python): read + reduce the full tokens
    # column JVM-side — the apples-to-apples number against the
    # reference's GB/s scan claims (/root/reference/README.md:91-97)
    from pyspark.sql import functions as F

    scan_sec = float("inf")
    total_tokens = 0
    for _ in range(rounds):
        t0 = time.monotonic()
        total_tokens = (
            spark.read.parquet(path)
            .select(F.sum(F.size("tokens")).alias("s"))
            .collect()[0]["s"]
        )
        scan_sec = min(scan_sec, time.monotonic() - t0)
    logical_bytes = total_tokens * 4
    disk_bytes = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )

    out_tmp = os.path.join(BENCH_DATA, "_routed_bench_out")
    write_sec = float("inf")
    for _ in range(min(rounds, 2)):  # write pass is the expensive one: best-of-2
        shutil.rmtree(out_tmp, ignore_errors=True)
        t0 = time.monotonic()
        write_routed(transform(spark, df), out_tmp)
        write_sec = min(write_sec, time.monotonic() - t0)
    shutil.rmtree(out_tmp, ignore_errors=True)

    return {
        "pipeline_rows": n_rows,
        "pipeline_agg_sec": round(agg_sec, 3),
        "pipeline_agg_seq_per_sec": round(n_rows / agg_sec, 1),
        "pipeline_e2e_write_sec": round(write_sec, 3),
        "pipeline_e2e_write_seq_per_sec": round(n_rows / write_sec, 1),
        "scan_sec": round(scan_sec, 3),
        "scan_logical_gb_per_sec": round(logical_bytes / scan_sec / 1e9, 3),
        "scan_disk_gb_per_sec": round(disk_bytes / scan_sec / 1e9, 3),
    }


#: contention-probe samples collected across the run (module-level so
#: bench_pipeline and bench_queries both append without re-plumbing)
PROBES: list[float] = []
LOAD1: list[float] = []


def bench_queries(spark, sf_dir: str, rounds: int = 3):
    """Interleaved best-of-N: one warm pass, then `rounds` round-robin
    passes over the whole query list, keeping each query's MIN.  On a
    shared box a single timed sample measures the neighbor's workload
    (round-2 lesson: 2-6x phantom regressions on byte-identical plans);
    interleaving decorrelates per-query noise from any one contention
    window — the same discipline as tools/bench_scaling.py."""
    from sneller_spark import query_catalog_ml  # noqa: F401
    from sneller_spark.query_catalog import CATALOG

    for name in HEADLINE_QUERIES:
        CATALOG[name].fn(spark, sf_dir).collect()  # warm (plan + IO cache)
    samples: dict[str, list[float]] = {n: [] for n in HEADLINE_QUERIES}
    for _ in range(rounds):
        PROBES.append(calibration_probe())
        LOAD1.append(os.getloadavg()[0])
        for name in HEADLINE_QUERIES:
            t0 = time.monotonic()
            CATALOG[name].fn(spark, sf_dir).collect()
            samples[name].append(time.monotonic() - t0)
    import statistics

    best = {n: round(min(s), 3) for n, s in samples.items()}
    median = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    return best, median


def main() -> None:
    pipeline_only = "--pipeline-only" in sys.argv
    rows = BENCH_ROWS
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])

    spark = get_spark(
        app_name="sneller_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    t_all = time.monotonic()
    PROBES.append(calibration_probe())
    LOAD1.append(os.getloadavg()[0])
    derived = bench_pipeline(spark, rows, rounds=1 if pipeline_only else 3)
    if pipeline_only:
        queries, queries_median = {}, {}
    else:
        queries, queries_median = bench_queries(spark, SF_DIR)
    PROBES.append(calibration_probe())
    LOAD1.append(os.getloadavg()[0])
    total_sec = round(time.monotonic() - t_all, 3)

    result = {
        "metric": "end-to-end pipeline seconds (parse->enrich->route->aggregate, "
        f"{rows} sequences) + headline query seconds",
        "value": derived["pipeline_agg_sec"],
        "unit": "sec",
        "queries": queries,
        # per-query MEDIAN of the same interleaved samples: when median
        # diverges from best across the board, the run was contended —
        # compare best-to-best round-over-round, never median-to-best
        "queries_median": queries_median,
        "sf": SF_DIR,
        "cpus": CPUS,
        "derived": derived,
        "contention": contention_report(PROBES, LOAD1),
        "suite_total_sec": total_sec,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
