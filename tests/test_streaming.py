"""Structured Streaming wrapper of the pipeline: memory-sink aggregate
matches the batch result; file-sink variant writes epoch-scoped
fan-out."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from sneller_spark.datagen import generate_chunk
from sneller_spark.oracle import run_oracle
from sneller_spark.streaming import stream_pipeline, stream_pipeline_memory_sink

N = 4000
FILES = 4


@pytest.fixture(scope="module")
def stream_input(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_in")
    per = N // FILES
    for k in range(FILES):
        generate_chunk(k * per, (k + 1) * per).to_parquet(
            d / f"part-{k:02d}.parquet", index=False
        )
    return str(d)


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out["level"] = out["level"].where(pd.notna(out["level"]), None)
    out = out.sort_values(
        ["sink_id", "source", "level"], na_position="first"
    ).reset_index(drop=True)
    for c in ("n_rows", "sum_n_tok"):
        out[c] = out[c].astype("int64")
    return out[["sink_id", "source", "level", "n_rows", "sum_n_tok"]]


def test_streaming_agg_matches_oracle(spark, stream_input):
    q = stream_pipeline_memory_sink(spark, stream_input, query_name="t_stream_agg",
                                    max_files_per_trigger=2)
    try:
        q.processAllAvailable()
        got = _norm(spark.sql("SELECT * FROM t_stream_agg").toPandas())
    finally:
        q.stop()
    _, exp = run_oracle(generate_chunk(0, N))
    pd.testing.assert_frame_equal(got, _norm(exp))


def test_streaming_file_sink_epochs(spark, stream_input, tmp_path):
    out = str(tmp_path / "stream_out")
    q = stream_pipeline(spark, stream_input, out, max_files_per_trigger=2)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    routed = spark.read.parquet(os.path.join(out, "routed_stream"))
    assert routed.count() == N
    assert os.path.isdir(os.path.join(out, "_checkpoint"))


def test_stateful_source_totals_matches_batch(spark, stream_input):
    """applyInPandasWithState running totals: after all files are
    processed, the LATEST emission per source must equal the batch
    groupBy totals (state carried correctly across micro-batches)."""
    from sneller_spark.streaming import stateful_source_totals

    q = stateful_source_totals(
        spark, stream_input, query_name="t_stateful_totals", max_files_per_trigger=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.sql(
        """SELECT source, MAX(n_rows) AS n_rows, MAX(sum_n_tok) AS sum_n_tok
           FROM t_stateful_totals GROUP BY source"""
    ).toPandas()

    exp = (
        generate_chunk(0, N)
        .groupby("source")
        .agg(n_rows=("doc_id", "size"), sum_n_tok=("n_tok", "sum"))
        .reset_index()
    )
    g = got.sort_values("source").reset_index(drop=True)
    e = exp.sort_values("source").reset_index(drop=True)
    assert list(g["source"]) == list(e["source"])
    assert list(g["n_rows"]) == list(e["n_rows"].astype("int64"))
    assert list(g["sum_n_tok"]) == list(e["sum_n_tok"].astype("int64"))
    # more than one emission per source proves cross-batch state updates
    n_emissions = spark.sql("SELECT COUNT(*) AS c FROM t_stateful_totals").first()["c"]
    assert n_emissions > len(e)


def test_stateful_state_survives_restart(spark, tmp_path):
    """Kill the stateful query, land a new file, restart on the SAME
    checkpoint: GroupState must resume (not recount committed files)
    and the latest totals must equal the batch aggregate over ALL
    files — the stateful analog of the batch runner's resume.  Uses
    the fault-tolerant foreachBatch parquet sink (the memory sink
    cannot recover from a checkpoint)."""
    from sneller_spark.streaming import stateful_source_totals

    d = tmp_path / "stateful_in"
    d.mkdir()
    out_dir = str(tmp_path / "stateful_out")
    ckpt = str(tmp_path / "stateful_ckpt")
    per = 1000
    for k in range(2):
        generate_chunk(k * per, (k + 1) * per).to_parquet(
            d / f"part-{k:02d}.parquet", index=False
        )

    q = stateful_source_totals(
        spark, str(d), max_files_per_trigger=1,
        checkpoint_dir=ckpt, output_dir=out_dir,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # new file lands while the query is down
    generate_chunk(2 * per, 3 * per).to_parquet(d / "part-02.parquet", index=False)

    q2 = stateful_source_totals(
        spark, str(d), max_files_per_trigger=1,
        checkpoint_dir=ckpt, output_dir=out_dir,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    emitted = spark.read.parquet(out_dir).toPandas()
    got = (
        emitted.groupby("source")
        .agg(n_rows=("n_rows", "max"), sum_n_tok=("sum_n_tok", "max"))
        .reset_index()
    )
    exp = (
        generate_chunk(0, 3 * per)
        .groupby("source")
        .agg(n_rows=("doc_id", "size"), sum_n_tok=("n_tok", "sum"))
        .reset_index()
    )
    g = got.sort_values("source").reset_index(drop=True)
    e = exp.sort_values("source").reset_index(drop=True)
    assert list(g["source"]) == list(e["source"])
    assert list(g["n_rows"]) == list(e["n_rows"].astype("int64"))
    assert list(g["sum_n_tok"]) == list(e["sum_n_tok"].astype("int64"))
    # recovery proof: run 1 consumed its two files as batches 0..1, so
    # every epoch >= 2 belongs to the restarted query — those epochs may
    # contain ONLY file-3 sources (files 1-2 were not reprocessed), yet
    # the totals above cover all three files, so the counts can only
    # have come from recovered GroupState
    file3_sources = set(generate_chunk(2 * per, 3 * per)["source"].unique())
    run2 = emitted[emitted["epoch"] >= 2]
    assert len(run2) > 0
    assert set(run2["source"]) <= file3_sources


def test_watermarked_windows_emit_once_and_drop_late(spark, tmp_path):
    """Append-mode watermarked windows: each window emits exactly once
    when the watermark passes its end, and a row arriving LATER than
    the watermark is dropped (never counted, never re-emits a window)."""
    import datetime as dt

    from sneller_spark.streaming import watermarked_window_counts

    d = tmp_path / "wm_in"
    d.mkdir()
    schema = "ts timestamp_ntz, event_type string"
    base = dt.datetime(2026, 1, 1, 0, 0, 0)

    def write(name, rows):
        pdf = pd.DataFrame(rows, columns=["ts", "event_type"])
        # microsecond resolution: Spark cannot read ns-timestamps
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf.to_parquet(d / name, index=False)

    # file 1: hours 0 and 1, plus a head event at 02:00 that pushes the
    # watermark to 01:30 -> window [00:00, 01:00) finalizes next batch
    write("f1.parquet", [
        (base + dt.timedelta(minutes=5), "click"),
        (base + dt.timedelta(minutes=40), "click"),
        (base + dt.timedelta(minutes=70), "view"),
        (base + dt.timedelta(hours=2), "view"),
    ])
    q = watermarked_window_counts(
        spark, str(d), schema, query_name="t_wm", watermark="30 minutes"
    )
    try:
        q.processAllAvailable()
        # file 2: a LATE click at 00:50 (behind the 01:30 watermark ->
        # must be dropped) plus hour-3 events advancing the watermark
        write("f2.parquet", [
            (base + dt.timedelta(minutes=50), "click"),      # LATE, dropped
            (base + dt.timedelta(hours=3, minutes=5), "view"),
        ])
        q.processAllAvailable()
        # file 3: hour-5 head to flush remaining closed windows
        write("f3.parquet", [(base + dt.timedelta(hours=5), "click")])
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.sql(
        "SELECT window_start, event_type, n FROM t_wm ORDER BY window_start, event_type"
    ).toPandas()
    rows = {
        (str(r["window_start"]), r["event_type"]): int(r["n"])
        for _, r in got.iterrows()
    }
    # hour-0 clicks: exactly the 2 on-time ones; the late 00:50 click
    # was dropped (3 here would mean the watermark failed)
    assert rows[("2026-01-01 00:00:00", "click")] == 2
    assert rows[("2026-01-01 01:00:00", "view")] == 1
    assert rows[("2026-01-01 02:00:00", "view")] == 1
    assert rows[("2026-01-01 03:00:00", "view")] == 1
    # append mode: every (window, key) appears exactly once
    assert len(got) == len(set(zip(got["window_start"], got["event_type"])))


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Re-deliveries of the same doc_id across micro-batches within the
    watermark horizon are dropped; every id surfaces exactly once."""
    import datetime as dt

    from sneller_spark.streaming.incremental import stream_dedup_within_watermark

    d = tmp_path / "dedup_stream"
    d.mkdir()
    base = dt.datetime(2024, 5, 1, 12, 0, 0)

    def write(name, rows):
        pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "payload"])
        # micro-precision: pandas defaults to ns, which Spark's parquet
        # reader rejects for TIMESTAMP columns
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(d / name, index=False)

    # batch 1: ids 1..4; batch 2 re-delivers 2 and 3 minutes later,
    # plus new ids 5,6
    write("b1.parquet", [(i, base + dt.timedelta(minutes=i), f"p{i}") for i in (1, 2, 3, 4)])
    write("b2.parquet", [
        (2, base + dt.timedelta(minutes=9), "dup"),
        (3, base + dt.timedelta(minutes=10), "dup"),
        (5, base + dt.timedelta(minutes=11), "p5"),
        (6, base + dt.timedelta(minutes=12), "p6"),
    ])

    q = stream_dedup_within_watermark(
        spark, str(d), "doc_id long, ts timestamp, payload string",
        id_cols=["doc_id"], watermark="30 minutes",
        query_name="t_stream_dedup",
    )
    try:
        q.processAllAvailable()
        got = spark.table("t_stream_dedup").toPandas()
    finally:
        q.stop()
    assert sorted(got["doc_id"]) == [1, 2, 3, 4, 5, 6]
    # first occurrence wins: the re-delivered payloads never surface
    assert "dup" not in set(got["payload"])


def test_streaming_rollup_incremental_maintenance(spark, tmp_path):
    """Continuous-aggregate maintenance on a stream: each micro-batch
    rolls up its OWN rows (lossless partials) and merge_rollup folds
    them into the running rollup table — after all triggers the
    maintained rollup equals a batch rollup of everything, though no
    batch ever saw more than its own files."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sneller_spark.operators.timeseries import merge_rollup, rollup_time_buckets

    src = tmp_path / "events_in"
    src.mkdir()
    base = dt.datetime(2024, 6, 1)
    all_rows = []
    for f in range(3):
        rows = [
            (base + dt.timedelta(minutes=90 * f + m), "k%d" % (m % 2), float(m))
            for m in range(40)
        ]
        all_rows += rows
        # plain parquet FILES (not directories): the file stream source
        # does not recurse into subdirectories
        pd.DataFrame(rows, columns=["ts", "k", "value"]).to_parquet(
            src / f"f{f}.parquet", index=False, coerce_timestamps="us"
        )

    store = str(tmp_path / "rollup_store")
    state = {"have": False}

    def upsert(batch_df, epoch_id):
        part = rollup_time_buckets(
            batch_df, key_cols=["k"], granularities=("hour",)
        )["hour"]
        if state["have"]:
            existing = batch_df.sparkSession.read.parquet(store)
            part = merge_rollup(existing, part, key_cols=["k"])
        # stage then swap: the store is also this batch's input
        staged = store + ".next"
        part.write.mode("overwrite").parquet(staged)
        import shutil

        shutil.rmtree(store, ignore_errors=True)
        shutil.move(staged, store)
        state["have"] = True

    q = (
        spark.readStream.schema("ts timestamp_ntz, k string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full = rollup_time_buckets(
        spark.createDataFrame(all_rows, "ts timestamp_ntz, k string, value double"),
        key_cols=["k"], granularities=("hour",),
    )["hour"].toPandas().sort_values(["bucket", "k"]).reset_index(drop=True)
    got = (
        spark.read.parquet(store).toPandas()
        .sort_values(["bucket", "k"]).reset_index(drop=True)
    )
    assert got[["bucket", "k", "n"]].equals(full[["bucket", "k", "n"]])
    assert (got["sum_v"].round(6) == full["sum_v"].round(6)).all()
