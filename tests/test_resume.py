"""Checkpoint/resume: a killed job (simulated via max_units) restarts
without reprocessing committed units and converges to exactly the
one-shot result — the analog of blockfmt input dedup
(/root/reference/db/sync.go:366-430)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from sneller_spark.datagen import generate_chunk
from sneller_spark.oracle import run_oracle
from sneller_spark.pipeline.lineage import LineageLog
from sneller_spark.pipeline.runner import read_aggregates, run_pipeline, unit_id_for

N = 6_000
FILES = 4


def _ids(input_dir: str) -> list[str]:
    return [
        unit_id_for(os.path.join(input_dir, f))
        for f in sorted(os.listdir(input_dir))
        if f.endswith(".parquet")
    ]


@pytest.fixture(scope="module")
def input_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tokens_input")
    per = N // FILES
    for k in range(FILES):
        pdf = generate_chunk(k * per, (k + 1) * per)
        pdf.to_parquet(d / f"part-{k:02d}.parquet", index=False)
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


def test_resume_equals_oneshot(spark, input_dir, tmp_path):
    oneshot_dir = str(tmp_path / "oneshot")
    resumed_dir = str(tmp_path / "resumed")

    stats1 = run_pipeline(spark, input_dir, oneshot_dir)
    assert stats1["units"] == FILES and stats1["rows_in"] == N

    # simulate a kill after 2 units, then resume
    p1 = run_pipeline(spark, input_dir, resumed_dir, max_units=2)
    assert p1["units_processed_this_run"] == 2
    assert LineageLog(resumed_dir).committed_units() == set(_ids(input_dir)[:2])
    p2 = run_pipeline(spark, input_dir, resumed_dir)
    assert p2["units_processed_this_run"] == 2  # committed units skipped
    assert p2["units"] == FILES and p2["rows_in"] == N

    a = _norm(read_aggregates(spark, oneshot_dir).toPandas())
    b = _norm(read_aggregates(spark, resumed_dir).toPandas())
    pd.testing.assert_frame_equal(a, b)

    # and both equal the oracle
    _, exp = run_oracle(
        pd.concat([generate_chunk(0, N)], ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, _norm(exp))


def test_rerun_is_idempotent(spark, input_dir, tmp_path):
    out = str(tmp_path / "idem")
    run_pipeline(spark, input_dir, out)
    before = _norm(read_aggregates(spark, out).toPandas())
    stats = run_pipeline(spark, input_dir, out)  # everything committed
    assert stats["units_processed_this_run"] == 0
    after = _norm(read_aggregates(spark, out).toPandas())
    pd.testing.assert_frame_equal(before, after)


def test_manifest_lineage_contents(spark, input_dir, tmp_path):
    out = str(tmp_path / "lineage")
    run_pipeline(spark, input_dir, out, max_units=1)
    log = LineageLog(out)
    m = log.read_manifest(_ids(input_dir)[0])
    assert m.rows_in == N // FILES
    assert m.rows_routed == m.rows_in  # routing never drops rows
    assert sum(m.per_sink_rows.values()) == m.rows_routed
    assert sum(m.per_partition_rows.values()) == m.rows_routed
    assert m.input_bytes > 0 and m.wall_ms > 0
    assert os.path.exists(os.path.join(out, "_commit.log"))


def test_resume_after_partial_uncommitted_write(spark, input_dir, tmp_path):
    """A job killed MID-unit leaves data files but no manifest; resume
    must reprocess that unit idempotently (overwrite, no double
    count)."""
    import os

    out = str(tmp_path / "partial")
    run_pipeline(spark, input_dir, out, max_units=1)

    # simulate a crash mid-way through unit-00001: partial garbage
    # parquet directory exists, manifest does NOT
    unit_dir = os.path.join(out, "routed", f"unit={_ids(input_dir)[1]}", "sink_id=sink-0")
    os.makedirs(unit_dir, exist_ok=True)
    pdf = generate_chunk(0, 10)
    pdf.to_parquet(os.path.join(unit_dir, "part-garbage.parquet"), index=False)
    assert not LineageLog(out).is_committed(_ids(input_dir)[1])

    stats = run_pipeline(spark, input_dir, out)  # resume
    assert stats["units"] == FILES and stats["rows_in"] == N

    got = _norm(read_aggregates(spark, out).toPandas())
    _, exp = run_oracle(generate_chunk(0, N))
    pd.testing.assert_frame_equal(got, _norm(exp))


def test_new_file_sorting_first_is_processed_not_skipped(spark, tmp_path):
    """Round-1 bug (ADVICE): positional unit ids shifted when a new
    input file sorted BEFORE existing ones, so resume skipped the new
    file and double-counted an old one.  Identity-keyed ids must
    process exactly the new file and keep totals exact."""
    d = tmp_path / "growing_input"
    d.mkdir()
    per = 1500
    # initial files deliberately named to sort LATE
    pdf_m = generate_chunk(0, per)
    pdf_z = generate_chunk(per, 2 * per)
    pdf_m.to_parquet(d / "m-data.parquet", index=False)
    pdf_z.to_parquet(d / "z-data.parquet", index=False)

    out = str(tmp_path / "grow_out")
    s1 = run_pipeline(spark, str(d), out)
    assert s1["units"] == 2 and s1["rows_in"] == 2 * per

    # a new file lands that sorts FIRST
    pdf_a = generate_chunk(2 * per, 3 * per)
    pdf_a.to_parquet(d / "a-data.parquet", index=False)

    s2 = run_pipeline(spark, str(d), out)
    assert s2["units_processed_this_run"] == 1  # only the new file
    assert s2["units"] == 3 and s2["rows_in"] == 3 * per

    got = _norm(read_aggregates(spark, out).toPandas())
    _, exp = run_oracle(generate_chunk(0, 3 * per))
    pd.testing.assert_frame_equal(got, _norm(exp))


def test_committed_id_with_changed_inputs_reprocessed(spark, tmp_path):
    """is_committed must verify manifest inputs, not just the id."""
    d = tmp_path / "swap_input"
    d.mkdir()
    generate_chunk(0, 1000).to_parquet(d / "x.parquet", index=False)
    out = str(tmp_path / "swap_out")
    run_pipeline(spark, str(d), out)
    uid = _ids(str(d))[0]
    log = LineageLog(out)
    assert log.is_committed(uid, inputs=[str(d / "x.parquet")])
    # same id queried with a different input list -> not committed
    assert not log.is_committed(uid, inputs=[str(d / "y.parquet")])


def test_rewritten_input_not_treated_as_committed(spark, tmp_path):
    """An input rewritten IN PLACE (same name, new content) must be
    reprocessed: is_committed checks (basename, size, mtime_ns)
    identity, not just the name (ADVICE r2; reference FileTree
    ETag/mtime check, db/sync.go:366-430)."""
    d = tmp_path / "rewrite_input"
    d.mkdir()
    generate_chunk(0, 1000).to_parquet(d / "x.parquet", index=False)
    out = str(tmp_path / "rewrite_out")
    s1 = run_pipeline(spark, str(d), out)
    assert s1["rows_in"] == 1000

    # rewrite in place with different content (and row count)
    generate_chunk(5000, 6500).to_parquet(d / "x.parquet", index=False)
    s2 = run_pipeline(spark, str(d), out)
    assert s2["units_processed_this_run"] == 1   # NOT silently skipped
    assert s2["rows_in"] == 1500                 # manifest reflects new content

    got = _norm(read_aggregates(spark, out).toPandas())
    _, exp = run_oracle(generate_chunk(5000, 6500))
    pd.testing.assert_frame_equal(got, _norm(exp))


def test_stale_layout_refused(spark, tmp_path):
    """An out_dir holding unit state written under an older unit-id
    scheme (no / mismatched _LAYOUT stamp) must be refused, not
    silently double-counted (ADVICE r2)."""
    d = tmp_path / "layout_input"
    d.mkdir()
    generate_chunk(0, 500).to_parquet(d / "x.parquet", index=False)
    out = tmp_path / "layout_out"
    run_pipeline(spark, str(d), str(out))

    os.remove(out / "_LAYOUT")  # simulate a pre-versioning output dir
    with pytest.raises(ValueError, match="layout"):
        run_pipeline(spark, str(d), str(out))

    (out / "_LAYOUT").write_text("unit-ids-v1-positional")
    with pytest.raises(ValueError, match="double-count"):
        run_pipeline(spark, str(d), str(out))


def test_symlinked_input_path_same_unit_id(spark, tmp_path):
    """The same physical input addressed via a symlink must not fork a
    second unit id (realpath normalization): resume skips it."""
    d = tmp_path / "real_input"
    d.mkdir()
    generate_chunk(0, 700).to_parquet(d / "x.parquet", index=False)
    link = tmp_path / "linked_input"
    os.symlink(d, link)
    assert unit_id_for(str(d / "x.parquet")) == unit_id_for(str(link / "x.parquet"))

    out = str(tmp_path / "link_out")
    run_pipeline(spark, str(d), out)
    s2 = run_pipeline(spark, str(link), out)
    assert s2["units_processed_this_run"] == 0
    assert s2["units"] == 1 and s2["rows_in"] == 700


def test_same_basename_different_dirs_not_confused(spark, tmp_path):
    """Two input dirs both containing x.parquet feeding ONE output:
    identity-keyed ids must differ (round-2 review: basename-only
    digest collided and silently skipped the second file)."""
    d1, d2 = tmp_path / "day1", tmp_path / "day2"
    d1.mkdir(), d2.mkdir()
    generate_chunk(0, 800).to_parquet(d1 / "x.parquet", index=False)
    generate_chunk(800, 2000).to_parquet(d2 / "x.parquet", index=False)
    assert unit_id_for(str(d1 / "x.parquet")) != unit_id_for(str(d2 / "x.parquet"))

    out = str(tmp_path / "multi_out")
    s1 = run_pipeline(spark, str(d1), out)
    s2 = run_pipeline(spark, str(d2), out)
    assert s1["rows_in"] == 800
    assert s2["units_processed_this_run"] == 1  # day2's x.parquet NOT skipped
    assert s2["units"] == 2 and s2["rows_in"] == 2000

    got = _norm(read_aggregates(spark, out).toPandas())
    _, exp = run_oracle(generate_chunk(0, 2000))
    pd.testing.assert_frame_equal(got, _norm(exp))


def test_unit_sketches_merge_to_whole_corpus(spark, input_dir, tmp_path):
    """Per-unit CM sketches written during (killed + resumed) ingest
    merge — cell for cell — into the sketch of the whole routed
    corpus, and heavy hitters pruned by the merged summary equal the
    whole-corpus exact recount.  This is the shipped-summary contract:
    each unit ships a fixed-size summary; corpus-wide pruning never
    re-reads the corpus."""
    from pyspark.sql import functions as F

    from sneller_spark.operators.sketch import cm_estimate, cm_sketch
    from sneller_spark.pipeline.runner import read_merged_sketch, read_routed

    out = str(tmp_path / "sk")
    p1 = run_pipeline(spark, input_dir, out, max_units=2, sketch_col="source")
    assert p1["units_processed_this_run"] == 2
    p2 = run_pipeline(spark, input_dir, out, sketch_col="source")
    assert p2["units"] == FILES

    merged = read_merged_sketch(spark, out)
    routed = read_routed(spark, out)
    whole = cm_sketch(routed, "source",
                      depth=merged.depth, width=merged.width, seed=merged.seed)
    cell = lambda df: sorted(  # noqa: E731
        map(tuple, df.select("d", "bucket", "cnt").toPandas().values.tolist())
    )
    assert cell(merged.df) == cell(whole.df)

    # heavy hitters from the merged summary == exact recount
    threshold = 500
    cand = cm_estimate(
        merged, routed.select("source").distinct(), "source"
    ).filter(F.col("est") >= threshold)
    got = {
        (r["source"], r["n"])
        for r in routed.join(cand.select("source"), "source", "left_semi")
        .groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold).collect()
    }
    expect = {
        (r["source"], r["n"])
        for r in routed.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold).collect()
    }
    assert got == expect and got  # non-vacuous

    # parameter mismatch on resume is refused, mirroring cm_merge
    with pytest.raises(ValueError, match="sketch parameter mismatch"):
        run_pipeline(spark, input_dir, out, sketch_col="source",
                     sketch_params=(4, 2048, 7))


def test_sketch_backfill_and_coverage_gate(spark, input_dir, tmp_path):
    """Units committed by a run WITHOUT sketch_col get their sketches
    BACKFILLED (from routed output, no reprocess) when a later run
    passes sketch_col; and read_merged_sketch refuses a sketch set
    that does not cover every committed unit (ADVICE r5: a silent
    undercount would break CM's no-false-negatives pruning)."""
    import shutil

    from sneller_spark.operators.sketch import cm_sketch
    from sneller_spark.pipeline.runner import (
        SKETCH_SUBDIR, read_merged_sketch, read_routed,
    )

    out = str(tmp_path / "bf")
    p1 = run_pipeline(spark, input_dir, out)            # no sketches at all
    assert p1["units"] == FILES
    p2 = run_pipeline(spark, input_dir, out, sketch_col="source")
    assert p2["units_processed_this_run"] == 0          # nothing reprocessed

    merged = read_merged_sketch(spark, out)             # backfill covered all
    routed = read_routed(spark, out)
    whole = cm_sketch(routed, "source",
                      depth=merged.depth, width=merged.width, seed=merged.seed)
    cell = lambda df: sorted(  # noqa: E731
        map(tuple, df.select("d", "bucket", "cnt").toPandas().values.tolist())
    )
    assert cell(merged.df) == cell(whole.df)

    # knock out one unit's sketch -> the merge must refuse, naming it
    victim = sorted(
        d for d in os.listdir(os.path.join(out, SKETCH_SUBDIR))
        if d.startswith("unit=")
    )[0]
    shutil.rmtree(os.path.join(out, SKETCH_SUBDIR, victim))
    with pytest.raises(ValueError, match="lack sketches"):
        read_merged_sketch(spark, out)
