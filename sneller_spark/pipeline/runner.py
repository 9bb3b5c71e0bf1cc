"""End-to-end pipeline runner: parse -> enrich -> route -> aggregate
with unit-granular checkpoint/resume and per-partition lineage.

The unit of work is one input parquet file (the Spark analog of the
reference's block-granular work assignment,
/root/reference/plan/unionmap.go:208-341, and of blockfmt's
ingest-once FileTree dedup, /root/reference/db/sync.go:366-430).
Committed units are never reprocessed; a killed run resumes where the
commit log left off, and the final aggregates — computed from the
routed output table, not from transient state — come out identical to
a single uninterrupted run.
"""

from __future__ import annotations

import hashlib
import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..lookups import lookup_source_df, route_rules_df
from .aggregate import aggregate_per_sink, aggregate_per_sink_salted
from .enrich import enrich_stage
from .lineage import LineageLog, UnitManifest, file_identity
from .parse import parse_stage
from .route import route_stage

ROUTED_SUBDIR = "routed"
AGG_SUBDIR = "aggregates"
SKETCH_SUBDIR = "sketches"

# Output-layout version: bumped whenever the unit-id scheme changes.
# The final aggregate reads the WHOLE routed dir and total_stats() sums
# every manifest, so unit=* state written under an older id scheme
# would silently double-count every row once the same inputs re-enter
# under new ids.  Resuming an out_dir stamped with a different (or
# missing) version is refused instead.
LAYOUT_VERSION = "unit-ids-v3-realpath"


def _check_layout_version(out_dir: str, routed_dir: str, log) -> None:
    """Refuse to resume an out_dir whose unit-id layout predates
    LAYOUT_VERSION; stamp fresh output dirs atomically."""
    marker = os.path.join(out_dir, "_LAYOUT")
    current = None
    if os.path.exists(marker):
        with open(marker) as f:
            current = f.read().strip()
    if current == LAYOUT_VERSION:
        return
    has_state = os.path.isdir(routed_dir) or log.committed_units()
    if has_state:
        raise ValueError(
            f"output dir {out_dir!r} holds pipeline state written under "
            f"layout {current or 'pre-versioning'!r}, but this build uses "
            f"{LAYOUT_VERSION!r}; resuming would double-count rows — use a "
            "fresh output dir (or delete the stale routed/ and manifests/)"
        )
    os.makedirs(out_dir, exist_ok=True)
    tmp = f"{marker}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        f.write(LAYOUT_VERSION)
    os.replace(tmp, marker)


def transform(
    spark: SparkSession,
    df: DataFrame,
    lookup: DataFrame | None = None,
    rules: DataFrame | None = None,
    passthrough: list[str] | None = None,
    kernel: str = "dict",
) -> DataFrame:
    """The pure transformation: input rows -> routed, enriched rows.

    ``passthrough`` limits which input columns survive the parse kernel
    (explicit column pruning through the Arrow boundary): routing sinks
    need everything (default); an aggregation-only consumer should pass
    ["doc_id", "source", "n_tok"] so the tokens column is never echoed
    back out of the kernel.

    ``kernel``: "dict" (default) evaluates the pattern bank once over
    the vocabulary and extracts by sparse integer gather — ~7x faster
    per core and bit-identical for the built-in bank (tested); "regex"
    runs RE2 over the decoded text and supports arbitrary patterns;
    "jvm" is the zero-Python whole-stage-codegen fallback."""
    lookup = lookup if lookup is not None else lookup_source_df(spark)
    rules = rules if rules is not None else route_rules_df(spark)
    if kernel == "dict":
        from .parse import parse_stage_dict

        parsed = parse_stage_dict(df, passthrough=passthrough)
    elif kernel == "jvm":
        # zero-Python plan: vocab-literal decode + regexp_extract,
        # whole-stage codegen end to end (slower per core, but runs
        # where Python workers are unavailable)
        from .parse import parse_stage_jvm

        parsed = parse_stage_jvm(df)
        if passthrough is not None:
            from .parse import PARSED_FIELDS

            parsed = parsed.select(*passthrough, *PARSED_FIELDS)
    else:
        parsed = parse_stage(df, passthrough=passthrough)
    return route_stage(enrich_stage(parsed, lookup), rules)


def unit_id_for(path: str) -> str:
    """Unit id derived from the input file IDENTITY, not its position
    in the listing: a new file that sorts before existing ones must not
    shift committed ids (the reference keys ingest dedup on the input
    object, db/sync.go:366-430).  basename keeps ids human-readable;
    the path hash disambiguates same-named files from different dirs."""
    base = os.path.basename(path)
    if base.endswith(".parquet"):
        base = base[: -len(".parquet")]
    safe = "".join(c if (c.isalnum() or c in "-_.") else "_" for c in base)
    # digest the FULL normalized path: same-named files from different
    # input directories must not collide on one output's commit log.
    # realpath (not abspath) so the same file addressed via a symlink,
    # "..", or a relative path cannot fork a second unit id — duplicate
    # ids for one physical input would double-count on resume.
    digest = hashlib.sha256(os.path.realpath(path).encode()).hexdigest()[:8]
    return f"unit-{safe}-{digest}"


def list_units(input_path: str) -> list[tuple[str, list[str]]]:
    """One unit per input parquet file, deterministic order, ids keyed
    on file identity (stable under later additions to the directory)."""
    files = sorted(
        os.path.join(input_path, f)
        for f in os.listdir(input_path)
        if f.endswith(".parquet")
    )
    return [(unit_id_for(f), [f]) for f in files]


def _written_file_rows(unit_dir: str) -> tuple[dict[str, int], dict[str, int]]:
    """Per-sink and per-file row counts of a just-written unit, read
    from parquet FOOTERS only (no data scan, no Spark job)."""
    import pyarrow.parquet as pq

    per_sink: dict[str, int] = {}
    per_file: dict[str, int] = {}
    for root, _dirs, fnames in os.walk(unit_dir):
        part = os.path.basename(root)
        if not part.startswith("sink_id="):
            continue
        sink = part[len("sink_id="):]
        for fn in fnames:
            if not fn.endswith(".parquet"):
                continue
            n = pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
            per_sink[sink] = per_sink.get(sink, 0) + n
            per_file[f"{sink}/{fn}"] = n
    return per_sink, per_file


def _sketch_params_marker(sketch_dir: str, depth: int, width: int, seed: int) -> None:
    """Stamp (or validate) the sketch hash parameters for an output
    dir: every unit's sketch must probe identical (depth, width, seed)
    or the cell-wise merge would be garbage — a resume with different
    parameters is refused, mirroring cm_merge's own check."""
    import json

    marker = os.path.join(sketch_dir, "_params.json")
    want = {"depth": depth, "width": width, "seed": seed}
    if os.path.exists(marker):
        with open(marker) as f:
            have = json.load(f)
        if have != want:
            raise ValueError(
                f"sketch parameter mismatch on resume: dir has {have}, "
                f"run requested {want}; use a fresh out_dir or match them"
            )
        return
    os.makedirs(sketch_dir, exist_ok=True)
    tmp = f"{marker}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(want, f)
    os.replace(tmp, marker)


def _write_unit_sketch(
    col_df: DataFrame, sketch_col: str, unit_sketch_dir: str,
    sketch_params: tuple[int, int, int],
) -> None:
    """Build and durably write one unit's fixed-size CM summary;
    overwrite keeps re-runs idempotent."""
    from ..operators.sketch import cm_sketch

    depth, width, seed = sketch_params
    sk = cm_sketch(col_df, sketch_col, depth=depth, width=width, seed=seed)
    sk.df.write.mode("overwrite").parquet(unit_sketch_dir)


def read_merged_sketch(spark: SparkSession, out_dir: str):
    """Union every committed unit's CM sketch and fold cell-wise —
    the n-way cm_merge.  Input is units x depth x width bucket rows
    (fixed size per unit, independent of unit cardinality), so the
    merge cost never grows with data volume: this is the
    shipped-summary story — each ingest unit ships a fixed-size
    frequency summary, and corpus-wide heavy-hitter pruning runs on
    the merged summary without re-reading the corpus.

    Coverage is verified against the commit log before merging: a unit
    committed WITHOUT a sketch (an earlier run without sketch_col, or
    one predating sketches) would silently undercount the merged
    summary and break the CM never-undercount guarantee that
    heavy-hitter pruning's no-false-negatives property rests on —
    such a gap raises instead of merging."""
    import json

    from ..operators.sketch import CMSketch

    sketch_dir = os.path.join(out_dir, SKETCH_SUBDIR)
    with open(os.path.join(sketch_dir, "_params.json")) as f:
        p = json.load(f)
    committed = LineageLog(out_dir).committed_units()
    # a sketch only counts with its _SUCCESS marker: a crash mid-write
    # leaves part files that would merge as a partial (undercounting)
    # summary — exactly what this gate exists to refuse
    have = {
        d[len("unit="):]
        for d in os.listdir(sketch_dir)
        if d.startswith("unit=")
        and os.path.exists(os.path.join(sketch_dir, d, "_SUCCESS"))
    }
    missing = sorted(committed - have)
    if missing:
        raise ValueError(
            "read_merged_sketch: committed units lack sketches (written "
            "by a run without sketch_col?): "
            f"{missing[:5]}{'...' if len(missing) > 5 else ''}; the merged "
            "summary would undercount — re-run run_pipeline with "
            "sketch_col set (it backfills sketches for committed units "
            "from their routed output without reprocessing them)"
        )
    merged = (
        spark.read.parquet(sketch_dir)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return CMSketch(merged, p["depth"], p["width"], p["seed"])


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    resume: bool = True,
    max_units: int | None = None,
    salted: bool = True,
    salt_buckets: int = 16,
    sketch_col: str | None = None,
    sketch_params: tuple[int, int, int] = (4, 1024, 7),
) -> dict:
    """Run (or resume) the pipeline over an input table directory.

    Returns ExecStats-style metrics.  ``max_units`` caps how many units
    this invocation processes — used by tests to simulate a killed job.

    ``sketch_col`` opts into per-unit count-min sketches: each unit
    writes a fixed-size (depth x width) frequency summary of that
    column alongside its routed output (before the unit commits, so a
    committed unit always has its sketch; overwrite keeps re-runs
    idempotent).  ``read_merged_sketch`` folds them corpus-wide —
    heavy-hitter candidates then come from the merged summary instead
    of a second pass over the routed table.
    """
    log = LineageLog(out_dir)
    routed_dir = os.path.join(out_dir, ROUTED_SUBDIR)
    units = list_units(input_path)
    _check_layout_version(out_dir, routed_dir, log)
    done_ids = {
        uid
        for uid, files in units
        if resume and log.is_committed(uid, inputs=files)
    }
    todo = [(uid, files) for uid, files in units if uid not in done_ids]
    if todo:
        # a unit already absorbed into a compaction pack must never be
        # reprocessed: its old rows live in the pack, so a rewrite
        # would double-count in read_routed
        from .compact import compaction_view

        absorbed, _packs = compaction_view(out_dir)
        clash = sorted(uid for uid, _f in todo if uid in absorbed)
        if clash and not resume:
            raise RuntimeError(
                "resume=False cannot reprocess a compacted output dir: "
                f"unit(s) {clash} are inside a pack and a rewrite would "
                "duplicate their rows — use a fresh output dir")
        if clash:
            raise RuntimeError(
                f"input identity changed for compacted unit(s) {clash}: "
                "their previous rows are inside a pack and reprocessing "
                "would duplicate them — inputs must be immutable after "
                "compaction (use a fresh output dir to re-ingest)")
    if max_units is not None:
        todo = todo[:max_units]

    sketch_dir = os.path.join(out_dir, SKETCH_SUBDIR)
    if sketch_col is not None:
        _sketch_params_marker(sketch_dir, *sketch_params)
        # backfill: a unit committed by an earlier run WITHOUT
        # sketch_col is skipped by resume and would otherwise never get
        # a sketch, leaving the merged summary a silent undercount
        # (read_merged_sketch refuses such gaps).  Building from the
        # unit's routed output is a column-pruned read — no reprocess.
        # Iterate the COMMIT LOG, not the current input listing: a
        # committed unit whose input file has since been deleted still
        # contributes routed rows and still needs its sketch.  Units
        # about to be reprocessed (identity changed -> in todo) are
        # excluded; they write a fresh sketch in the loop below.
        from .compact import compaction_view

        absorbed_units, _packs = compaction_view(out_dir)
        todo_ids = {uid for uid, _ in todo}
        for uid in sorted(log.committed_units() - todo_ids):
            sdir = os.path.join(sketch_dir, f"unit={uid}")
            if os.path.exists(os.path.join(sdir, "_SUCCESS")):
                continue
            unit_dir = os.path.join(routed_dir, f"unit={uid}")
            if not os.path.isdir(unit_dir):
                if uid in absorbed_units:
                    # compact_routed refuses to absorb sketch-less
                    # units only while sketches/ exists; enabling
                    # sketch_col AFTER compaction hits this instead of
                    # a silent undercount
                    raise RuntimeError(
                        f"unit {uid} was compacted before sketches "
                        "were enabled; its per-unit backfill source is "
                        "gone — rebuild sketches from read_routed() or "
                        "start a fresh output dir with sketch_col set")
                raise RuntimeError(
                    f"committed unit {uid} has no routed output and no "
                    "compaction record — the routed table was modified "
                    "out-of-band; cannot backfill its sketch")
            _write_unit_sketch(
                spark.read.parquet(unit_dir).select(sketch_col),
                sketch_col, sdir, sketch_params,
            )

    for unit_id, files in todo:
        t0 = time.monotonic()
        # rows_in via observe(): collected during the write pass below,
        # so the unit is read exactly ONCE (round-1 version re-scanned
        # the input for .count() and the output for per-sink counts)
        obs = Observation(f"in-{unit_id}")
        df = spark.read.parquet(*files).observe(obs, F.count(F.lit(1)).alias("rows_in"))
        routed = transform(spark, df)

        if sketch_col is not None:
            # the write below materializes the cache, so the sketch pass
            # reads cached rows instead of re-reading the written unit
            # (or re-running the parse kernel); one unit's output is
            # bounded by the input-file unit size, and spills to disk
            from pyspark import StorageLevel

            routed = routed.persist(StorageLevel.MEMORY_AND_DISK)

        unit_dir = os.path.join(routed_dir, f"unit={unit_id}")
        try:
            # idempotent overwrite of THIS unit's directory only
            routed.write.mode("overwrite").partitionBy("sink_id").parquet(unit_dir)

            if sketch_col is not None:
                # sketch BEFORE the commit below: a committed unit
                # therefore always has a durable sketch, and the
                # overwrite keeps a re-processed unit idempotent
                _write_unit_sketch(
                    routed.select(sketch_col), sketch_col,
                    os.path.join(sketch_dir, f"unit={unit_id}"), sketch_params,
                )
        finally:
            if sketch_col is not None:
                # release even on a failed write: a caller that catches
                # and keeps the session must not pin a unit's rows
                routed.unpersist()

        # lineage + metrics from parquet footers of the files just
        # written (counts exactly what was committed, zero extra scans)
        per_sink, per_file = _written_file_rows(unit_dir)
        rows_routed = sum(per_sink.values())
        log.commit(
            UnitManifest(
                unit_id=unit_id,
                inputs=files,
                input_identity=file_identity(files),
                input_bytes=sum(os.path.getsize(f) for f in files),
                rows_in=int(obs.get["rows_in"]),
                rows_routed=rows_routed,
                per_sink_rows=per_sink,
                per_partition_rows=per_file,
                wall_ms=(time.monotonic() - t0) * 1000.0,
            )
        )

    # final aggregates from all committed units (derived state — always
    # consistent with the routed table, regardless of kill/resume).
    # A no-op resume (nothing processed, aggregate already written)
    # skips the rewrite: salted and unsalted paths produce identical
    # results, so the existing aggregate is still the derived state.
    stats = log.total_stats()
    agg_done = os.path.exists(os.path.join(out_dir, AGG_SUBDIR, "_SUCCESS"))
    if log.committed_units() and (todo or not agg_done):
        routed_all = read_routed(spark, out_dir)
        agg = (
            aggregate_per_sink_salted(routed_all, salt_buckets=salt_buckets)
            if salted
            else aggregate_per_sink(routed_all)
        )
        agg.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, AGG_SUBDIR))
    stats["units_processed_this_run"] = len(todo)
    return stats


def read_aggregates(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, AGG_SUBDIR))


def read_routed(spark: SparkSession, out_dir: str) -> DataFrame:
    """Consistent view of the routed table: live units + committed
    compaction packs, absorbed units excluded (pipeline/compact.py)."""
    from .compact import read_routed_consistent

    return read_routed_consistent(spark, out_dir)
