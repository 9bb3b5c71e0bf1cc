"""Training-data curation operators: deterministic splits, per-group
caps, benchmark decontamination, and sequence packing.

These are the operations a 100 TB training-data pipeline runs between
dedup and the trainer.  All of them are pure JVM expressions (md5 /
window / join — no Python anywhere), so they whole-stage-codegen and
scale with partition count:

  * hash_split: split membership must be a PURE FUNCTION of the row
    key — never rand(): reruns, resumes and late-arriving shards must
    route every doc to the same split on every run (the same
    determinism contract as the reference's partition assignment,
    /root/reference/plan/unionmap.go:208-341);
  * cap_per_group: "at most k docs per language by quality" — one
    window shuffle on the group key;
  * decontaminate: drop training docs that share n-gram shingles with
    an evaluation/benchmark set — a broadcast-able semi-join on
    shingle values (the benchmark side is tiny by construction);
  * pack_sequences: assign token sequences to fixed-budget training
    bins by prefix sum within each source partition — the
    embarrassingly-parallel approximation of greedy sequence packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import ngram_shingles

# md5 -> first 8 hex chars -> int: 2^32 uniform buckets, identical
# arithmetic available in ANSI SQL/DuckDB ('0x'||hex)::BIGINT, so the
# split is oracle-checkable (unlike xxhash64, which no other engine
# reproduces)
_SPLIT_BUCKETS = 10_000


def split_bucket_col(key, salt: str = ""):
    """Deterministic bucket in [0, 10000) from md5 of (key || salt)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _SPLIT_BUCKETS).cast(
        "int"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add a `split` column ('train'/'val'/'test'/...) assigned by
    deterministic hash bucketing over `id_col`.  Weights must sum to
    1.0 (±1e-9); boundaries are cumulative over insertion order."""
    total = sum(weights.values())
    assert abs(total - 1.0) < 1e-9, f"weights must sum to 1, got {total}"
    bucket = split_bucket_col(F.col(id_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * _SPLIT_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep at most k rows per group, best-first by `order_col`
    (ties broken deterministically by `tiebreak_col`).  One window
    shuffle on the group key — the per-class cap every curation
    pipeline applies before training."""
    order = [F.desc(order_col) if descending else F.asc(order_col)]
    if tiebreak_col:
        order.append(F.asc(tiebreak_col))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    mode: str = "clean",
    max_broadcast_shingles: int = 5_000_000,
) -> DataFrame:
    """Benchmark decontamination: remove (mode='clean') or report
    (mode='contaminated') training docs sharing at least one word
    k-gram with ANY benchmark doc.

    Scale shape: both sides shingle via array expressions; the join is
    on the shingle VALUE, and the benchmark side is small by
    construction (eval sets are thousands of docs, not billions), so
    Spark broadcasts it — the training side is never shuffled.  An
    anti/semi join keeps only train-side columns and stops probing a
    row at its first match.

    The broadcast is GUARDED (same discipline as the enrich/route
    stages): a pathologically large benchmark shingle set raises
    BroadcastGuardError cleanly (a limit-capped count probe, not a
    full count) instead of OOMing the driver mid-broadcast."""
    from ..pipeline.enrich import assert_broadcastable

    t_sh = ngram_shingles(train, text_col, shingle_k).select(
        F.col(id_col), F.explode("shingles").alias("shingle")
    )
    b_sh = (
        ngram_shingles(benchmark, text_col, shingle_k)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    # eval sets shingle to ~#docs * #words rows; the default guard sits
    # well above any real benchmark but far below driver-OOM territory
    assert_broadcastable(b_sh, max_rows=max_broadcast_shingles)
    hit_ids = (
        t_sh.join(F.broadcast(b_sh), "shingle", "left_semi").select(id_col).distinct()
    )
    if mode == "contaminated":
        return train.join(hit_ids, id_col, "left_semi")
    return train.join(hit_ids, id_col, "left_anti")


def pack_sequences(
    df: DataFrame,
    len_col: str = "n_tok",
    budget: int = 2048,
    part_cols: list[str] | None = None,
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each sequence to a training bin by EXCLUSIVE prefix sum
    of its length within (part_cols, ordered by order_col):
    bin = floor(prefix_sum / budget).

    This is the parallel approximation of greedy sequence packing: a
    bin may overshoot `budget` by at most (max sequence length - 1)
    when a sequence straddles the boundary, and a single over-budget
    sequence still gets a bin.  True first-fit packing is inherently
    sequential per partition; this prefix-sum form is one window
    shuffle, deterministic, and what throughput-oriented packers use.
    Returns the input plus `pack_bin`."""
    part_cols = part_cols or []
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.asc(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix_excl = F.sum(F.col(len_col)).over(w) - F.col(len_col)
    return df.withColumn(
        "pack_bin", F.floor(prefix_excl / F.lit(budget)).cast("int")
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    hash_keys: bool = False,
) -> DataFrame:
    """Corpus-wide PARAGRAPH-level exact dedup — the sub-document
    dedup step real pretraining pipelines run after doc-level dedup
    (boilerplate headers/footers/license blocks repeat across
    otherwise-unique pages): split every document on ``sep``, keep
    only the globally FIRST occurrence of each distinct paragraph
    (ordered by (id, paragraph position) — deterministic, resume-
    safe), drop empty paragraphs, and reassemble each document from
    its surviving paragraphs in original order.

    Returns (id_col, text_col, kept_paras); documents whose every
    paragraph was seen earlier come back with '' and kept_paras 0 so
    a downstream filter can drop or flag them.

    Scale shape: one explode, ONE shuffle keyed on the paragraph text
    (the keep-first window), one groupBy on the doc id for
    reassembly.  Paragraph-key skew (an empire of identical ''
    boilerplate) is bounded because the window computes only
    row_number over each key.  At 100 TB pass ``hash_keys=True``: the
    keep-first window keys on xxhash64(paragraph) so the Exchange
    carries an 8-byte key instead of the full paragraph text (the text
    still travels once as payload for reassembly — the savings is the
    sort/compare key and the hash-partitioner input, which dominate
    shuffle CPU).  xxhash64 collisions (~2^-64 per pair) would merge
    two distinct paragraphs; at pretraining corpus sizes (~2^40 paras)
    the birthday bound keeps expected collisions ≪ 1, the standard
    trade every MinHash-based pipeline already makes.  Default stays
    raw text so the DuckDB oracle reproduces it exactly; pytest proves
    both modes identical on a duplicated-paragraph corpus."""
    import re as _re

    paras = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
            "_pos", "_para"
        ),
    ).filter(F.length("_para") > 0)
    key = F.xxhash64("_para") if hash_keys else F.col("_para")
    w = Window.partitionBy(key).orderBy(F.asc("_id"), F.asc("_pos"))
    kept = paras.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
        lambda s: s["_para"],
    )
    agg = kept.groupBy("_id").agg(
        F.array_join(ordered, sep).alias("_text"),
        F.count(F.lit(1)).alias("_kept"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("_text", F.lit("")).alias(text_col),
            F.coalesce("_kept", F.lit(0)).alias("kept_paras"),
        )
    )


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Down-sample to ~`fraction` of rows as a PURE FUNCTION of the row
    key — the same never-rand() contract as hash_split: reruns,
    resumes, and late-arriving shards keep or drop exactly the same
    rows, and two pipelines sampling with the same salt select the
    same subset (so features computed in separate jobs line up).
    Change `salt` to draw an independent sample.  Pure map stage: no
    shuffle, no state, scales with partition count.

    Rows with a NULL `id_col` have no stable identity to hash, so no
    deterministic keep/drop decision exists for them — they are ALWAYS
    DROPPED (md5(NULL) is NULL and the bucket comparison filters the
    row).  Fill or synthesize ids upstream if NULL-keyed rows must
    participate; the explicit contract keeps membership a pure
    function of the key."""
    assert 0.0 <= fraction <= 1.0, fraction
    cut = int(round(fraction * _SPLIT_BUCKETS))
    return df.filter(split_bucket_col(F.col(id_col), salt) < cut)


def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the 'data mixture' knob of
    a pretraining pipeline (keep 100% of wiki, 10% of crawl, 0% of the
    rest), with the same pure-hash membership contract as
    deterministic_sample.  Strata absent from `fractions` fall back to
    `default_fraction`.  The per-stratum cutoff is a CASE expression
    over the (tiny, driver-side) fractions dict — still a pure map
    stage, no shuffle, no join.  NULL `id_col` rows are always dropped
    (same contract and rationale as deterministic_sample)."""
    bucket = split_bucket_col(F.col(id_col), salt)
    cut = F.lit(int(round(default_fraction * _SPLIT_BUCKETS)))
    for name, frac in fractions.items():
        assert 0.0 <= frac <= 1.0, (name, frac)
        cut = F.when(
            F.col(stratum_col) == name, int(round(frac * _SPLIT_BUCKETS))
        ).otherwise(cut)
    return df.filter(bucket < cut)
