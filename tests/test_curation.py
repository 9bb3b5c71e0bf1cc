"""Curation operators (operators/curation.py) vs python references."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sneller_spark.operators.curation import (
    cap_per_group,
    decontaminate,
    hash_split,
    pack_sequences,
)


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(0, 2000).select(F.col("id").alias("doc_id"))


def _py_bucket(key: str, salt: str = "") -> int:
    return int(hashlib.md5((key + salt).encode()).hexdigest()[:8], 16) % 10_000


def test_hash_split_deterministic_and_matches_python(spark, ids_df):
    got = (
        hash_split(ids_df, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
        .toPandas()
        .set_index("doc_id")["split"]
    )
    for i in (0, 1, 7, 99, 1234, 1999):
        b = _py_bucket(str(i))
        exp = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert got[i] == exp, (i, b)
    # proportions roughly honored
    frac = got.value_counts(normalize=True)
    assert abs(frac["train"] - 0.9) < 0.03
    # rerun identical (pure function of the key, not rand())
    again = (
        hash_split(ids_df, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
        .toPandas()
        .set_index("doc_id")["split"]
    )
    assert (got == again).all()


def test_hash_split_salt_changes_assignment(spark, ids_df):
    a = hash_split(ids_df, "doc_id", {"a": 0.5, "b": 0.5}).toPandas()
    b = hash_split(ids_df, "doc_id", {"a": 0.5, "b": 0.5}, salt="v2").toPandas()
    assert (a["split"] != b["split"]).any()


def test_cap_per_group(spark):
    rows = [(i, f"g{i % 3}", float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "score"])
    got = cap_per_group(df, ["grp"], "score", k=4, tiebreak_col="doc_id").toPandas()
    assert len(got) == 12
    for g, sub in got.groupby("grp"):
        assert len(sub) == 4
        # best-first: the 4 highest scores of that group
        all_scores = sorted((s for i, gg, s in rows if gg == g), reverse=True)[:4]
        assert sorted(sub["score"], reverse=True) == all_scores


def test_decontaminate_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(0, "the secret benchmark question about ancient rome empire")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (1, "intro text then the secret benchmark question about ancient rome empire copied"),
            (2, "totally unrelated document about gardening and soil health today"),
            (3, "another clean doc with its own fresh unique content entirely"),
        ],
        ["doc_id", "text"],
    )
    clean = decontaminate(train, bench, shingle_k=5, mode="clean").toPandas()
    dirty = decontaminate(train, bench, shingle_k=5, mode="contaminated").toPandas()
    assert sorted(clean["doc_id"]) == [2, 3]
    assert sorted(dirty["doc_id"]) == [1]
    # all original columns survive
    assert set(clean.columns) == {"doc_id", "text"}


def test_decontaminate_broadcast_guard(spark):
    """An oversized benchmark shingle set raises BroadcastGuardError
    (clean refusal) instead of an unguarded driver-side broadcast."""
    from sneller_spark.pipeline.enrich import BroadcastGuardError

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta epsilon zeta") for i in range(8)],
        ["bench_id", "text"],
    )
    with pytest.raises(BroadcastGuardError):
        decontaminate(train, bench, shingle_k=5, max_broadcast_shingles=5)
    # generous guard: same inputs pass untouched
    assert decontaminate(train, bench, shingle_k=5).count() == 1


def test_deterministic_sample_stable_and_subset(spark, ids_df):
    """Same (fraction, salt) selects byte-identical rows on rerun; a
    larger fraction's selection is a superset of a smaller one (hash
    cutoffs nest); different salts draw different samples."""
    from sneller_spark.operators.curation import deterministic_sample

    small = set(r[0] for r in deterministic_sample(ids_df, "id", 0.2).collect())
    again = set(r[0] for r in deterministic_sample(ids_df, "id", 0.2).collect())
    big = set(r[0] for r in deterministic_sample(ids_df, "id", 0.6).collect())
    other = set(r[0] for r in deterministic_sample(ids_df, "id", 0.2, salt="s2").collect())
    assert small == again
    assert small <= big
    assert other != small
    n = ids_df.count()
    assert abs(len(small) / n - 0.2) < 0.05 and abs(len(big) / n - 0.6) < 0.05


def test_mixture_sample_per_stratum(spark):
    """Per-stratum fractions: 1.0 keeps everything, 0.0 drops the
    stratum entirely, unlisted strata use the default."""
    from sneller_spark.operators.curation import mixture_sample

    rows = [(i, ["keep", "drop", "other"][i % 3]) for i in range(600)]
    df = spark.createDataFrame(rows, ["id", "src"])
    kept = mixture_sample(
        df, "id", "src", {"keep": 1.0, "drop": 0.0}, default_fraction=0.5
    ).toPandas()
    by = kept.groupby("src").size().to_dict()
    assert by["keep"] == 200
    assert "drop" not in by
    assert 60 < by.get("other", 0) < 140


def test_paragraph_dedup_within_and_across_docs(spark):
    """Within-doc repeats collapse to the first occurrence; a later doc
    made entirely of already-seen paragraphs comes back empty; order of
    surviving paragraphs is preserved."""
    from sneller_spark.operators.curation import paragraph_dedup

    rows = [
        (1, "alpha\n\nbeta\n\nalpha"),        # within-doc repeat of alpha
        (2, "beta\n\ngamma"),                 # beta already seen in doc 1
        (3, "alpha\n\nbeta"),                 # everything already seen
        (4, "delta"),
    ]
    got = (
        paragraph_dedup(spark.createDataFrame(rows, ["doc_id", "text"]))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[1, "text"] == "alpha\n\nbeta" and got.loc[1, "kept_paras"] == 2
    assert got.loc[2, "text"] == "gamma" and got.loc[2, "kept_paras"] == 1
    assert got.loc[3, "text"] == "" and got.loc[3, "kept_paras"] == 0
    assert got.loc[4, "text"] == "delta"
    # total surviving paragraphs == number of distinct paragraphs
    assert int(got["kept_paras"].sum()) == 4


def test_paragraph_dedup_custom_separator_and_empties(spark):
    from sneller_spark.operators.curation import paragraph_dedup

    rows = [(1, "a||b||"), (2, "b||c")]
    got = (
        paragraph_dedup(
            spark.createDataFrame(rows, ["doc_id", "text"]), sep="||"
        )
        .toPandas()
        .set_index("doc_id")
    )
    # trailing separator yields an empty paragraph -> dropped, not kept
    assert got.loc[1, "text"] == "a||b"
    assert got.loc[2, "text"] == "c"


def test_round4_operators_empty_input(spark):
    """Empty inputs return empty (correctly-typed) results, not crashes."""
    from sneller_spark.operators.curation import (
        deterministic_sample,
        mixture_sample,
        paragraph_dedup,
    )
    from sneller_spark.operators.text import repetition_metrics, token_ngram_topk

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert paragraph_dedup(empty_docs).count() == 0
    assert repetition_metrics(empty_docs).count() == 0
    assert deterministic_sample(empty_docs, "doc_id", 0.5).count() == 0
    empty_src = spark.createDataFrame([], "doc_id long, source string")
    assert mixture_sample(empty_src, "doc_id", "source", {"a": 1.0}).count() == 0
    empty_toks = spark.createDataFrame([], "doc_id long, tokens array<int>")
    assert token_ngram_topk(empty_toks).count() == 0


def test_pack_sequences_prefix_sum_bins(spark):
    rows = [(i, "s0", 600) for i in range(10)]  # 600*10 = 6000 tokens
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
    got = (
        pack_sequences(df, "n_tok", budget=2048, part_cols=["source"])
        .toPandas()
        .set_index("doc_id")["pack_bin"]
    )
    # exclusive prefix sums: 0,600,...,5400 -> floor(/2048) = 0,0,0,0(1800),
    # 1(2400)... verify against python
    acc = 0
    for i in range(10):
        assert got[i] == acc // 2048, (i, acc, got[i])
        acc += 600
    # bins fill the budget before opening a new one
    assert got.max() == (9 * 600) // 2048


def test_pack_sequences_partition_isolation(spark):
    rows = [(i, f"s{i % 2}", 1000) for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
    got = pack_sequences(df, "n_tok", budget=2048, part_cols=["source"]).toPandas()
    # each source packs independently from bin 0
    for _, sub in got.groupby("source"):
        assert sub["pack_bin"].min() == 0


def test_paragraph_dedup_hash_keys_identical_and_hashed_exchange(spark):
    """hash_keys=True must give byte-identical output to the raw-text
    path on a corpus dense with duplicate paragraphs, while the
    keep-first window's Exchange keys on xxhash64 instead of the text."""
    import numpy as np

    from sneller_spark.operators.curation import paragraph_dedup

    rng = np.random.Generator(np.random.PCG64(33))
    pool = [f"paragraph number {i} with some shared boilerplate" for i in range(20)]
    rows = []
    for d in range(60):
        k = int(rng.integers(1, 6))
        paras = [pool[int(j)] for j in rng.integers(0, len(pool), k)]
        rows.append((d, "\n\n".join(paras)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    raw = paragraph_dedup(df).toPandas().set_index("doc_id").sort_index()
    hashed_df = paragraph_dedup(df, hash_keys=True)
    hashed = hashed_df.toPandas().set_index("doc_id").sort_index()
    assert raw.equals(hashed)
    plan = hashed_df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64(_para" in plan


def test_samplers_drop_null_ids_by_contract(spark):
    """NULL ids have no stable identity to hash: both samplers drop
    them at every fraction, including fraction=1.0 (documented)."""
    from sneller_spark.operators.curation import (
        deterministic_sample,
        mixture_sample,
    )

    df = spark.createDataFrame(
        [("a", "s"), (None, "s"), ("b", "s")], ["id", "src"]
    )
    kept = deterministic_sample(df, "id", 1.0).toPandas()
    assert set(kept["id"]) == {"a", "b"}
    kept2 = mixture_sample(df, "id", "src", {"s": 1.0}).toPandas()
    assert set(kept2["id"]) == {"a", "b"}
