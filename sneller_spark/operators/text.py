"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All built-in expressions (split / size / array_intersect / regexp /
md5 / conv) — JVM-side end to end; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword banks for the n-gram/stopword heuristic
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "est", "un", "que", "pour", "dans", "avec"],
    "zh": ["de", "shi", "bu", "le", "zai", "you", "wo", "ta", "men", "zhe"],
}


def _words(text_col: Column) -> Column:
    return F.split(text_col, r"\s+")


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: score = |words ∩ stopwords(lang)| /
    |words|, argmax over languages; 'und' (undetermined) when no
    stopword hits.  array_intersect keeps the whole vote JVM-side."""
    words = _words(F.col(text_col))
    scores = [
        (
            lang,
            F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in sw])))
            / F.greatest(F.size(words), F.lit(1)),
        )
        for lang, sw in STOPWORDS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in reversed(scores):
        pred = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.withColumn("lang_pred", pred).withColumn("lang_score", F.round(best, 6))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / word / punctuation / stopword-ratio quality features."""
    text = F.col(text_col)
    words = _words(text)
    en_sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    return (
        df.withColumn("n_chars_calc", F.length(text))
        .withColumn("n_words", F.size(words))
        .withColumn(
            "avg_word_len",
            F.round(
                (F.length(text) - F.size(words) + 1) / F.greatest(F.size(words), F.lit(1)), 6
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.size(F.array_intersect(words, en_sw))
                / F.greatest(F.size(words), F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                (F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", "")))
                / F.greatest(F.length(text), F.lit(1)),
                6,
            ),
        )
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens and a BPE-ish sub-word regex
    (letter runs, digit runs, single punctuation — an approximation of
    byte-pair pre-tokenization)."""
    text = F.col(text_col)
    return df.withColumn("n_ws_tokens", F.size(_words(text))).withColumn(
        "n_bpe_tokens", F.size(F.regexp_extract_all(text, F.lit(r"([a-zA-Z]+|\d+|[^\w\s])"), 1))
    )


def document_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """128-bit content fingerprint (md5 hex) + a 16-bucket shard key
    from its top nibble — the dedup/shard handle for ingest
    (reference analog: blockfmt input ETags,
    /root/reference/ion/blockfmt/index.go:115-145)."""
    fp = F.md5(F.col(text_col))
    return df.withColumn("fingerprint", fp).withColumn(
        "shard", F.conv(F.substring(fp, 1, 1), 16, 10).cast("int")
    )


def unigram_logprob_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Corpus-unigram log-probability per document — the cheap,
    fully-distributed analog of perplexity filtering: documents whose
    words are improbable under the corpus's own unigram distribution
    (gibberish, boilerplate code, wrong-language residue) score low
    and can be cut at a quantile.

    Two passes, all JVM expressions: (1) one explode + count builds the
    unigram model (word -> count, with add-k smoothing over the
    observed vocabulary); (2) tokens join the model on the word and a
    per-doc mean of log p(w) aggregates out.  The model is a
    word-count table, orders of magnitude smaller than the corpus, so
    at 100 TB the join side stays broadcast-able for any realistic
    vocabulary (or shuffles on the word key — never on documents)."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    )
    totals = words.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    # add-k smoothing over the observed vocab; constants folded in SQL
    n_and_v = totals.agg(
        F.sum("wc").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    n_total, vocab = float(n_and_v["n"]), float(n_and_v["v"])
    denom = n_total + smoothing * vocab
    logp = F.log((F.col("wc") + F.lit(smoothing)) / F.lit(denom))
    model = totals.select("word", logp.alias("logp"))
    return (
        words.join(model, "word")
        .groupBy("id")
        .agg(
            F.round(F.avg("logp"), round_digits).alias("mean_logprob"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .select(F.col("id").alias(id_col), "mean_logprob", "n_words")
    )


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Within-document repetition metrics — the Gopher-style quality
    signals (duplicate-word fraction, most-frequent-word share,
    distinct ratio) used to cut boilerplate and degenerate generations
    from pretraining corpora.

    Everything is a row-local higher-order function over the word
    array (split/size/array_distinct/filter/aggregate): per-document
    metrics need NO shuffle at all — the 100 TB shape is a pure map
    stage that scales with partition count.  top_word_frac scans
    distinct x occurrences per row (O(n·d) on words of one document),
    which is bounded by document length, not corpus size."""
    words = F.split(F.col(text_col), r"\s+")
    n = F.size(words)
    nd = F.size(F.array_distinct(words))
    top_cnt = F.aggregate(
        F.array_distinct(words),
        F.lit(0),
        lambda acc, w: F.greatest(
            acc, F.size(F.filter(words, lambda x: x == w))
        ),
    )
    return df.select(
        F.col(id_col),
        n.alias("n_words"),
        F.round((n - nd) / n, round_digits).alias("dup_word_frac"),
        F.round(top_cnt / n, round_digits).alias("top_word_frac"),
        F.round(nd / n, round_digits).alias("distinct_ratio"),
    )


def token_ngram_topk(
    df: DataFrame,
    tokens_col: str = "tokens",
    n: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-k most frequent token n-grams across a corpus of
    pre-tokenized sequences — the token-level twin of the text
    shingle operators (contamination probes, boilerplate discovery,
    and n-gram novelty stats all start here).

    The n-gram windows are generated row-locally with
    transform(sequence(...)) + slice — a pure JVM map, no Python —
    then ONE hash aggregation on the gram key.  Sequences shorter
    than ``n`` contribute nothing (filtered up front: F.sequence
    would count backwards on a negative stop).  Count-desc with
    lexicographic gram tiebreak keeps the top-k deterministic."""
    toks = F.col(tokens_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.slice(toks, i, n),
    )
    return (
        df.filter(F.size(toks) >= n)
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(k)
    )
