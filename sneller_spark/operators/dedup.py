"""Deduplication operators for training-data pipelines.

All of these stay JVM-side (built-in pyspark.sql.functions — no Python
UDFs at all): shingling is a higher-order array expression, hashing is
xxhash64, MinHash is a bank of min() aggregates over permuted hashes,
and LSH banding is a self-join on (band_index, band_hash).  That is the
scale path: every step is whole-stage-codegen'd and shuffles only on
band buckets (tiny), never on raw text.

Design notes for 100 TB:
  * the candidate-pair self-join is banded, so only documents sharing a
    band bucket meet in the shuffle — the classic MinHash-LSH layout;
  * `exact_dedup` hashes full normalized text and keeps min(doc_id) per
    hash group — a single hash-shuffle of (hash, id), never the text.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 31-bit Mersenne prime: (a*h + b) with a,h < 2^31 stays < 2^62, so the
# permutation arithmetic never overflows a Spark LONG under ANSI mode
_MERSENNE = (1 << 31) - 1


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups: normalized-text hash -> representative
    (min id) + duplicate count."""
    h = F.xxhash64(F.lower(F.trim(F.col(text_col))))
    return (
        df.select(F.col(id_col).alias("id"), h.alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def ngram_shingles(df: DataFrame, text_col: str, k: int = 5) -> DataFrame:
    """Add a `shingles` column: word k-grams as strings, built entirely
    with array expressions (split + transform(sequence) + slice)."""
    words = F.split(F.col(text_col), r"\s+")
    n = F.greatest(F.size(words) - F.lit(k - 1), F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    return df.withColumn("shingles", shingles)


def _perm_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def _base_hash(col_name: str):
    """xxhash64 folded into [0, 2^31): keeps downstream permutation
    products within LONG range."""
    return F.pmod(F.xxhash64(col_name), F.lit(_MERSENNE))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    shingle_k: int = 5,
) -> DataFrame:
    """MinHash signature per document: explode shingles, hash once with
    xxhash64, then n_hashes permutations h_i = (a_i*h + b_i) mod M61,
    each reduced with a min() aggregate (one shuffle, map-side
    combined)."""
    sh = ngram_shingles(df, text_col, shingle_k).select(
        F.col(id_col).alias("id"), F.explode("shingles").alias("shingle")
    )
    hashed = sh.select("id", _base_hash("shingle").alias("h"))
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_MERSENNE))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(_perm_params(n_hashes))
    ]
    return hashed.groupBy("id").agg(*aggs)


def minhash_candidate_pairs(
    sigs: DataFrame,
    n_hashes: int = 32,
    bands: int = 8,
    max_bucket_size: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """LSH banding: split the signature into `bands` bands of
    n_hashes/bands rows, hash each band, self-join on (band, hash).
    Returns candidate (id_a, id_b, n_bands_matched) with id_a < id_b.

    Degenerate-bucket guard (the 100 TB case): real corpora carry
    thousands of identical boilerplate docs; one hot (band, hash)
    bucket makes the self-join quadratic in that bucket's size.
    Buckets larger than ``max_bucket_size`` are near-certain duplicate
    cliques, so instead of all O(n²) pairs they emit O(n) star pairs
    to the bucket's representative (min id) — connectivity for
    downstream union-find is preserved, the join never goes quadratic.
    ``None`` (default) keeps the exact uncapped band-join; scale-path
    call sites (the minhash_lsh_candidates catalog entry) opt in
    explicitly.

    Contract caveat under the cap: for members of an over-cap bucket,
    ``n_bands_matched`` counts star-pair emissions (and any under-cap
    band co-occurrences), NOT the full band-match count — an
    r-of-b-style threshold on it is exact only for pairs whose shared
    buckets are all under the cap.  ``persist`` caches the banded rows
    because they feed three plans (bucket stats + both join sides);
    Spark's ContextCleaner unpersists the cache when the returned
    DataFrame is garbage-collected."""
    rows_per_band = n_hashes // bands
    band_cols = []
    for bi in range(bands):
        cols = [f"mh_{bi * rows_per_band + j}" for j in range(rows_per_band)]
        band_cols.append(F.xxhash64(*[F.col(c) for c in cols]).alias(f"band_{bi}"))
    banded = sigs.select("id", *band_cols)
    stacked = banded.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(bi).alias("band_idx"), F.col(f"band_{bi}").alias("band_hash"))
                for bi in range(bands)
            ])
        ).alias("b"),
    ).select("id", "b.band_idx", "b.band_hash")
    if persist:
        from pyspark import StorageLevel

        stacked = stacked.persist(StorageLevel.MEMORY_AND_DISK)

    if max_bucket_size is None:
        left, right = stacked.alias("l"), stacked.alias("r")
        pairs = left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        ).select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        return pairs.groupBy("id_a", "id_b").agg(
            F.count(F.lit(1)).alias("n_bands_matched")
        )

    stats = stacked.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("_bsize"), F.min("id").alias("_rep")
    )
    tagged = stacked.join(stats, ["band_idx", "band_hash"])

    small = tagged.filter(F.col("_bsize") <= max_bucket_size).select(
        "id", "band_idx", "band_hash"
    )
    left, right = small.alias("l"), small.alias("r")
    small_pairs = left.join(
        right,
        (F.col("l.band_idx") == F.col("r.band_idx"))
        & (F.col("l.band_hash") == F.col("r.band_hash"))
        & (F.col("l.id") < F.col("r.id")),
    ).select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))

    big_pairs = tagged.filter(
        (F.col("_bsize") > max_bucket_size) & (F.col("id") != F.col("_rep"))
    ).select(F.col("_rep").alias("id_a"), F.col("id").alias("id_b"))

    return (
        small_pairs.unionByName(big_pairs)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands_matched"))
    )


def dedup_keep_first(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The operation a training pipeline actually runs: return the
    SURVIVING rows — one representative (min id) per normalized-text
    group, all original columns intact.  Exactly ONE full-row shuffle
    (hash-partitioned on the 64-bit text hash) — the minimum for
    returning survivors with their columns; when only group STATS are
    needed, exact_dedup shuffles just (hash, id)."""
    from pyspark.sql import Window

    h = F.xxhash64(F.lower(F.trim(F.col(text_col))))
    w = Window.partitionBy(h).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 48,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int = 256,
    persist: bool = True,
) -> DataFrame:
    """SimHash near-dup pairs: candidate blocking on fingerprint BANDS
    (pigeonhole: two fingerprints within `max_hamming` bits differ in
    at most max_hamming bands, so with bands > max_hamming they share
    at least one identical band), then exact hamming verification via
    bit_count(xor).

    Scale + recall contract: a band is bits/bands wide (default 48/4 =
    12-bit bands, 4096 values), so popular band values still collide on
    large corpora.  Buckets above ``max_bucket_size`` switch from
    all-pairs to O(n) star pairs against the bucket's min-id
    representative, so no bucket can go quadratic — but star pairs are
    hamming-filtered like any other, so inside an over-cap bucket only
    neighbors of the representative survive: the pigeonhole recall
    guarantee holds ONLY for pairs that share at least one under-cap
    band bucket.  Widen bits/bands (more band values) before raising
    the cap; bits must stay <= 62 (the fingerprint assembles into one
    signed LONG)."""
    assert bands > max_hamming, "pigeonhole needs bands > max_hamming"
    fp = simhash_fingerprint(df, id_col, text_col, bits)
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    stacked = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.shiftright("simhash", b * band_bits).bitwiseAND(F.lit(mask)).alias("band_val"),
                )
                for b in range(bands)
            ])
        ).alias("b"),
    ).select("id", "simhash", "b.band_idx", "b.band_val")
    if persist:
        from pyspark import StorageLevel

        stacked = stacked.persist(StorageLevel.MEMORY_AND_DISK)

    stats = stacked.groupBy("band_idx", "band_val").agg(
        F.count(F.lit(1)).alias("_bsize"),
        F.min("id").alias("_rep"),
        F.min_by("simhash", "id").alias("_rep_hash"),
    )
    tagged = stacked.join(stats, ["band_idx", "band_val"])

    small = tagged.filter(F.col("_bsize") <= max_bucket_size)
    left, right = small.alias("l"), small.alias("r")
    small_pairs = left.join(
        right,
        (F.col("l.band_idx") == F.col("r.band_idx"))
        & (F.col("l.band_val") == F.col("r.band_val"))
        & (F.col("l.id") < F.col("r.id")),
    ).select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        F.col("l.simhash").alias("ha"),
        F.col("r.simhash").alias("hb"),
    )

    big_pairs = tagged.filter(
        (F.col("_bsize") > max_bucket_size) & (F.col("id") != F.col("_rep"))
    ).select(
        F.col("_rep").alias("id_a"),
        F.col("id").alias("id_b"),
        F.col("_rep_hash").alias("ha"),
        F.col("simhash").alias("hb"),
    )

    cand = small_pairs.unionByName(big_pairs).distinct()
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_fingerprint(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """SimHash: per-word xxhash64, bit-majority vote across each
    document's words, assembled into an integer fingerprint.  One
    explode + one groupBy; the 'bits' majority votes are a single agg
    list (JVM-side conditional sums)."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    ).withColumn("wh", F.xxhash64("word"))
    votes = [
        F.sum(
            F.when(F.col("wh").bitwiseAND(F.lit(1 << b)) != 0, F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"v_{b}")
        for b in range(bits)
    ]
    voted = words.groupBy("id").agg(*votes)
    fingerprint = None
    for b in range(bits):
        bit = F.when(F.col(f"v_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return voted.select("id", fingerprint.cast("long").alias("simhash"))


class ConvergenceError(RuntimeError):
    """Connected-components label propagation did not converge within
    max_iter rounds — labels would be PARTIAL (a long chain split into
    multiple components) and downstream dedup would silently keep
    extra 'representatives'."""


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
    strict: bool = True,
) -> DataFrame:
    """Connected components over candidate-pair edges: returns
    (id, component) where component = min id reachable from `id`.
    This is the step between near-dup CANDIDATE PAIRS and the cluster
    representative a training pipeline actually keeps.

    Algorithm: min-label propagation (the Pregel/GraphX CC kernel) —
    each round every node adopts the minimum label in its closed
    neighborhood — PLUS path-halving pointer jumping: after
    propagation each node shortcuts to its current representative's
    label (label := label(label)).  Labels are always node ids, so the
    shortcut is a self-join on id == component.  Propagation alone
    needs diameter rounds; with halving a chain of diameter d
    converges in O(log d) rounds (a 1000-chain in ~10, pytest-proven),
    so adversarial chain graphs — not just the star/clique graphs the
    capped banded generators emit — finish inside max_iter.  Each
    round is two shuffle joins + one map-side-combined min();
    the round result is localCheckpoint'ed — a merely CACHED iterative
    plan keeps every prior round in its lineage and the plan tree
    doubles per round, OOMing the planner after ~12 rounds.
    Checkpointing truncates lineage to O(1) per round; on a cluster
    where executor loss matters, swap reliable checkpoint() + a
    checkpoint dir for localCheckpoint.

    If the loop exhausts max_iter with labels still changing, raises
    ConvergenceError (strict=True, default) or emits a warning and
    returns the partial labels (strict=False) — never a silent
    partial result.

    The driver-side loop runs O(log diameter) Spark ACTIONS (a count
    per round) — iteration control only, never row data."""
    from pyspark import StorageLevel

    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        propagated = labels.join(
            nbr_min, labels["id"] == nbr_min["src"], "left"
        ).select(
            "id",
            F.least(
                F.col("component"), F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
        )
        # path halving: label := label(label).  component values are
        # node ids by construction, so the parent's label is found by
        # a self-join; left join keeps roots (component == id) intact.
        parents = propagated.select(
            F.col("id").alias("p_id"), F.col("component").alias("p_component")
        )
        new_labels = (
            propagated.join(parents, propagated["component"] == parents["p_id"], "left")
            .select(
                "id",
                F.coalesce("p_component", "component").alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # labels changed in the FINAL round — that round may itself
        # have reached the fixpoint, which only a quiet confirmation
        # round can establish; run one before declaring failure
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        changed = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"])
            .filter(F.col("nbr_component") < F.col("component"))
            .count()
        )
    edges.unpersist()
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter"
        )
        if strict:
            raise ConvergenceError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    return labels


def dedup_near_keep_rows(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end near-dedup: candidate pairs -> connected components
    -> keep ONE representative row (min id) per component, all other
    columns intact; rows in no pair survive untouched.  The operation
    a training pipeline runs after MinHash/SimHash/Jaccard candidate
    generation.  One broadcast-sized join against the (tiny) non-
    representative id set when components fit the driver; expressed as
    a left anti join so Spark picks broadcast vs shuffle itself."""
    comp = connected_components(pairs, "id_a", "id_b")
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def jaccard_similarity_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    min_sim: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share at least one
    shingle (inverted-index join — never a full cross join).

    Hot-shingle guard (the 100 TB case): a boilerplate k-gram shared by
    m documents contributes m² rows to the inverted-index join, so one
    stop-shingle ("terms of service use") makes the stage quadratic.
    With ``max_doc_freq`` set, shingles whose document frequency
    exceeds it are dropped BEFORE the join — the classic stop-shingle
    filter.  Contract under the cap: the metric becomes Jaccard over
    the sub-threshold shingle sets (a self-consistent stopword-removed
    similarity: both the intersection count and the per-doc set sizes
    are computed over the SAME filtered universe), and a pair is only
    discoverable if it shares at least one sub-threshold shingle.  For
    corpora where no shingle reaches the cap the result is bit-
    identical to the uncapped exact form.  ``None`` (default) keeps
    exact full-universe Jaccard."""
    sh = (
        ngram_shingles(df, text_col, shingle_k)
        .select(F.col(id_col).alias("id"), F.explode("shingles").alias("shingle"))
        .distinct()
    )
    if max_doc_freq is not None:
        from pyspark.sql import Window

        # document frequency per shingle; one extra aggregation on the
        # already-shuffled (shingle) key, then the hot tail is gone
        df_w = Window.partitionBy("shingle")
        sh = sh.withColumn("_df", F.count(F.lit(1)).over(df_w)).filter(
            F.col("_df") <= max_doc_freq
        ).drop("_df")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (
        l.join(r, (F.col("l.shingle") == F.col("r.shingle")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= min_sim)
        .select("id_a", "id_b", "n_common", "jaccard")
    )
