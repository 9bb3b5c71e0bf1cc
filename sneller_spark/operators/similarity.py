"""Similarity search over embedding columns (array<float>).

The reference exposes INNER_PRODUCT / L1_DISTANCE / L2_DISTANCE /
COSINE_DISTANCE as SIMD builtins (/root/reference/expr/builtin.go:227-230,
1197-1200).  Here:

  * `cosine_similarity_col` builds the dot/norm arithmetic from
    higher-order array expressions (zip_with + aggregate) — JVM-side,
    codegen'd, deterministic left-fold accumulation in double;
  * `brute_force_cosine_topk` is the exact baseline: scan + top-k
    (TakeOrderedAndProject) — O(N·d) per query, embarrassingly
    parallel, no shuffle except the final k-merge;
  * `lsh_bucketed_topk` is the scale path: sign-random-projection
    buckets (deterministic hyperplanes, seed=42) prune the scan to
    matching buckets, then exact re-rank inside the candidates.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# ---------------------------------------------------------------------
# Unrolled dot-product expression builders (optimization round 7).
#
# The fold form above (`F.aggregate(zip_with(...))`) is CodegenFallback:
# Spark evaluates it interpreted, per element, per row — measured ~50x
# slower than codegen on the near-dup pair recheck.  When the vector
# length is KNOWN (probed once from the data, or implied by a constant
# query/plane vector), the dot unrolls into a flat
# ((0.0 + a[0]*b[0]) + a[1]*b[1]) + ... expression with the SAME
# left-to-right IEEE-double accumulation order and the same null
# semantics (any null / out-of-bounds element poisons the sum to null),
# so results are bit-identical — but the flat expression whole-stage-
# codegens.  The expression is assembled as ONE SQL string parsed by a
# single F.expr() call: building it term-by-term through the Column API
# costs ~3 py4j round-trips per term (~1s of DRIVER time per 512-term
# expression), which bench.py's fn()+collect() timing pays on every
# invocation.  Double literals use 17-significant-digit exponent form,
# which the SQL parser reads as DOUBLE and round-trips exactly.
# ---------------------------------------------------------------------


_EXPR_CACHE: dict[str, Column] = {}


def _expr(sql: str) -> Column:
    """F.expr with memoization: the generated dot-product SQL strings
    are deterministic per (column, vector, dim), and ANTLR-parsing a
    ~40 KB expression string costs ~100-300 ms — paid per QUERY
    CONSTRUCTION without the cache (bench.py times construction).
    Columns are immutable and reusable across queries in one JVM."""
    col = _EXPR_CACHE.get(sql)
    if col is None:
        col = F.expr(sql)
        _EXPR_CACHE[sql] = col
    return col


def _flit(v: float) -> str:
    """Exact round-trip DOUBLE literal (exponent form parses as double,
    never decimal)."""
    return f"{float(v):.17e}"


def _dot_lits_sql(ref: str, vals) -> str:
    """SQL for dot(`ref`, constant vector) with fold-identical
    accumulation order."""
    if len(vals) == 0:
        return "0.0e0"
    terms = " + ".join(
        f"CAST({ref}[{i}] AS DOUBLE) * {_flit(v)}" for i, v in enumerate(vals)
    )
    return f"(0.0e0 + {terms})"


def _dot_cols_sql(a: str, b: str, dim: int) -> str:
    """SQL for dot(`a`, `b`) over KNOWN length with fold-identical
    accumulation order."""
    if dim == 0:
        return "0.0e0"
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(dim)
    )
    return f"(0.0e0 + {terms})"


def _ref(name: str) -> str:
    return f"`{name}`"


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a plan (for parquet scans: the file
    bytes), read driver-side in O(1) — no job.  Used to make widening
    repartitions scale-adaptive: a few-hundred-KB input pays more in
    shuffle stage overhead than the parallelism buys back, while at
    cluster scale the estimate is GBs and widening always wins.
    Unknown estimates err toward 'big' (repartition), the scale-safe
    default."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # stats unavailable: assume big
        return 1 << 62


#: below this input size a widening repartition's extra stage costs
#: more than the added parallelism saves (measured at bench sf0.1:
#: +0.3-0.5s per query on ~0.6 MB inputs, vs multi-second wins on
#: >5 MB inputs)
WIDEN_MIN_BYTES = 4 << 20


def _dot_lits_unrolled(a: Column | str, vals) -> Column:
    """Dot product of an array column with a CONSTANT vector.  Pass the
    column NAME (str) for the single-F.expr fast path; a Column falls
    back to per-term construction (same resulting expression)."""
    if isinstance(a, str):
        return _expr(_dot_lits_sql(_ref(a), vals))
    acc: Column = F.lit(0.0)
    for i, v in enumerate(vals):
        acc = acc + a.getItem(i).cast("double") * F.lit(float(v))
    return acc


def _dot_cols_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return _expr(_dot_cols_sql(_ref(a), _ref(b), dim))
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + ac.getItem(i).cast("double") * bc.getItem(i).cast("double")
    return acc


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _qnorm(query) -> float:
    """||q|| computed driver-side with the SAME left-to-right IEEE
    accumulation the old in-plan fold used (0.0 + q0*q0 + q1*q1 + ...,
    then sqrt) — bit-identical to evaluating the fold over the literal
    array in the plan."""
    import math

    acc = 0.0
    for v in query:
        acc = acc + float(v) * float(v)
    return math.sqrt(acc)


def cosine_similarity_col(vec_col: Column | str, query: list[float]) -> Column:
    dim = len(query)
    if isinstance(vec_col, str):
        r = _ref(vec_col)
        return _expr(
            f"{_dot_lits_sql(r, query)} / "
            f"(SQRT({_dot_cols_sql(r, r, dim)}) * {_flit(_qnorm(query))})"
        )
    return _dot_lits_unrolled(vec_col, query) / (
        F.sqrt(_dot_cols_unrolled(vec_col, vec_col, dim)) * F.lit(_qnorm(query))
    )


def l2_distance_col(vec_col: Column | str, query: list[float]) -> Column:
    if isinstance(vec_col, str):
        r = _ref(vec_col)
        terms = " + ".join(
            f"(CAST({r}[{i}] AS DOUBLE) - {_flit(v)})"
            f" * (CAST({r}[{i}] AS DOUBLE) - {_flit(v)})"
            for i, v in enumerate(query)
        )
        return _expr(f"SQRT(0.0e0 + {terms})" if query else "SQRT(0.0e0)")
    acc: Column = F.lit(0.0)
    for i, v in enumerate(query):
        d = vec_col.getItem(i).cast("double") - F.lit(float(v))
        acc = acc + d * d
    return F.sqrt(acc)


def brute_force_cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    sim = cosine_similarity_col(vec_col, query)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        df.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def srp_bucket_col(vec_col: Column | str, planes: np.ndarray) -> Column:
    """Sign-random-projection bucket id: one bit per hyperplane.  Each
    plane dot is the unrolled literal-coefficient form (same fold order
    as before — bit-identical sign decisions) so the whole bucket
    expression whole-stage-codegens instead of falling back to
    interpreted ArrayAggregate per plane.  With a str column name the
    whole bucket expression is ONE parsed SQL string (a Column-API
    build costs ~1s of py4j driver time for 8x64 terms)."""
    if isinstance(vec_col, str):
        r = _ref(vec_col)
        parts = " + ".join(
            f"(CASE WHEN {_dot_lits_sql(r, plane)} >= 0 THEN {1 << i} ELSE 0 END)"
            for i, plane in enumerate(planes)
        )
        return _expr(f"CAST((0 + {parts}) AS INT)")
    # Column input: the compact fold form (small-input mode) — same
    # sign decisions bit-for-bit, tiny expression tree
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(_dot(vec_col, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def lsh_bucketed_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    probe_hamming: int = 1,
    round_digits: int | None = 4,
) -> DataFrame:
    """ANN over an UN-indexed table: computes buckets at query time, so
    the scan still reads every row (pruning only saves the re-rank).
    The scale path is write_srp_index + srp_topk_pruned below, where
    the probe is a partition-pruned scan (plan-asserted in tests)."""
    planes = _hyperplanes(len(query), n_planes)
    qv = np.asarray(query, dtype=np.float64)
    qbucket = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ qv) >= 0.0))

    probes = [qbucket]
    if probe_hamming >= 1:
        probes += [qbucket ^ (1 << i) for i in range(n_planes)]

    bucketed = df.withColumn("_bucket", srp_bucket_col(vec_col, planes))
    candidates = bucketed.filter(F.col("_bucket").isin(probes))
    sim = cosine_similarity_col(vec_col, query)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        candidates.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------
# IVF (inverted-file) ANN — the cluster-then-probe scale path
# ---------------------------------------------------------------------

def ivf_assign_buckets(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    bucket_col: str = "_ivf_bucket",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max dot product over
    unit-normalized centroids), entirely with JVM array expressions —
    one greatest() over k dot products, no UDF.  At scale the table is
    written partitioned by this column, so a query scans only probed
    partitions (partition pruning == IVF inverted lists)."""
    norms = np.linalg.norm(centroids, axis=1, keepdims=True)
    unit = centroids / np.where(norms == 0, 1, norms)
    # two-step projection: materialize the k dot products ONCE in an
    # array column, then take greatest/argmax off the array items.
    # Inlining the unrolled dots directly into greatest() AND the
    # when-chain duplicates each 64-term expression ~2k times and blows
    # the 64 KB codegen method limit (janino falls back to interpreted
    # eval); the multiply-referenced alias is not collapsed by Catalyst,
    # so each dot is evaluated exactly once per row and the stage stays
    # whole-stage-codegen'd.  best/argmax semantics (greatest + first-
    # match when-chain) are unchanged.
    # one parsed SQL string for the whole k-dot array (single py4j call)
    dots_arr = _expr(
        "ARRAY(" + ", ".join(_dot_lits_sql(_ref(vec_col), c) for c in unit) + ")"
    )
    tmp = df.withColumn("_ivf_dots", dots_arr)
    k = len(unit)
    items = [F.col("_ivf_dots").getItem(i) for i in range(k)]
    best = F.greatest(*items) if k > 1 else items[0]
    bucket = F.lit(0)
    # argmax via when-chain (k is small: 8-64 centroids)
    for i in range(k - 1, -1, -1):
        bucket = F.when(items[i] == best, F.lit(i)).otherwise(bucket)
    return tmp.withColumn(bucket_col, bucket.cast("int")).drop("_ivf_dots")


def train_ivf_centroids(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    sample_rows: int = 2048,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Mini k-means on a driver-side sample (deterministic seed/order).
    The sample is tiny by design — centroids are broadcast constants,
    the full table is only ever scanned for assignment."""
    sample = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("string")))
        .limit(sample_rows)
        .collect()
    )
    x = np.asarray([list(r[0]) for r in sample], dtype=np.float64)
    rng = np.random.Generator(np.random.PCG64(seed))
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        d = x @ cent.T  # cosine-ish assignment on roughly-normalized data
        assign = d.argmax(axis=1)
        for j in range(len(cent)):
            members = x[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
    return cent


def _rank_probes(query: list[float], centroids: np.ndarray, n_probe: int) -> list[int]:
    qv = np.asarray(query, dtype=np.float64)
    norms = np.linalg.norm(centroids, axis=1)
    scores = (centroids @ qv) / np.where(norms == 0, 1, norms)
    return [int(i) for i in np.argsort(-scores)[:n_probe]]


def ivf_topk(
    df: DataFrame,
    query: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """IVF search over an UN-indexed table: assigns buckets at query
    time, so it still scans every row (candidate filter only saves the
    re-rank).  Use write_ivf_index + ivf_topk_pruned for the scale
    path, where the probe is a partition-pruned scan."""
    probes = _rank_probes(query, centroids, n_probe)
    bucketed = ivf_assign_buckets(df, centroids, vec_col)
    candidates = bucketed.filter(F.col("_ivf_bucket").isin(probes))
    sim = cosine_similarity_col(vec_col, query)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        candidates.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------
# persisted, partition-pruned indexes — the demonstrated 100 TB flow:
# write once partitioned by bucket; every query scans ONLY the probed
# partition directories (IVF inverted lists == hive partition pruning)
# ---------------------------------------------------------------------

def write_ivf_index(
    df: DataFrame,
    centroids: np.ndarray,
    path: str,
    vec_col: str = "embedding",
) -> None:
    """One-time index build: assign buckets (JVM expressions only) and
    write the table PARTITIONED BY the bucket.  At 100 TB this is one
    full pass; every subsequent query reads n_probe directories."""
    bucketed = ivf_assign_buckets(df, centroids, vec_col, bucket_col="ivf_bucket")
    bucketed.write.mode("overwrite").partitionBy("ivf_bucket").parquet(path)


def ivf_topk_pruned(
    spark,
    index_path: str,
    query: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """IVF probe against a persisted index: the isin() filter on the
    partition column becomes a PartitionFilter in the scan (asserted in
    tests/test_plan_shape.py), so only n_probe bucket directories are
    read."""
    probes = _rank_probes(query, centroids, n_probe)
    candidates = spark.read.parquet(index_path).filter(
        F.col("ivf_bucket").isin(probes)
    )
    sim = cosine_similarity_col(vec_col, query)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        candidates.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_pair_sim(
    va: Column | str, vb: Column | str, dim: int | None = None
) -> Column:
    """Pairwise cosine.  With ``dim`` known (probed once from the data)
    the three dots unroll into flat codegen'd expressions — bit-identical
    to the fold form (same accumulation order), ~50x faster per pair;
    str column names additionally build the whole thing as one parsed
    SQL string (single py4j call)."""
    if dim is None:
        va = F.col(va) if isinstance(va, str) else va
        vb = F.col(vb) if isinstance(vb, str) else vb
        return _dot(va, vb) / (_norm(va) * _norm(vb))
    if isinstance(va, str) and isinstance(vb, str):
        a, b = _ref(va), _ref(vb)
        return _expr(
            f"{_dot_cols_sql(a, b, dim)} / "
            f"(SQRT({_dot_cols_sql(a, a, dim)}) * SQRT({_dot_cols_sql(b, b, dim)}))"
        )
    return _dot_cols_unrolled(va, vb, dim) / (
        F.sqrt(_dot_cols_unrolled(va, va, dim))
        * F.sqrt(_dot_cols_unrolled(vb, vb, dim))
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT all-pairs form:
    (id_a < id_b, cos_sim >= threshold).  O(N²) by construction — use
    only on small slices or as the verification oracle for the blocked
    variant below."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    sim = F.round(cosine_pair_sim(F.col("_va"), F.col("_vb")), round_digits)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def cosine_near_dup_pairs_blocked(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    round_digits: int = 6,
    max_bucket_size: int | None = None,
    bands: int = 1,
) -> DataFrame:
    """Scale path for embedding near-dup: SRP-bucket BLOCKING — only
    vectors sharing a sign-random-projection bucket meet in the
    self-join (near-identical embeddings share all sign bits with high
    probability), then exact cosine re-check.  One shuffle on the
    bucket id, never an all-pairs cross join; the same banded-bucket
    layout as MinHash-LSH (operators/dedup.py).

    ``bands`` > 1 gives MinHash-style multi-band recall for MODERATE
    similarity: a single 8-plane bank finds a cos≈0.9 pair with
    probability only (1 - θ/π)^8 ≈ 0.29 (θ = arccos 0.9), so bands=b
    runs b independent plane banks (seeds derived from ``seed``) and a
    pair is a candidate if it shares a bucket in ANY band:
    1-(1-0.29)^b ≈ 0.97 at b=10.  Each row explodes to b (band,bucket)
    keys — shuffle volume scales linearly with b while the exact
    re-check keeps precision at 1.0; the planted-0.9-pair recall test
    lives in tests/test_operators.py.  The default bands=1 keeps the
    original single-bank plan (no explode) for the near-exact-dup
    regime where all sign bits agree anyway.

    Degenerate-bucket guard (the 100 TB case): with 8 planes there are
    only 256 buckets, and a corpus of near-identical boilerplate
    embeddings piles into ONE of them, making the self-join quadratic
    in that bucket's size.  With ``max_bucket_size`` set, buckets above
    the cap emit O(n) star candidates against the bucket's min-id
    representative instead of all O(n²) pairs — the same guard as
    minhash_candidate_pairs / simhash_near_dup_pairs.  Star candidates
    still pass the exact cosine re-check, so every emitted pair is a
    true near-dup; the recall contract under the cap is that two
    members of an over-cap bucket are linked only THROUGH the
    representative (connectivity for downstream union-find is
    preserved), not pairwise.  ``None`` (default) keeps the exact
    all-pairs-within-bucket behavior.

    The bucket id is an expensive expression (n_planes 64-element
    folds), so the bucketed rows are persisted and evaluated ONCE —
    without it both join sides recompute every dot product (measured
    multi-second on even tiny inputs: the plane-literal expression tree
    is too large for whole-stage codegen and falls back to interpreted
    eval).  The cache is released by Spark's ContextCleaner when the
    returned DataFrame is garbage-collected."""
    dim_probe = df.filter(F.col(vec_col).isNotNull()).select(
        F.size(vec_col).alias("d")
    ).first()
    if dim_probe is None or dim_probe["d"] is None:
        # empty input (or no non-null vectors): no pairs, not a crash
        from pyspark.sql import types as T

        id_t = df.schema[id_col].dataType
        empty_schema = T.StructType(
            [
                T.StructField("id_a", id_t),
                T.StructField("id_b", id_t),
                T.StructField("cos_sim", T.DoubleType()),
            ]
        )
        return df.sparkSession.createDataFrame([], empty_schema)
    from pyspark import StorageLevel

    dim = int(dim_probe["d"])
    # scale-adaptive expression mode: the unrolled flat dots win by
    # orders of magnitude once data dominates (codegen + JIT instead of
    # interpreted folds), but their ~2000-node trees cost ~0.5s of
    # analyzer/optimizer time per execution — more than a sub-4MB
    # input's entire compute.  Both forms are bit-identical (same
    # accumulation order, verified), so the switch cannot change
    # results; small inputs keep the compact fold expressions.
    big = plan_size_bytes(df) >= WIDEN_MIN_BYTES
    # per-ROW norm computed once here (N rows) instead of per PAIR in
    # the recheck (worst-case N^2/buckets pairs x 2 sides).  The pair
    # recheck then reads dot(va,vb)/(na*nb) — the same subexpressions
    # in the same order as sqrt(dot(a,a)) * sqrt(dot(b,b)) evaluated
    # inline, so cos_sim is bit-identical; it also shrinks the recheck
    # stage's generated code under the 64 KB janino method limit (the
    # inline 3-dot form fell back to interpreted eval for the whole
    # join stage).
    if big:
        nrm = _expr(f"SQRT({_dot_cols_sql(_ref(vec_col), _ref(vec_col), dim)})")
    else:
        nrm = F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        nrm.alias("_nrm"),
    )
    bucket_col = "v" if big else F.col("v")
    if bands <= 1:
        planes = _hyperplanes(dim, n_planes, seed)
        bucketed = base.withColumn("_b", srp_bucket_col(bucket_col, planes))
    else:
        # one bucket per independent plane bank; (band, bucket) composes
        # into a single join key so the cap/join logic below is band-blind
        banks = [_hyperplanes(dim, n_planes, seed + 7919 * k) for k in range(bands)]
        keys = F.array(
            *[
                srp_bucket_col(bucket_col, banks[k]) + F.lit(k << n_planes)
                for k in range(bands)
            ]
        )
        bucketed = base.withColumn("_b", F.explode(keys))
    # spread the cached bucketed rows over the full parallelism: the
    # input here is typically a handful of scan partitions (single-file
    # parquet at bench scale), and the pair-enumeration + cosine-recheck
    # join stage inherits the STREAM side's partitioning — without this
    # the most expensive stage of the query runs on ~4 tasks while the
    # other cores idle (guide §2.5 input skew / §2.6 idle capacity).
    # The shuffle moves only (id, v, _nrm, _b) — a few MB per million
    # rows — once, into the cache.  Size-adaptive: skipped below
    # WIDEN_MIN_BYTES, where the extra stage costs more than it saves
    # (measured +0.5s on a 0.6 MB input vs -25s on a 5.7 MB one).
    if plan_size_bytes(df) >= WIDEN_MIN_BYTES:
        par = df.sparkSession.sparkContext.defaultParallelism
        bucketed = bucketed.repartition(par)
    bucketed = bucketed.persist(StorageLevel.MEMORY_AND_DISK)
    if max_bucket_size is None:
        left, right = bucketed.alias("l"), bucketed.alias("r")
        cand = left.join(
            right,
            (F.col("l._b") == F.col("r._b")) & (F.col("l.id") < F.col("r.id")),
        ).select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.v").alias("va"),
            F.col("r.v").alias("vb"),
            F.col("l._nrm").alias("na"),
            F.col("r._nrm").alias("nb"),
        )
    else:
        stats = bucketed.groupBy("_b").agg(
            F.count(F.lit(1)).alias("_bsize"),
            F.min("id").alias("_rep"),
            F.min_by("v", "id").alias("_rep_v"),
            F.min_by("_nrm", "id").alias("_rep_n"),
        )
        tagged = bucketed.join(stats, "_b")
        small = tagged.filter(F.col("_bsize") <= max_bucket_size)
        left, right = small.alias("l"), small.alias("r")
        small_pairs = left.join(
            right,
            (F.col("l._b") == F.col("r._b")) & (F.col("l.id") < F.col("r.id")),
        ).select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.v").alias("va"),
            F.col("r.v").alias("vb"),
            F.col("l._nrm").alias("na"),
            F.col("r._nrm").alias("nb"),
        )
        big_pairs = tagged.filter(
            (F.col("_bsize") > max_bucket_size) & (F.col("id") != F.col("_rep"))
        ).select(
            F.col("_rep").alias("id_a"),
            F.col("id").alias("id_b"),
            F.col("_rep_v").alias("va"),
            F.col("v").alias("vb"),
            F.col("_rep_n").alias("na"),
            F.col("_nrm").alias("nb"),
        )
        cand = small_pairs.unionByName(big_pairs)
    pair_dot = (
        _expr(_dot_cols_sql("`va`", "`vb`", dim))
        if big
        else _dot(F.col("va"), F.col("vb"))
    )
    sim = F.round(pair_dot / (F.col("na") * F.col("nb")), round_digits)
    # threshold wrapped in a one-element shuffle: shuffle(array(t))[1]
    # is exactly t, but shuffle() is marked non-deterministic, so the
    # optimizer cannot push this filter down into the pair join's
    # condition.  Pushed down, the 64-term cosine is evaluated inside
    # the BroadcastHashJoin's inner match loop AND again in the project
    # above it — measured ~2x slower than evaluating it once per pair
    # in the project and filtering on the materialized column (5.1s ->
    # 2.8s at sf1.0).  The emitted rows are identical either way.
    thr = F.element_at(F.shuffle(F.array(F.lit(float(threshold)))), 1)
    out = cand.select("id_a", "id_b", sim.alias("cos_sim")).filter(
        F.col("cos_sim") >= thr
    )
    # bands == 1: a pair meets in exactly one bucket (and the capped
    # small/big bucket sets are disjoint), so pairs are already unique
    # — the dedup shuffle is only needed when multiple bands can emit
    # the same pair
    return out.distinct() if bands > 1 else out


def write_srp_index(
    df: DataFrame,
    dim: int,
    path: str,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> None:
    """SRP-LSH analog of write_ivf_index: persist partitioned by the
    sign-random-projection bucket (deterministic hyperplanes)."""
    planes = _hyperplanes(dim, n_planes, seed)
    df.withColumn("srp_bucket", srp_bucket_col(vec_col, planes)).write.mode(
        "overwrite"
    ).partitionBy("srp_bucket").parquet(path)


def srp_topk_pruned(
    spark,
    index_path: str,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Multi-probe SRP query against a persisted index: partition-
    pruned scan of the query bucket plus all buckets within
    `probe_hamming` bits."""
    planes = _hyperplanes(len(query), n_planes, seed)
    qv = np.asarray(query, dtype=np.float64)
    qbucket = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ qv) >= 0.0))
    probes = [qbucket]
    if probe_hamming >= 1:
        probes += [qbucket ^ (1 << i) for i in range(n_planes)]

    candidates = spark.read.parquet(index_path).filter(
        F.col("srp_bucket").isin(probes)
    )
    sim = cosine_similarity_col(vec_col, query)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        candidates.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
