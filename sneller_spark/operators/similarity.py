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


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_similarity_col(vec_col: Column, query: list[float]) -> Column:
    q = F.array(*[F.lit(float(v)) for v in query])
    return _dot(vec_col, q) / (_norm(vec_col) * _norm(q))


def l2_distance_col(vec_col: Column, query: list[float]) -> Column:
    q = F.array(*[F.lit(float(v)) for v in query])
    return F.sqrt(
        F.aggregate(
            F.zip_with(vec_col, q, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def brute_force_cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    sim = cosine_similarity_col(F.col(vec_col), query)
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


def srp_bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-random-projection bucket id: one bit per hyperplane."""
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
    """ANN: restrict the exact scan to SRP buckets within
    `probe_hamming` bits of the query's bucket (multi-probe), then
    exact cosine re-rank.  At scale the bucket column is precomputed
    and the table is partitioned by it, turning each query into a
    partition-pruned scan."""
    planes = _hyperplanes(len(query), n_planes)
    qv = np.asarray(query, dtype=np.float64)
    qbucket = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ qv) >= 0.0))

    probes = [qbucket]
    if probe_hamming >= 1:
        probes += [qbucket ^ (1 << i) for i in range(n_planes)]

    bucketed = df.withColumn("_bucket", srp_bucket_col(F.col(vec_col), planes))
    candidates = bucketed.filter(F.col("_bucket").isin(probes))
    sim = cosine_similarity_col(F.col(vec_col), query)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        candidates.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
