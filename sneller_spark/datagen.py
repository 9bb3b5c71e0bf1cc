"""Deterministic generator for the tokenized-sequence table.

Schema (BASELINE.json ``input_hint``):
    doc_id : string        "doc-{i:010d}"
    tokens : array<int32>  length 16..512, body ids in [0, MOTIF_BASE),
                           selected rows carry embedded motif tokens
    n_tok  : int32         len(tokens) (invariant, checked in tests)
    source : string        12 sources, Zipf-like skew (syslog-a ~ 35%)

Determinism is **counter-based** (splitmix64 over (row, position, salt)),
not sequential: any row can be generated independently of any other.
That is what makes generation itself a Spark job — ``spark.range(N)``
fanned out through ``mapInPandas`` — and what makes checkpoint/resume
tests reproducible: regenerating rows [a, b) always yields identical
data regardless of partitioning.  This mirrors the reference's
"versify" deterministic data synthesizer
(/root/reference/ion/versify/generator.go:14-35) in spirit, adapted to
vectorized numpy.

Row composition (FIXTURES.md §1.1): ~70%% of rows embed exactly one
pattern-bank motif, ~10%% embed two (distinct kinds of positions),
~20%% none.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from .vocab import MOTIF_BASE, N_MOTIFS

# 12 sources with Zipf-like skew; syslog-a ~35% (FIXTURES.md §1)
SOURCES = [
    "syslog-a", "syslog-b", "nginx", "k8s", "app-api", "app-web",
    "cdn", "db", "cache", "auth", "batch", "edge",
]
SOURCE_PROBS = [0.35, 0.12, 0.10, 0.09, 0.08, 0.07, 0.06, 0.05, 0.03, 0.02, 0.02, 0.01]
_CUM = np.cumsum(SOURCE_PROBS)

MIN_LEN, MAX_LEN = 16, 512

_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_B1 = np.uint64(0xBF58476D1CE4E5B9)
_B2 = np.uint64(0x94D049BB133111EB)
_SEEDC = np.uint64(0x5EED5EED5EED5EED)


def _mix(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays."""
    with np.errstate(over="ignore"):
        z = (x + _P1).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _B1
        z = (z ^ (z >> np.uint64(27))) * _B2
        return z ^ (z >> np.uint64(31))


def _h(row: np.ndarray, salt: int, pos: np.ndarray | None = None) -> np.ndarray:
    """Counter-based hash of (row, salt[, pos]) -> uint64."""
    with np.errstate(over="ignore"):
        x = row.astype(np.uint64) * _P1 ^ np.uint64(salt) * _P3 ^ _SEEDC
        if pos is not None:
            x = x ^ pos.astype(np.uint64) * _P2
    return _mix(x)


def generate_chunk(start: int, end: int) -> pd.DataFrame:
    """Generate rows [start, end) of the tokens table as a pandas frame.

    Fully vectorized; no per-row Python in the token path.
    """
    n = end - start
    idx = np.arange(start, end, dtype=np.uint64)

    lens = (MIN_LEN + (_h(idx, 1) % np.uint64(MAX_LEN - MIN_LEN + 1))).astype(np.int64)
    total = int(lens.sum())
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])

    # flattened (row, position) grid
    ri = np.repeat(idx, lens)
    pj = np.arange(total, dtype=np.uint64) - np.repeat(offs[:-1], lens).astype(np.uint64)
    flat = (_h(ri, 2, pj) % np.uint64(MOTIF_BASE)).astype(np.int32)

    # motif embedding: u<70 -> one motif, u<80 -> two, else none
    u = (_h(idx, 3) % np.uint64(100)).astype(np.int64)
    has1 = u < 70
    has2 = (u >= 70) & (u < 80)

    # first motif: kind-weighted (level 40%, code 25%, ip 20%, lat 15%)
    # so the level-driven routing stage sees a meaningful split
    _kbase = np.array([0, 4, 20, 36], dtype=np.int64)
    _ksize = np.array([4, 16, 16, 16], dtype=np.int64)
    ku = (_h(idx, 10) % np.uint64(100)).astype(np.int64)
    k1 = np.searchsorted(np.array([40, 65, 85, 100]), ku, side="right")
    m1 = _kbase[k1] + (_h(idx, 4) % np.uint64(16)).astype(np.int64) % _ksize[k1]
    p1 = (_h(idx, 5) % lens.astype(np.uint64)).astype(np.int64)
    sel = has1 | has2
    flat[offs[:-1][sel] + p1[sel]] = (MOTIF_BASE + m1[sel]).astype(np.int32)

    # second motif: different *kind* (level/code/ip/lat) and position,
    # so the pattern bank's per-field ground truth stays unambiguous
    kind_base = np.array([0, 4, 20, 36], dtype=np.int64)
    kind_size = np.array([4, 16, 16, 16], dtype=np.int64)
    k1 = np.searchsorted(np.array([4, 20, 36, 52]), m1, side="right")
    k2 = (k1 + 1 + (_h(idx, 9) % np.uint64(3)).astype(np.int64)) % 4
    m2 = kind_base[k2] + (_h(idx, 6) % np.uint64(16)).astype(np.int64) % kind_size[k2]
    p2 = (p1 + 1 + (_h(idx, 7) % (lens - 1).astype(np.uint64)).astype(np.int64)) % lens
    flat[offs[:-1][has2] + p2[has2]] = (MOTIF_BASE + m2[has2]).astype(np.int32)

    src_u = (_h(idx, 8) % np.uint64(1_000_000)).astype(np.float64) / 1_000_000.0
    src_idx = np.searchsorted(_CUM, src_u, side="right").clip(0, len(SOURCES) - 1)
    src_arr = np.array(SOURCES, dtype=object)[src_idx]

    doc_ids = np.char.add("doc-", np.char.zfill(idx.astype("int64").astype("U10"), 10))

    tokens = np.split(flat, offs[1:-1])  # list of int32 views
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "tokens": pd.Series(tokens, dtype=object),
            "n_tok": lens.astype(np.int32),
            "source": src_arr,
        }
    )


TOKENS_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def generate_tokens_df(spark, n_rows: int, partitions: int | None = None):
    """Distributed generation: spark.range(n) -> mapInPandas(generate_chunk).

    Each task generates its own id-range independently (counter-based
    RNG), so this scales to any cluster size with zero shuffle.
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    rng = spark.range(0, n_rows, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            # ids within a mapInPandas batch are contiguous per range split
            yield generate_chunk(int(ids[0]), int(ids[-1]) + 1)

    return rng.mapInPandas(gen, schema=TOKENS_SCHEMA)


def write_tokens_table(spark, path: str, n_rows: int, partitions: int | None = None) -> None:
    """Materialize the table as parquet (stand-in for an Iceberg table —
    the Iceberg runtime jar is not in this sandbox; see
    sneller_spark.sources for the gated Iceberg writer)."""
    generate_tokens_df(spark, n_rows, partitions).write.mode("overwrite").parquet(path)
