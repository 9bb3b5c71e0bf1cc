"""Randomized shape/null stress — the analog of the reference's
versify fuzzer (/root/reference/ion/versify/generator.go:14-35), which
generates look-alike data to shake out scan edge cases the fixed corpus
can't reach.

Each seeded case builds an adversarial frame (empty token arrays,
length-1 rows, boundary token ids, motifs at first/last position,
adjacent motifs, duplicate doc_ids, the occasional null source) and runs
it through the FULL pipeline — both parse kernels — comparing routed
rows (token-array equality per BASELINE.json) and per-sink aggregates
against the independent pandas oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sneller_spark.datagen import SOURCES, TOKENS_SCHEMA
from sneller_spark.oracle import run_oracle
from sneller_spark.pipeline.runner import transform
from sneller_spark.vocab import MOTIF_BASE, N_MOTIFS, VOCAB_SIZE

N_CASES = 12
ROWS_PER_CASE = 120


def _random_frame(seed: int, n: int = ROWS_PER_CASE) -> pd.DataFrame:
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for i in range(n):
        shape = rng.integers(0, 10)
        if shape == 0:
            toks = np.array([], dtype=np.int32)  # empty tokens
        elif shape == 1:
            toks = rng.integers(0, MOTIF_BASE + N_MOTIFS, size=1).astype(np.int32)
        elif shape == 2:  # all-motif row (adjacent motifs)
            toks = (MOTIF_BASE + rng.integers(0, N_MOTIFS, size=rng.integers(2, 6))).astype(np.int32)
        elif shape == 3:  # boundary ids
            toks = np.array(
                [0, MOTIF_BASE - 1, MOTIF_BASE, VOCAB_SIZE - 1], dtype=np.int32
            )
        else:
            ln = int(rng.integers(1, 40))
            toks = rng.integers(0, MOTIF_BASE, size=ln).astype(np.int32)
            if shape in (4, 5):  # motif at first / last position
                pos = 0 if shape == 4 else ln - 1
                toks[pos] = MOTIF_BASE + int(rng.integers(0, N_MOTIFS))
            elif shape == 6 and ln >= 2:  # two adjacent motifs mid-row
                p = int(rng.integers(0, ln - 1))
                toks[p] = MOTIF_BASE + int(rng.integers(0, N_MOTIFS))
                toks[p + 1] = MOTIF_BASE + int(rng.integers(0, N_MOTIFS))
        # duplicate doc ids on purpose (shape 7)
        doc_id = f"doc-{i:06d}" if shape != 7 else "doc-dup"
        source = SOURCES[int(rng.integers(0, len(SOURCES)))]
        rows.append((doc_id, toks, np.int32(len(toks)), source))
    return pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])


def _canon_routed(pdf: pd.DataFrame) -> list[tuple]:
    cols = ["doc_id", "n_tok", "source", "level", "code", "ip", "lat_ms",
            "tenant", "category", "sink_id"]
    out = []
    for _, r in pdf.iterrows():
        key = tuple(None if pd.isna(v) else v for v in (r[c] for c in cols))
        toks = tuple(int(t) for t in (r["tokens"] if r["tokens"] is not None else ()))
        out.append(key + (toks,))
    return sorted(out)


def _canon_agg(pdf: pd.DataFrame) -> list[tuple]:
    out = []
    for _, r in pdf.iterrows():
        out.append((
            r["sink_id"], r["source"],
            None if pd.isna(r["level"]) else r["level"],
            int(r["n_rows"]), int(r["sum_n_tok"]),
        ))
    return sorted(out, key=lambda t: tuple("" if v is None else str(v) for v in t))


@pytest.mark.parametrize("seed", range(N_CASES))
@pytest.mark.parametrize("kernel", ["dict", "regex"])
def test_random_shapes_match_oracle(spark, seed, kernel):
    pdf = _random_frame(seed)
    exp_routed, exp_agg = run_oracle(pdf)

    df = spark.createDataFrame(pdf, schema=TOKENS_SCHEMA)
    routed = transform(spark, df, kernel=kernel).toPandas()
    assert _canon_routed(routed) == _canon_routed(exp_routed), f"seed={seed}"

    from sneller_spark.pipeline.aggregate import aggregate_per_sink_salted

    got_agg = aggregate_per_sink_salted(
        transform(spark, df, kernel=kernel)
    ).toPandas()
    assert _canon_agg(got_agg) == _canon_agg(exp_agg), f"seed={seed}"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_paragraph_dedup_invariants_random(spark, seed):
    """Random multi-paragraph corpora: (1) the multiset of surviving
    paragraphs equals the distinct paragraphs of the input; (2) each
    doc's survivors appear in their original relative order; (3) every
    paragraph survives in the doc where it FIRST appeared."""
    from sneller_spark.operators.curation import paragraph_dedup

    rng = np.random.Generator(np.random.PCG64(seed))
    pool = [f"para-{i}" for i in range(12)]
    rows = []
    for doc_id in range(20):
        k = int(rng.integers(1, 6))
        paras = [pool[int(i)] for i in rng.integers(0, len(pool), size=k)]
        rows.append((doc_id, "\n\n".join(paras)))
    got = (
        paragraph_dedup(spark.createDataFrame(rows, ["doc_id", "text"]))
        .toPandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )

    # python reference: keep first (doc, pos) occurrence of each para
    first_doc: dict[str, tuple[int, int]] = {}
    for doc_id, text in rows:
        for pos, p in enumerate(text.split("\n\n")):
            if p and p not in first_doc:
                first_doc[p] = (doc_id, pos)
    expect: dict[int, str] = {d: "" for d, _ in rows}
    for doc_id, text in rows:
        kept = [
            p for pos, p in enumerate(text.split("\n\n"))
            if p and first_doc[p] == (doc_id, pos)
        ]
        expect[doc_id] = "\n\n".join(kept)
    assert got == expect
