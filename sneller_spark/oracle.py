"""Pure-pandas reference implementation of the parse -> enrich ->
route -> aggregate pipeline.  This is the correctness oracle: the Spark
pipeline must reproduce its per-sink aggregate counts exactly and pass
routed-row token-array equality against it (BASELINE.json).

Deliberately written with plain pandas/re primitives (row-joined decode,
DataFrame.merge, groupby) rather than sharing the pipeline's pyarrow
kernels, so the two implementations are independent.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .lookups import (
    CATCH_ALL_SINK,
    UNKNOWN_CATEGORY,
    UNKNOWN_TENANT,
    lookup_source_pdf,
    route_rules_pdf,
)
from .vocab import PATTERN_BANK, build_vocab

ROUTED_COLUMNS = [
    "doc_id", "tokens", "n_tok", "source",
    "level", "code", "ip", "lat_ms",
    "tenant", "category", "sink_id",
]


def decode_texts(tokens: pd.Series) -> pd.Series:
    vocab = build_vocab()
    out = []
    for t in tokens:
        if t is None:
            out.append(None)  # null tokens -> null text (MISSING discipline)
        else:
            # dtype forced: np.asarray([]) defaults to float64
            out.append(" ".join(vocab[np.asarray(t, dtype=np.int64)]))
    return pd.Series(out, index=tokens.index, dtype=object)


def parse_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Decode tokens and extract the pattern-bank fields. No-match ->
    null (MISSING -> null discipline, SURVEY.md §2.2)."""
    out = pdf.copy()
    text = decode_texts(out["tokens"])
    for name, (pattern, dtype) in PATTERN_BANK.items():
        extracted = text.str.extract(pattern, flags=0, expand=False)
        if dtype == "int":
            out[name] = pd.array(
                pd.to_numeric(extracted, errors="coerce"), dtype="Int64"
            )
        else:
            out[name] = extracted
    return out


def enrich_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    lk = lookup_source_pdf()
    out = pdf.merge(lk, on="source", how="left")
    out["tenant"] = out["tenant"].fillna(UNKNOWN_TENANT)
    out["category"] = out["category"].fillna(UNKNOWN_CATEGORY)
    return out


def route_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    rules = route_rules_pdf()
    out = pdf.merge(rules, on=["category", "level"], how="left")
    out["sink_id"] = out["sink_id"].fillna(CATCH_ALL_SINK)
    return out


def aggregate_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-sink aggregates: groupBy(sink_id, source, level) ->
    count(*), sum(n_tok).  level=null groups are kept."""
    g = (
        pdf.groupby(["sink_id", "source", "level"], dropna=False)
        .agg(n_rows=("doc_id", "size"), sum_n_tok=("n_tok", "sum"))
        .reset_index()
    )
    g["level"] = g["level"].where(g["level"].notna(), None)
    g["n_rows"] = g["n_rows"].astype("int64")
    g["sum_n_tok"] = g["sum_n_tok"].astype("int64")
    return g.sort_values(["sink_id", "source", "level"], na_position="first").reset_index(
        drop=True
    )


def run_oracle(pdf: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Full pipeline over an input frame (doc_id, tokens, n_tok, source).

    Returns (routed_rows, per_sink_aggregates)."""
    routed = route_pdf(enrich_pdf(parse_pdf(pdf)))[ROUTED_COLUMNS]
    return routed, aggregate_pdf(routed)
