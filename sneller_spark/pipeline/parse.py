"""Parse stage — decode token ids to text and run the grok/regex
pattern bank, fully Arrow-vectorized.

This is the Spark analog of Sneller's SIMD string kernels: the
reference compiles LIKE/SIMILAR TO/regex into NFA->DFA programs for an
AVX-512 bytecode VM (/root/reference/regexp2/Regexp2.go:14-60,
/root/reference/vm/evalbc_amd64.s); we get the same "wide kernel over
a batch" execution shape from pyarrow compute:

  * decode:  ``pc.take(vocab, flat_token_ids)`` + ``pc.binary_join``
             — two C++ kernels, zero per-row Python;
  * extract: ``pc.extract_regex`` — RE2 over the whole Arrow column.

No-match rows carry null extracted fields (Sneller's MISSING -> our
null; /root/reference/doc/sneller-SQL.md:109-143, SURVEY.md §2.2).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..vocab import PATTERN_BANK, build_vocab

# extract_regex needs named groups; keep in sync with vocab.PATTERN_BANK
_ARROW_PATTERNS: dict[str, tuple[str, str]] = {
    "level": (r"\bLEVEL=(?P<level>DEBUG|INFO|WARN|ERROR)\b", "string"),
    "code": (r"\bcode=(?P<code>\d{3})\b", "int"),
    "ip": (r"\b(?P<ip>\d{1,3}(?:\.\d{1,3}){3})\b", "string"),
    "lat_ms": (r"\blat_ms=(?P<lat_ms>\d+)\b", "int"),
}
assert set(_ARROW_PATTERNS) == set(PATTERN_BANK)

PARSED_FIELDS_SCHEMA = "level string, code int, ip string, lat_ms int"

_vocab_pa: pa.Array | None = None


def _vocab_arrow() -> pa.Array:
    global _vocab_pa
    if _vocab_pa is None:
        _vocab_pa = pa.array(build_vocab().tolist(), type=pa.string())
    return _vocab_pa


def decode_tokens_arrow(tokens: pa.Array) -> pa.Array:
    """list<int32> token ids -> utf8 decoded text, vectorized."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    words = pc.take(_vocab_arrow(), tokens.values)
    offsets = tokens.offsets
    word_lists = pa.ListArray.from_arrays(offsets, words)
    return pc.binary_join(word_lists, " ")


def extract_fields_arrow(text: pa.Array) -> dict[str, pa.Array]:
    """Run the pattern bank over decoded text; null where no match."""
    out: dict[str, pa.Array] = {}
    for name, (pattern, dtype) in _ARROW_PATTERNS.items():
        struct = pc.extract_regex(text, pattern)
        col = pc.struct_field(struct, name)
        if dtype == "int":
            col = pc.cast(col, pa.int32())
        out[name] = col
    return out


def parse_batch(pdf: pd.DataFrame, keep_text: bool = False) -> pd.DataFrame:
    """Arrow-vectorized parse of one pandas batch (used inside
    mapInPandas and directly in tests)."""
    tokens = pa.array(pdf["tokens"], type=pa.list_(pa.int32()))
    text = decode_tokens_arrow(tokens)
    fields = extract_fields_arrow(text)
    out = pdf.copy()
    if keep_text:
        out["text"] = text.to_pandas()
    for name, arr in fields.items():
        out[name] = pd.array(arr, dtype=pd.ArrowDtype(arr.type))
    return out


def parse_stage(df, keep_text: bool = False):
    """DataFrame (doc_id, tokens, n_tok, source, ...) -> same plus
    extracted pattern-bank fields (level, code, ip, lat_ms)."""
    from pyspark.sql import types as T

    fields = list(df.schema.fields)
    if keep_text:
        fields.append(T.StructField("text", T.StringType()))
    fields += [
        T.StructField("level", T.StringType()),
        T.StructField("code", T.IntegerType()),
        T.StructField("ip", T.StringType()),
        T.StructField("lat_ms", T.IntegerType()),
    ]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield parse_batch(pdf, keep_text=keep_text)

    return df.mapInPandas(run, schema=out_schema)


def decode_texts_np(token_arrays: list[np.ndarray]) -> list[str]:
    """Convenience: decode a list of numpy token arrays to strings."""
    arr = pa.array(token_arrays, type=pa.list_(pa.int32()))
    return decode_tokens_arrow(arr).to_pylist()
