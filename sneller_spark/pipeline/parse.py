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

Boundary design (measured, see BENCH/BASELINE.md): the JVM<->Python
boundary dominates parse cost, and the expensive part is not the Arrow
IPC itself but the Arrow->pandas "objectification" of the list<int32>
column (one numpy object per row).  The default kernel is therefore
``mapInArrow`` — RecordBatches in, RecordBatches out, zero pandas —
measured 3.3x faster than the struct-returning ``pandas_udf`` variant
at identical results.  Because ``mapInArrow`` replaces the row set,
column pruning must be explicit: ``passthrough`` names the columns the
downstream plan needs; an aggregation-only consumer passes the narrow
set so the heavy tokens column is read once and never echoed back.
(``parse_stage_struct_udf`` keeps the pandas_udf form, where Catalyst
does that pruning automatically, as the composable/scalar variant.)

``parse_stage_jvm`` is the pure-Catalyst alternative (literal vocab
array + regexp_extract, whole-stage codegen, no Python at all).  It
produces identical results but measured 4-7x slower — Java regex plus
a per-extract re-decode — which is exactly the reference's thesis that
a vectorized kernel layer beats naive per-engine evaluation
(/root/reference/README.md:10-11).  Kept as a tested fallback for
UDF-less deployments.

No-match rows carry null extracted fields (Sneller's MISSING -> our
null; /root/reference/doc/sneller-SQL.md:109-143, SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..vocab import PATTERN_BANK, build_vocab

# extract_regex needs named groups; keep in sync with vocab.PATTERN_BANK
_ARROW_PATTERNS: dict[str, tuple[str, str]] = {
    "level": (r"\bLEVEL=(?P<level>DEBUG|INFO|WARN|ERROR)\b", "string"),
    "code": (r"\bcode=(?P<code>\d{3})\b", "int"),
    "ip": (r"\b(?P<ip>\d{1,3}(?:\.\d{1,3}){3})\b", "string"),
    "lat_ms": (r"\blat_ms=(?P<lat_ms>\d+)\b", "int"),
}
assert set(_ARROW_PATTERNS) == set(PATTERN_BANK)

PARSED_FIELDS = ["level", "code", "ip", "lat_ms"]
PARSED_STRUCT = "level string, code int, ip string, lat_ms int"

_vocab_pa: pa.Array | None = None


def _vocab_arrow() -> pa.Array:
    global _vocab_pa
    if _vocab_pa is None:
        _vocab_pa = pa.array(build_vocab().tolist(), type=pa.string())
    return _vocab_pa


def tokens_series_to_arrow(tokens: pd.Series) -> pa.ListArray:
    """pandas series of int32 numpy arrays -> arrow list<int32>,
    via one concatenate + offsets (no per-row python iteration)."""
    vals = tokens.to_numpy()
    n = len(vals)
    if n == 0:
        return pa.ListArray.from_arrays(pa.array([0], type=pa.int32()),
                                        pa.array([], type=pa.int32()))
    lens = np.fromiter((len(v) for v in vals), dtype=np.int64, count=n)
    flat = np.concatenate(vals)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(flat.astype(np.int32, copy=False), type=pa.int32()),
    )


def decode_tokens_arrow(tokens: pa.Array) -> pa.Array:
    """list<int32> token ids -> utf8 decoded text, vectorized."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    words = pc.take(_vocab_arrow(), tokens.values)
    word_lists = pa.ListArray.from_arrays(tokens.offsets, words)
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


def _fields_to_pandas(fields: dict[str, pa.Array]) -> pd.DataFrame:
    return pd.DataFrame(
        {k: pd.array(v, dtype=pd.ArrowDtype(v.type)) for k, v in fields.items()}
    )


def _parse_tokens_kernel(tokens: pd.Series) -> pd.DataFrame:
    pa.set_cpu_count(1)  # one worker per core already; avoid thread thrash
    arr = tokens_series_to_arrow(tokens)
    return _fields_to_pandas(extract_fields_arrow(decode_tokens_arrow(arr)))


def _parse_tokens_kernel_with_text(tokens: pd.Series) -> pd.DataFrame:
    pa.set_cpu_count(1)
    arr = tokens_series_to_arrow(tokens)
    text = decode_tokens_arrow(arr)
    out = _fields_to_pandas(extract_fields_arrow(text))
    out.insert(0, "text", pd.array(text, dtype=pd.ArrowDtype(pa.string())))
    return out


_udf_cache: dict[str, object] = {}


def _get_udf(keep_text: bool):
    # pandas_udf parses its DDL schema eagerly, so the udf object must
    # be built lazily (after a SparkSession exists), once per process
    key = "with_text" if keep_text else "plain"
    if key not in _udf_cache:
        if keep_text:
            _udf_cache[key] = F.pandas_udf("text string, " + PARSED_STRUCT)(
                _parse_tokens_kernel_with_text
            )
        else:
            _udf_cache[key] = F.pandas_udf(PARSED_STRUCT)(_parse_tokens_kernel)
    return _udf_cache[key]


def parse_stage_struct_udf(df: DataFrame, keep_text: bool = False) -> DataFrame:
    """Scalar-UDF form: tokens in, struct of extracted fields out.
    Catalyst prunes unused columns around it automatically; slower than
    the mapInArrow form because the serializer objectifies the list
    column into per-row numpy arrays."""
    udf = _get_udf(keep_text)
    return (
        df.withColumn("_parsed", udf("tokens"))
        .select("*", "_parsed.*")
        .drop("_parsed")
    )


def parse_stage(
    df: DataFrame, keep_text: bool = False, passthrough: list[str] | None = None
) -> DataFrame:
    """DataFrame (doc_id, tokens, n_tok, source, ...) -> passthrough
    columns plus extracted pattern-bank fields (level, code, ip,
    lat_ms).  Arrow-native end to end (mapInArrow).

    ``passthrough`` is the explicit column-pruning handle: pass the
    narrow set your consumer needs (e.g. ["doc_id", "source", "n_tok"]
    for aggregation) and the tokens column is consumed by the kernel
    without being echoed back through the IPC boundary."""
    from pyspark.sql import types as T

    in_cols = list(df.columns) if passthrough is None else list(passthrough)
    needed = list(dict.fromkeys(in_cols + ["tokens"]))
    projected = df.select(*needed)
    in_schema = {f.name: f for f in projected.schema.fields}

    fields = [in_schema[c] for c in in_cols]
    if keep_text:
        fields.append(T.StructField("text", T.StringType()))
    fields += [
        T.StructField("level", T.StringType()),
        T.StructField("code", T.IntegerType()),
        T.StructField("ip", T.StringType()),
        T.StructField("lat_ms", T.IntegerType()),
    ]
    out_schema = T.StructType(fields)
    out_names = [f.name for f in fields]

    def run(batches):
        pa.set_cpu_count(1)
        for b in batches:
            if b.num_rows == 0:
                continue
            tokens = b.column("tokens")
            if isinstance(tokens, pa.ChunkedArray):  # defensive
                tokens = tokens.combine_chunks()
            text = decode_tokens_arrow(tokens)
            extracted = extract_fields_arrow(text)
            cols = [b.column(c) for c in in_cols]
            if keep_text:
                cols.append(text)
            cols += [extracted[n] for n in PARSED_FIELDS]
            yield pa.RecordBatch.from_arrays(cols, names=out_names)

    return projected.mapInArrow(run, schema=out_schema)


# ---------------------------------------------------------------------
# pure-Catalyst alternative (no Python boundary)
# ---------------------------------------------------------------------

_JVM_PATTERNS: dict[str, tuple[str, str | None]] = {
    "level": (r"\bLEVEL=(DEBUG|INFO|WARN|ERROR)\b", None),
    "code": (r"\bcode=(\d{3})\b", "int"),
    "ip": (r"\b(\d{1,3}(?:\.\d{1,3}){3})\b", None),
    "lat_ms": (r"\blat_ms=(\d+)\b", "int"),
}


def parse_stage_jvm(df: DataFrame, keep_text: bool = False) -> DataFrame:
    """Whole-stage-codegen parse: vocab as a literal array column,
    decode via transform+element_at+array_join, extract via
    regexp_extract.  Identical semantics to parse_stage (tested); kept
    for environments where Python workers are unavailable."""
    vlit = F.lit(build_vocab().tolist())
    text = F.array_join(
        F.transform(F.col("tokens"), lambda t: F.element_at(vlit, t + F.lit(1))), " "
    )
    out = df.withColumn("_text", text)
    cols = []
    for name, (pattern, cast) in _JVM_PATTERNS.items():
        c = F.regexp_extract(F.col("_text"), pattern, 1)
        c = F.when(c == "", None).otherwise(c)
        if cast:
            c = c.cast(cast)
        cols.append(c.alias(name))
    out = out.select("*", *cols)
    return out.withColumnRenamed("_text", "text") if keep_text else out.drop("_text")


def decode_texts_np(token_arrays: list[np.ndarray]) -> list[str]:
    """Convenience: decode a list of numpy token arrays to strings."""
    arr = pa.array(token_arrays, type=pa.list_(pa.int32()))
    return decode_tokens_arrow(arr).to_pylist()


def parse_batch(pdf: pd.DataFrame, keep_text: bool = False) -> pd.DataFrame:
    """Arrow-vectorized parse of one pandas batch (kernel-level entry,
    used by unit tests and the oracle cross-check)."""
    arr = tokens_series_to_arrow(pdf["tokens"])
    text = decode_tokens_arrow(arr)
    fields = extract_fields_arrow(text)
    out = pdf.copy()
    if keep_text:
        out["text"] = text.to_pandas()
    for name, arr2 in fields.items():
        out[name] = pd.array(arr2, dtype=pd.ArrowDtype(arr2.type))
    return out


# ---------------------------------------------------------------------
# dictionary-accelerated kernel: pattern bank evaluated on the vocab
# ---------------------------------------------------------------------
#
# Every pattern in the bank matches entirely inside one token (none of
# the regexes can cross a ' ' join boundary), so "first regex match in
# the decoded text" is equivalent to "value of the earliest token whose
# *vocab word* matches".  That turns the streaming work into a pure
# integer gather: the regex bank runs ONCE over the 32k-word vocabulary
# (the dictionary), producing per-field value tables; per batch we only
# look up token ids.  This is dictionary-encoded predicate pushdown —
# the same trick parquet readers use on dictionary pages, and the
# moral twin of zion's evaluate-on-the-compressed-form design
# (/root/reference/ion/zion/doc.go:15-29).  The regex kernel above
# remains the semantic source of truth; equality is enforced in tests.

_dict_tables: dict[str, tuple[np.ndarray, np.ndarray]] | None = None


def _pattern_can_match_space(pattern: str) -> bool:
    """Statically decide whether a regex match (group 0) could ever
    consume the join separator ' ', by walking the sre parse tree.
    Sound for the constructs it knows; anything unknown (backrefs,
    future opcodes) conservatively counts as "can match", which makes
    the dict kernel refuse rather than silently diverge."""
    from re import _parser as sre

    SPACE = ord(" ")

    def atom(op, av) -> bool:
        if op is sre.LITERAL:
            return av == SPACE
        if op is sre.NOT_LITERAL:
            return av != SPACE
        if op is sre.RANGE:
            return av[0] <= SPACE <= av[1]
        if op is sre.CATEGORY:
            # space is: whitespace, a non-word char, a non-digit char
            return av in (
                sre.CATEGORY_SPACE,
                sre.CATEGORY_NOT_WORD,
                sre.CATEGORY_NOT_DIGIT,
            )
        if op is sre.ANY:
            return True  # '.' matches ' '
        return True  # unknown atom: conservative

    def walk(items) -> bool:
        for op, av in items:
            if op in (sre.LITERAL, sre.NOT_LITERAL, sre.RANGE, sre.CATEGORY, sre.ANY):
                if atom(op, av):
                    return True
            elif op is sre.IN:
                members = av
                if members and members[0][0] is sre.NEGATE:
                    if not any(atom(o, a) for o, a in members[1:]):
                        return True
                elif any(atom(o, a) for o, a in members):
                    return True
            elif op in (sre.MAX_REPEAT, sre.MIN_REPEAT):
                if walk(av[2]):
                    return True
            elif op is sre.SUBPATTERN:
                if walk(av[3]):
                    return True
            elif op is sre.BRANCH:
                if any(walk(b) for b in av[1]):
                    return True
            elif op is sre.AT:
                pass  # anchors (\b, ^, $) consume nothing
            elif op in (sre.ASSERT, sre.ASSERT_NOT):
                pass  # lookaround content is not part of group 0
            else:
                return True  # GROUPREF / unknown: conservative
        return False

    return walk(sre.parse(pattern))


def _token_boundary_safe(pattern: str) -> bool:
    """The equivalence only holds if the pattern cannot match a string
    containing the join separator (space) — proven statically, not by
    probing."""
    return not _pattern_can_match_space(pattern)


def _build_dict_tables() -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """field -> (matched_mask[VOCAB_SIZE], value[VOCAB_SIZE]) computed
    by running the SAME arrow regex bank over the vocabulary."""
    global _dict_tables
    if _dict_tables is not None:
        return _dict_tables
    vocab_arr = _vocab_arrow()
    tables: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for name, (pattern, dtype) in _ARROW_PATTERNS.items():
        assert _token_boundary_safe(PATTERN_BANK[name][0]), name
        struct = pc.extract_regex(vocab_arr, pattern)
        col = pc.struct_field(struct, name)
        mask = pc.is_valid(col).to_numpy(zero_copy_only=False)
        if dtype == "int":
            vals = pc.cast(col, pa.int32()).to_numpy(zero_copy_only=False)
            vals = np.where(mask, vals, 0).astype(np.int32)
        else:
            vals = np.asarray(col.to_pylist(), dtype=object)
        tables[name] = (mask, vals)
    _dict_tables = tables
    return tables


def extract_fields_dict(tokens: pa.ListArray) -> dict[str, pa.Array]:
    """Gather-based extraction: identical results to
    extract_fields_arrow(decode_tokens_arrow(tokens)) for the built-in
    pattern bank (tested), ~no string materialization at all.

    Empty and null token rows yield null fields (same as the regex
    kernel).  reduceat cannot take a start index == len(values), so
    the per-row min runs only over non-empty, non-null segments and the
    results are scattered back; ids are clipped defensively because the
    Arrow spec allows null slots to carry arbitrary offset ranges."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    tables = _build_dict_tables()
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    starts, ends = offsets[:-1], offsets[1:]
    n = len(starts)
    # offsets are ABSOLUTE indexes into the (unsliced) child values
    # buffer; for a sliced ListArray the window [lo, hi) is a proper
    # sub-range of values — hits must be searched in that window only,
    # or pre-slice elements map to out-of-range rows (negative /
    # past-the-end indexes) and corrupt the scatter
    lo = int(offsets[0]) if len(offsets) else 0
    hi = int(offsets[-1]) if len(offsets) else 0
    total = hi - lo

    row_ok = ends > starts
    if tokens.null_count:
        row_ok &= ~tokens.is_null().to_numpy(zero_copy_only=False)

    def _all_null(dtype: str) -> pa.Array:
        t = pa.int32() if dtype == "int" else pa.string()
        return pa.nulls(n, type=t)

    if total == 0 or not row_ok.any():
        return {name: _all_null(dt) for name, (_, dt) in _ARROW_PATTERNS.items()}

    vocab_size = len(_vocab_arrow())
    ids = tokens.values.to_numpy(zero_copy_only=False)

    # sparse hit extraction: in log-like data almost no token matches
    # any pattern, so do ONE full-width pass (combined any-field mask,
    # take(mode='clip') doubles as the out-of-vocab guard) to find hit
    # positions; all per-field work then runs over the tiny hit set
    # instead of four full-width gather+reduceat passes (measured ~5.5x
    # on the generated corpus, identical results)
    any_mask = np.zeros(vocab_size, dtype=bool)
    for mask_tab, _ in tables.values():
        any_mask |= mask_tab
    window = ids[lo:hi]
    hit_pos = lo + np.flatnonzero(any_mask.take(window, mode="clip"))
    hit_ids = np.clip(ids[hit_pos], 0, vocab_size - 1)
    # row of each hit: offsets[i] <= pos < offsets[i+1]; 'right' lands
    # after any zero-width (empty) segments at the same offset
    hit_row = np.searchsorted(offsets, hit_pos, side="right") - 1

    out: dict[str, pa.Array] = {}
    for name, (mask_tab, val_tab) in tables.items():
        sel = mask_tab[hit_ids]
        row_f = hit_row[sel]
        # hits are in ascending position order, so the first occurrence
        # per row is the row's earliest match
        urow, first_idx = np.unique(row_f, return_index=True)
        first_ids = hit_ids[sel][first_idx]

        valid = np.zeros(n, dtype=bool)
        valid[urow] = True
        valid &= row_ok  # null rows stay null even if their slot range
        #                  carries garbage values (Arrow allows that)
        dtype = _ARROW_PATTERNS[name][1]
        if dtype == "int":
            vals = np.zeros(n, dtype=np.int32)
            vals[urow] = val_tab[first_ids]
            vals = np.where(valid, vals, 0).astype(np.int32)
            out[name] = pa.array(vals, mask=~valid, type=pa.int32())
        else:
            gathered = np.full(n, None, dtype=object)
            gathered[urow] = val_tab[first_ids]
            gathered = np.where(valid, gathered, None)
            out[name] = pa.array(gathered, type=pa.string())
    return out


def parse_stage_dict(
    df: DataFrame, passthrough: list[str] | None = None
) -> DataFrame:
    """mapInArrow parse using the dictionary-accelerated kernel."""
    from pyspark.sql import types as T

    in_cols = list(df.columns) if passthrough is None else list(passthrough)
    needed = list(dict.fromkeys(in_cols + ["tokens"]))
    projected = df.select(*needed)
    in_schema = {f.name: f for f in projected.schema.fields}
    fields = [in_schema[c] for c in in_cols] + [
        T.StructField("level", T.StringType()),
        T.StructField("code", T.IntegerType()),
        T.StructField("ip", T.StringType()),
        T.StructField("lat_ms", T.IntegerType()),
    ]
    out_schema = T.StructType(fields)
    out_names = [f.name for f in fields]

    def run(batches):
        pa.set_cpu_count(1)
        for b in batches:
            if b.num_rows == 0:
                continue
            tokens = b.column("tokens")
            if isinstance(tokens, pa.ChunkedArray):
                tokens = tokens.combine_chunks()
            extracted = extract_fields_dict(tokens)
            cols = [b.column(c) for c in in_cols] + [extracted[n] for n in PARSED_FIELDS]
            yield pa.RecordBatch.from_arrays(cols, names=out_names)

    return projected.mapInArrow(run, schema=out_schema)
