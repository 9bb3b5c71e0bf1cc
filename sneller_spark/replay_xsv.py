"""Replay of the reference's CSV/TSV converter test vectors.

The reference's xsv package converts delimited files to ion rows under
a hints schema (/root/reference/xsv/testdata: ``<case>.csv|.tsv`` +
``<case>-hints.json`` + expected ``<case>-{csv,tsv}.ion.json``; format
per xsv/csv.go, xsv/tsv.go, xsv/hint.go).  This module performs the
same conversion with Spark-side expressions — text scan, delimiter
split, per-field typing from the hints — and value-compares against
the reference's expected rows:

- hints ``fields``: name (dotted names nest into structs), type
  (string / int / bool with true_values/false_values / datetime with
  format ``datetime`` or ``unix_seconds``), optional ``default``.
- hints options: ``skip_records`` (header lines), ``separator``,
  ``missing_values`` (sentinel strings -> MISSING).
- empty / missing fields are OMITTED from output rows (ion MISSING),
  matching the reference's sparse output.
- the TSV flavor decodes backslash escapes inside fields
  (``\\n \\r \\t \\\\``; invalid escapes pass through verbatim,
  xsv/tsv.go) — implemented as chained JVM regexp_replace with a
  sentinel, no Python per row.

The naive delimiter split does not implement RFC4180 quoting (none of
the reference's vectors use quotes; the engine's production CSV path
is spark.read.csv which does).
"""

from __future__ import annotations

import json
import os

XSV = "/root/reference/xsv/testdata"

CASES = [
    ("test1.csv", "test1-hints.json", "test1-csv.ion.json"),
    ("test1.tsv", "test1-hints.json", "test1-tsv.ion.json"),
    ("test2.csv", "test2-hints.json", "test2-csv.ion.json"),
    ("test2.tsv", "test2-hints.json", "test2-tsv.ion.json"),
    ("test-escape.tsv", "test-escape-hints.json", "test-escape-tsv.ion.json"),
    ("test-vpclogs.csv", "test-vpclogs-hints.json", "test-vpclogs-csv.ion.json"),
]


def _tsv_unescape(col):
    """Backslash-escape decode (xsv/tsv.go): \\\\ -> \\, \\n \\r \\t ->
    control chars, anything else passes through.  The double-backslash
    is parked on a sentinel first so its trailing backslash can't fuse
    with a following character into a fake escape."""
    from pyspark.sql import functions as F

    c = F.regexp_replace(col, r"\\\\", "\x00")
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, r"\\t", "\t")
    return F.regexp_replace(c, "\x00", "\\\\")


def convert(spark, data_path: str, hints: dict):
    """Delimited file + hints -> typed DataFrame (nested per dotted
    field names), reference conversion semantics."""
    from pyspark.sql import functions as F

    sep = hints.get("separator") or (
        "\t" if data_path.endswith(".tsv") else ","
    )
    skip = int(hints.get("skip_records", 0))
    missing = set(hints.get("missing_values", []))

    rdd = spark.sparkContext.textFile(data_path)
    if skip:
        rdd = (
            rdd.zipWithIndex()
            .filter(lambda t: t[1] >= skip)
            .map(lambda t: t[0])
        )
    import re as _re

    df = spark.createDataFrame(rdd.map(lambda l: (l,)), "line string")
    parts = F.split(F.col("line"), _re.escape(sep), -1)

    cols = {}
    for i, f in enumerate(hints["fields"]):
        # try_element_at: a sparse line with fewer fields than hinted
        # yields MISSING (plain element_at throws under ANSI mode)
        raw = F.try_element_at(parts, F.lit(i + 1))
        if data_path.endswith(".tsv"):
            raw = _tsv_unescape(raw)
        raw = F.nullif(raw, F.lit(""))
        for mv in sorted(missing):
            raw = F.nullif(raw, F.lit(mv))
        if "default" in f:
            raw = F.coalesce(raw, F.lit(f["default"]))
        t = f["type"]
        if t == "string":
            v = raw
        elif t == "int":
            v = raw.cast("long")
        elif t == "bool":
            v = (
                F.when(raw.isin(list(f.get("true_values", ["true"]))), True)
                .when(raw.isin(list(f.get("false_values", ["false"]))), False)
            )
        elif t == "datetime":
            if f.get("format") == "unix_seconds":
                v = F.timestamp_seconds(raw.cast("long"))
            else:
                v = F.to_timestamp(raw)
            # RFC3339 text rendered Spark-side under the session's
            # pinned UTC — collect()'d naive datetimes would carry the
            # DRIVER's local timezone
            v = F.date_format(v, "yyyy-MM-dd'T'HH:mm:ss'Z'")
        else:
            raise ValueError(f"unsupported hint type {t!r}")
        cols[f["name"]] = v

    # dotted names nest (hint.go: field names are ion paths)
    roots: dict[str, object] = {}
    nested: dict[str, dict] = {}
    for name, v in cols.items():
        if "." in name:
            root, leaf = name.split(".", 1)
            nested.setdefault(root, {})[leaf] = v
        else:
            roots[name] = v
    out = []
    for name, v in roots.items():
        out.append(v.alias(name))
    for root, leaves in nested.items():
        out.append(
            F.struct(*[lv.alias(leaf) for leaf, lv in leaves.items()])
            .alias(root)
        )
    return df.select(*out)


def _strip_none(v):
    if isinstance(v, dict):
        d = {k: _strip_none(x) for k, x in v.items() if x is not None}
        return d or None
    return v


def _canon_row(d: dict) -> tuple:
    # timestamps were already rendered to RFC3339 text Spark-side (UTC
    # session timezone) — no driver-timezone-dependent values remain
    def c(v):
        if isinstance(v, dict):
            return tuple(sorted((k, c(x)) for k, x in v.items()))
        return v

    d = _strip_none(d) or {}
    return tuple(sorted((k, c(v)) for k, v in d.items()))


def run_case(spark, data: str, hints_file: str, expected_file: str) -> dict:
    hints = json.load(open(os.path.join(XSV, hints_file)))
    got_df = convert(spark, os.path.join(XSV, data), hints)
    got = [
        _canon_row(r.asDict(recursive=True)) for r in got_df.collect()
    ]
    exp = []
    for line in open(os.path.join(XSV, expected_file)):
        if not line.strip():
            continue
        row = json.loads(line)
        row.pop("input_file", None)  # converter-added provenance
        exp.append(_canon_row(row))
    if sorted(map(repr, got)) != sorted(map(repr, exp)):
        only_g = [r for r in got if r not in exp][:2]
        only_e = [r for r in exp if r not in got][:2]
        return {"case": data, "status": "mismatch",
                "detail": f"got-only={only_g} exp-only={only_e} "
                          f"(|got|={len(got)}, |exp|={len(exp)})"}
    return {"case": data, "status": "pass", "rows": len(got)}
