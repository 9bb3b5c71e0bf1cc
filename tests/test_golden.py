"""Golden-file test corpus — the reference's own test format (SQL,
`---`, input NDJSON, `---`, expected NDJSON;
/root/reference/tests/testcase.go:26-84, 408 cases under
/root/reference/vm/testdata/queries/) re-hosted on Spark SQL.

The input rows register as temp view `input`; heterogeneous rows
(fields appearing/disappearing) exercise the schemaless MISSING->null
discipline.  Comparison is an order-insensitive multiset of
canonicalized rows unless the query's top level has ORDER BY, in which
case order is asserted too.

Each case additionally runs under the invariance matrix {1 partition,
8 partitions} — the Spark analog of the reference's
parallel/shuffle/split flags (/root/reference/testquery/testquery.go:620-627).
"""

from __future__ import annotations

import datetime
import decimal
import glob
import json
import math
import os
import re

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CASES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.test")))


def _strip_comments(block: str) -> list[str]:
    # full-line `#` comments, as in the reference corpus
    # (/root/reference/tests/testcase.go): provenance notes in the
    # query section, disabled rows in the input section
    return [
        l for l in block.strip().splitlines()
        if l.strip() and not l.lstrip().startswith("#")
    ]


def _parse_case(path: str) -> tuple[str, list[str], list[dict]]:
    text = open(path).read()
    parts = re.split(r"^---$", text, flags=re.MULTILINE)
    assert len(parts) == 3, f"{path}: expected query --- input --- expected"
    query = "\n".join(_strip_comments(parts[0]))
    input_lines = _strip_comments(parts[1])
    expected = [json.loads(l) for l in _strip_comments(parts[2])]
    return query, input_lines, expected


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if v == int(v) and abs(v) < 2**53:
            return int(v)
        return round(v, 9)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    if isinstance(v, list):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    return v


def _canon_row(d: dict) -> tuple:
    return tuple(sorted((k, _canon_value(v)) for k, v in d.items()))


def _is_ordered(query: str) -> bool:
    depth = 0
    for m in re.finditer(r"[()]|ORDER\s+BY", query, flags=re.IGNORECASE):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            return True
    return False


@pytest.mark.parametrize("path", CASES, ids=[os.path.basename(p)[:-5] for p in CASES])
@pytest.mark.parametrize("partitions", [1, 8])
def test_golden(spark, path, partitions):
    query, input_lines, expected = _parse_case(path)
    rdd = spark.sparkContext.parallelize(input_lines, max(partitions, 1))
    df = spark.read.json(rdd)
    if partitions > 1:
        df = df.repartition(partitions)
    df.createOrReplaceTempView("input")
    got = [r.asDict(recursive=True) for r in spark.sql(query).collect()]

    got_c = [_canon_row(r) for r in got]
    exp_c = [_canon_row(r) for r in expected]
    if _is_ordered(query):
        assert got_c == exp_c, f"{path}: ordered mismatch"
    else:
        key = repr
        assert sorted(got_c, key=key) == sorted(exp_c, key=key), (
            f"{path}: multiset mismatch"
        )
