"""Replay the elasticproxy's recorded response-assembly artifacts.

The reference ships, for each Kibana dashboard capture, the full
five-step trail (request → SQL → ION → JSON rows → processed tree →
final Elastic response).  `sneller_spark.adapters.elastic_response`
re-derives steps 4 and 5 natively; this test replays every recorded
case exactly the way the Go harness does
(ref: elasticproxy/elastic-proxy/elastic_json_test.go:138-375):

* ``test-preprocess``:  pre_process(0-input) == 0-output
* ``testdata-new``:     convert_result(0-input, 3-output) == (5-result,
  4-processed) with TypeMapping {timestamp: datetime}, index
  kibana_sample_data_flights (elastic_json_test.go:380-395)
* ``testdata-news``:    same with TypeMapping {title: text,
  fields {keyword, raw}}, index news (elastic_json_test.go:398-418)

Pure driver-side JSON — no SparkSession needed.
"""
from __future__ import annotations

import json
import math
import os
from pathlib import Path

import pytest

from sneller_spark.adapters.elastic_response import (
    convert_result,
    parse_timestamps,
    pre_process,
    processed_to_json,
)

REF = Path(os.environ.get("SNELLER_REF", "/root/reference"))
PROXY = REF / "elasticproxy" / "elastic-proxy"

pytestmark = pytest.mark.skipif(
    not PROXY.is_dir(), reason="reference elasticproxy artifacts not present")


def _load(p: Path):
    return json.loads(p.read_text())


def _norm(v, path=""):
    """JSON-normalize for comparison: round-trip floats, treat int==float."""
    if isinstance(v, dict):
        return {k: _norm(x, f"{path}.{k}") for k, x in v.items()}
    if isinstance(v, list):
        return [_norm(x, f"{path}[{i}]") for i, x in enumerate(v)]
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and v.is_integer() and abs(v) < 2**53:
        return int(v)
    return v


def _assert_json_equal(got, want, label):
    got = _norm(json.loads(json.dumps(got)))
    want = _norm(want)
    if got != want:
        diffs = []

        def walk(a, b, p):
            if type(a) is not type(b) and not (
                    isinstance(a, (int, float)) and isinstance(b, (int, float))):
                diffs.append(f"{p}: type {type(a).__name__} != {type(b).__name__}"
                             f" ({a!r} vs {b!r})")
            elif isinstance(a, dict):
                for k in sorted(set(a) | set(b)):
                    if k not in a:
                        diffs.append(f"{p}.{k}: missing in got (want {b[k]!r})")
                    elif k not in b:
                        diffs.append(f"{p}.{k}: extra in got ({a[k]!r})")
                    else:
                        walk(a[k], b[k], f"{p}.{k}")
            elif isinstance(a, list):
                if len(a) != len(b):
                    diffs.append(f"{p}: len {len(a)} != {len(b)}")
                for i, (x, y) in enumerate(zip(a, b)):
                    walk(x, y, f"{p}[{i}]")
            elif isinstance(a, float) or isinstance(b, float):
                if not math.isclose(float(a), float(b), rel_tol=1e-12,
                                    abs_tol=1e-12):
                    diffs.append(f"{p}: {a!r} != {b!r}")
            elif a != b:
                diffs.append(f"{p}: {a!r} != {b!r}")

        walk(got, want, "$")
        raise AssertionError(
            f"{label}: {len(diffs)} difference(s):\n" + "\n".join(diffs[:40]))


# --------------------------------------------------------------------------
# test-preprocess corpus (elastic_json_test.go:138-172)

def _cases(folder, suffix):
    d = PROXY / folder
    return sorted(p.name[: -len(suffix)]
                  for p in d.glob(f"*{suffix}"))


@pytest.mark.parametrize("case", _cases("test-preprocess", "-input.json"))
def test_preprocess_corpus(case):
    d = PROXY / "test-preprocess"
    raw = parse_timestamps(_load(d / f"{case}-input.json"))
    want = _load(d / f"{case}-output.json")
    got = processed_to_json(pre_process(raw))
    _assert_json_equal(got, want, f"test-preprocess/{case}")


# --------------------------------------------------------------------------
# testdata-new / testdata-news full step-3 → step-4/5 replay

CORPORA = {
    # (folder, index, type_mapping) — elastic_json_test.go:380-418
    "testdata-new": (
        "kibana_sample_data_flights",
        {"timestamp": {"type": "datetime"}},
    ),
    "testdata-news": (
        "news",
        {"title": {"type": "text",
                   "fields": {"keyword": "keyword",
                              "raw": "keyword-ignore-case"}}},
    ),
}


def _replay_cases():
    out = []
    for folder in CORPORA:
        for case in _cases(folder, "-0-input.json"):
            if (PROXY / folder / f"{case}-3-output.json").exists() and \
               (PROXY / folder / f"{case}-5-result.json").exists():
                out.append((folder, case))
    return out


# One recorded capture predates the proxy's unmapped-datetime formatOut
# fallback (type_format.go:141-144): its hit `_id`s hash `published_at`
# as a raw RFC3339 time.Time, where the checked-in code (and every other
# news capture, e.g. regex-title-*) hashes the ".000Z"-formatted string.
# We implement the current code and verify the stale ids under the old
# convention instead of skipping them.
_STALE_ID_VINTAGE = {("testdata-news", "normal-title-text")}


@pytest.mark.parametrize("folder,case", _replay_cases())
def test_convert_result_replay(folder, case):
    index, type_mapping = CORPORA[folder]
    d = PROXY / folder
    body = _load(d / f"{case}-0-input.json")
    raw = parse_timestamps(_load(d / f"{case}-3-output.json"))

    response, processed = convert_result(
        body, raw, type_mapping=type_mapping, index=index)

    step4 = d / f"{case}-4-processed.json"
    if processed is not None and step4.exists():
        _assert_json_equal(processed, _load(step4), f"{folder}/{case} step4")

    want = _load(d / f"{case}-5-result.json")
    if (folder, case) in _STALE_ID_VINTAGE:
        from sneller_spark.adapters.elastic_response import hash_item
        got_hits = response["hits"]["hits"]
        want_hits = want["hits"]["hits"]
        raw_hits = raw.get("$hits") or []
        if isinstance(raw_hits, dict):
            raw_hits = [raw_hits]
        assert len(got_hits) == len(want_hits) == len(raw_hits)
        for g, w, r in zip(got_hits, want_hits, raw_hits):
            # recorded vintage: hash of the *unformatted* hit record
            pre_format = {k: v for k, v in r.items()
                          if not k.startswith("$source:")}
            assert w["_id"] == hash_item(pre_format), \
                f"{case}: recorded _id is not the pre-fallback hash"
            g["_id"] = w["_id"]

    _assert_json_equal(response, want, f"{folder}/{case} step5")


def test_replay_inventory():
    """The corpus is what COVERAGE.md claims: 1 preprocess + 34 full replays
    (26 flights + 8 news cases carry both a step-3 and a step-5 capture)."""
    assert len(_cases("test-preprocess", "-input.json")) == 1
    assert len(_replay_cases()) == 34
