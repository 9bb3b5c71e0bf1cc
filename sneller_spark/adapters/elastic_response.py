"""Elastic response assembly — the proxy's result post-processing stage.

The reference's elasticproxy answers a Kibana `_search` request in two
halves: the request is translated to SQL (covered on this engine by
`adapters/elastic.py`, which compiles the same DSL into Catalyst
expressions), and the flat SQL result rows are then assembled back into
an Elasticsearch-shaped JSON response.  This module is that second
half, re-derived natively:

* ``pre_process``   — flat ``$bucket:<path>%N`` row sets → hierarchical
  group tree (ref: elasticproxy/elastic-proxy/elastic_json.go:841-1019,
  the `test-preprocess` corpus).
* ``convert_result`` — request + raw result → the full Elastic response
  envelope: hits (sort values, ``fields``, ``_source`` filtering,
  reproducible ``_id`` hashes), per-aggregation bucket assembly, and
  pipeline aggs (ref: elastic_json.go:476-758, aggs_*.go ``process()``).

Everything here is driver-side JSON bookkeeping over already-aggregated
(tiny) result sets — the heavy lifting stays in Spark.  Verified
against every recorded artifact the reference ships: the
`test-preprocess` corpus, and the `testdata-new` / `testdata-news`
step-4 (processed) and step-5 (final response) captures
(`tests/test_replay_elastic_response.py`).

Faithfully mirrored quirks (each cited inline): booleans emit as 0/1
keys, timestamps as epoch-ms keys with a ``key_as_string`` twin,
``bucket_script`` only reads integer-typed metric values, float
comparisons in ``bucket_sort`` truncate the difference to int, and hit
``_id`` is the URL-safe base64 SHA-256 of the Go-JSON-marshaled record.
"""
from __future__ import annotations

import base64
import hashlib
import json
import math
import re
from datetime import datetime, timedelta, timezone
from fnmatch import fnmatchcase
from typing import Any

from sneller_spark.adapters.go_sort import go_sort_slice

TOTAL_COUNT = "$total_count"
HITS_BUCKET = "$hits"
KEY_PREFIX = "$key"
BUCKET_PREFIX = "$bucket"
DOC_COUNT = "$doc_count"
DUMMY_ALIAS = "$dummy$"
SOURCE_ALIAS_PREFIX = "$source:"

# aggregation kinds, classified as the reference classifies them
# (elasticproxy/elastic-proxy/aggs.go:35-58)
METRIC_AGGS = {"min", "avg", "max", "sum", "cardinality", "value_count",
               "geo_centroid", "top_hits"}
BUCKET_AGGS = {"date_histogram", "filter", "filters", "histogram",
               "terms", "multi_terms", "geotile_grid"}
PIPELINE_AGGS = {"bucket_script", "bucket_sort"}


class ElasticResponseError(ValueError):
    """A request/result shape the proxy's assembly stage also rejects."""


# --------------------------------------------------------------------------
# ION-JSON revival: the proxy decodes binary ION, where timestamps are a
# native type (parse_ion.go ConvertION).  The recorded step-3 JSON (and any
# JSON-serialized Spark result) collapses them to ISO-8601 strings; revive
# them so the assembly stage sees the same types the proxy saw.

_ISO_TS = re.compile(
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d{1,9})?(Z|[+-]\d{2}:\d{2})$")


def parse_timestamps(v: Any) -> Any:
    """Recursively revive ISO-8601 ``...Z`` strings into tz-aware datetimes."""
    if isinstance(v, str) and _ISO_TS.match(v):
        s = v[:-1] + "+00:00" if v.endswith("Z") else v
        return datetime.fromisoformat(s).astimezone(timezone.utc)
    if isinstance(v, dict):
        return {k: parse_timestamps(x) for k, x in v.items()}
    if isinstance(v, list):
        return [parse_timestamps(x) for x in v]
    return v


class EpochMillis(int):
    """An int the proxy created as epoch-milliseconds (Go int64), so
    format_out_raw may interpret it as a timestamp (type_format.go:260-266
    only attempts the epoch-ms reading for int64, never plain ints)."""


# --------------------------------------------------------------------------
# Go-compatible JSON marshaling (used for hit _id hashing, group keys, and
# the processed-tree serialization).  encoding/json sorts map keys, escapes
# <, >, & (HTML mode), and renders shortest-round-trip floats positionally
# unless |x| < 1e-6 or >= 1e21.

_STR_ESC = {'"': '\\"', "\\": "\\\\", "\n": "\\n", "\r": "\\r", "\t": "\\t",
            "<": "\\u003c", ">": "\\u003e", "&": "\\u0026",
            " ": "\\u2028", " ": "\\u2029"}


def _go_str(s: str) -> str:
    out = ['"']
    for ch in s:
        if ch in _STR_ESC:
            out.append(_STR_ESC[ch])
        elif ch < " ":
            out.append("\\u%04x" % ord(ch))
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _go_float(f: float) -> str:
    if math.isnan(f) or math.isinf(f):
        raise ElasticResponseError("json: unsupported value: " + repr(f))
    if f == int(f) and abs(f) < 1e15:
        # Go prints float64(135) as "135" in 'f' mode
        a = abs(f)
        if a == 0 or (1e-6 <= a < 1e21):
            if a == 0 and math.copysign(1.0, f) < 0:
                return "-0"  # encoding/json keeps the sign of -0.0
            return str(int(f))
    digits = repr(f)  # shortest round-trip, possibly scientific
    a = abs(f)
    if a != 0 and (a < 1e-6 or a >= 1e21):
        # Go 'e' format with the exponent's leading zero trimmed
        m, _, e = digits.partition("e")
        if not e:
            m = f"{f:e}"
            m, _, e = m.partition("e")
            m = m.rstrip("0").rstrip(".")
        exp = int(e)
        return f"{m}e{'+' if exp >= 0 else '-'}{abs(exp)}"
    if "e" in digits or "E" in digits:
        from decimal import Decimal
        return format(Decimal(digits), "f")
    return digits


def go_marshal(v: Any) -> str:
    """Mirror of Go json.Marshal over JSON-native values + datetimes."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return _go_float(v)
    if isinstance(v, str):
        return _go_str(v)
    if isinstance(v, datetime):
        return _go_str(rfc3339_nano(v))
    if isinstance(v, dict):
        items = (f"{_go_str(k)}:{go_marshal(v[k])}" for k in sorted(v))
        return "{" + ",".join(items) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(go_marshal(x) for x in v) + "]"
    raise ElasticResponseError(f"unable to marshal value: {v!r}")


def hash_item(v: Any) -> str:
    """sha256-base64url item hash (elastic_json.go:776-802 hashAny):
    maps hash as raw-key-bytes + recursive value hash, everything else
    as its Go-JSON encoding."""
    h = hashlib.sha256()

    def feed(x: Any) -> None:
        if x is None:
            return
        if isinstance(x, dict):
            for k in sorted(x):
                h.update(k.encode())
                feed(x[k])
        else:
            h.update(go_marshal(x).encode())

    feed(v)
    return base64.urlsafe_b64encode(h.digest()).rstrip(b"=").decode()


# --------------------------------------------------------------------------
# Go time formatting (type_format.go formatOutRaw) — the handful of Elastic
# date formats the proxy renders.  Go layout fractions (.999...) trim
# trailing zeros and vanish entirely at zero.

def _frac(dt: datetime, max_digits: int) -> str:
    micros = dt.microsecond
    if micros == 0 or max_digits == 0:
        return ""
    s = f"{micros:06d}"[:max_digits].rstrip("0")
    return "." + s if s else ""


def rfc3339_nano(dt: datetime) -> str:
    dt = dt.astimezone(timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + _frac(dt, 9) + "Z"


def _fmt(dt: datetime, body: str, frac_digits: int = 0, z: bool = False) -> str:
    dt = dt.astimezone(timezone.utc)
    return dt.strftime(body) + _frac(dt, frac_digits) + ("Z" if z else "")


def _epoch(dt: datetime) -> float:
    return dt.astimezone(timezone.utc).timestamp()


_GO_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _epoch_micros(dt: datetime) -> int:
    """Exact integer microseconds since the epoch (Go t.UnixMicro()).
    Float epoch seconds lose sub-microsecond precision past ~2001
    (ulp of 1e9 s is ~0.24 us) and nanoseconds by hundreds — timedelta
    keeps exact integer days/seconds/microseconds instead."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    d = dt - _GO_EPOCH
    return (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds


_DATE_FORMATS: dict[str, Any] = {
    "basic_date": lambda d: _fmt(d, "%Y%m%d"),
    "basic_date_time": lambda d: _fmt(d, "%Y%m%dT%H:%M:%S", 3, z=True),
    "basic_date_time_no_millis": lambda d: _fmt(d, "%Y%m%dT%H:%M:%S", z=True),
    "basic_time": lambda d: _fmt(d, "%H:%M:%S", 3, z=True),
    "basic_time_no_millis": lambda d: _fmt(d, "%H:%M:%S", z=True),
    "basic_t_time": lambda d: _fmt(d, "T%H:%M:%S", 3, z=True),
    "basic_t_time_no_millis": lambda d: _fmt(d, "T%H:%M:%S", z=True),
    "date": lambda d: _fmt(d, "%Y-%m-%d"),
    "strict_date": lambda d: _fmt(d, "%Y-%m-%d"),
    "date_hour": lambda d: _fmt(d, "%Y-%m-%dT%H"),
    "strict_date_hour": lambda d: _fmt(d, "%Y-%m-%dT%H"),
    "date_hour_minute": lambda d: _fmt(d, "%Y-%m-%dT%H:%M"),
    "strict_date_hour_minute": lambda d: _fmt(d, "%Y-%m-%dT%H:%M"),
    # the reference swaps the second/fraction layouts between these two
    # pairs (type_format.go:216-219) — mirrored verbatim
    # the TRAILING SPACES in two keys below are verbatim from the
    # reference (type_format.go:223,225 case labels); the space-free
    # spellings fall through to the RFC3339Nano default there too, so
    # this is a mirrored quirk, not a transcription typo
    "date_hour_minute_second_fraction ": lambda d: _fmt(d, "%Y-%m-%dT%H:%M:%S"),
    "strict_date_hour_minute_second": lambda d: _fmt(d, "%Y-%m-%dT%H:%M:%S"),
    "date_hour_minute_second": lambda d: _fmt(d, "%Y-%m-%dT%H:%M:%S", 3),
    "strict_date_hour_minute_second_fraction":
        lambda d: _fmt(d, "%Y-%m-%dT%H:%M:%S", 3),
    "date_hour_minute_second_millis ": lambda d: _fmt(d, "%Y-%m-%dT%H:%M:%S", 3),
    "strict_date_hour_minute_second_millis":
        lambda d: _fmt(d, "%Y-%m-%dT%H:%M:%S", 3),
    "date_time": lambda d: _fmt(d, "%Y-%m-%dT%H:%M:%S", 3, z=True),
    "strict_date_time": lambda d: _fmt(d, "%Y-%m-%dT%H:%M:%S", 3, z=True),
    "date_time_no_millis": lambda d: _fmt(d, "%Y-%m-%dT%H:%M:%S"),
    "strict_date_time_no_millis": lambda d: _fmt(d, "%Y-%m-%dT%H:%M:%S"),
    "epoch_second": lambda d: int(_epoch(d)),
    "unix_seconds": lambda d: int(_epoch(d)),
    "epoch_millis": lambda d: round(_epoch(d) * 1000),
    "unix_milli_seconds": lambda d: round(_epoch(d) * 1000),
    "unix_micro_seconds": lambda d: _epoch_micros(d),
    "unix_nano_seconds": lambda d: _epoch_micros(d) * 1000,
}


def _fmt_datetime(dt: datetime) -> str:
    # "datetime": nano-trimmed RFC 3339, padded to .000 when whole-second
    # (type_format.go:240-245)
    t = rfc3339_nano(dt)
    if "." not in t:
        t = t[:-1] + ".000Z"
    return t


def match_wildcard(s: str, wildcard: str) -> bool:
    if s == wildcard:
        return True
    if "*" not in wildcard:
        return False
    return fnmatchcase(s, wildcard)


def map_format(key: str, mapping: dict[str, Any] | None) -> str:
    """Resolve a field's type-format; longest wildcard pattern wins
    (type_format.go:152-179)."""
    if not mapping:
        return ""
    m = mapping.get(key)
    if m is not None:
        return m.get("type", "") if isinstance(m, dict) else str(m)
    best, best_len = "", 0
    for pat, tm in mapping.items():
        if match_wildcard(key, pat) and len(pat) > best_len:
            t = tm.get("type", "") if isinstance(tm, dict) else str(tm)
            if t:
                best, best_len = t, len(pat)
    return best


def format_out_raw(value: Any, f: str) -> Any:
    if f == "":
        return value
    if isinstance(value, list):
        return [format_out_raw(v, f) for v in value]
    if isinstance(value, str):
        return value
    if isinstance(value, datetime):
        if f == "datetime":
            return _fmt_datetime(value)
        fn = _DATE_FORMATS.get(f)
        if fn is not None:
            return fn(value)
        # unknown format: Go falls through to the RFC3339Nano default
        return rfc3339_nano(value)
    if isinstance(value, int) and not isinstance(value, bool):
        # every decoded int is a Go int64, and type_format.go:250-258
        # attempts the epoch-ms reading for ALL of them (the time.Time
        # switch has an RFC3339Nano default, so the attempt never
        # fails); EpochMillis-wrapped proxy-made keys take this path
        # too
        return format_out_raw(
            datetime.fromtimestamp(int(value) / 1000, tz=timezone.utc), f)
    raise ElasticResponseError(f"type-format {f!r} is unknown")


def format_out(key: str, value: Any, mapping: dict[str, Any] | None) -> Any:
    f = map_format(key, mapping)
    if not f:
        if isinstance(value, datetime):
            return format_out_raw(value, "datetime")
        return value
    return format_out_raw(value, f)


# --------------------------------------------------------------------------
# preProcess: flat rows → hierarchical groups

def _json_time_safe(v: Any) -> Any:
    """Serialize datetimes the way Go's encoding/json marshals time.Time
    (RFC3339Nano), so the recorded step-4 processed trees compare equal."""
    if isinstance(v, datetime):
        return rfc3339_nano(v)
    if isinstance(v, dict):
        return {k: _json_time_safe(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_json_time_safe(x) for x in v]
    return v


class GroupResults:
    __slots__ = ("key_values", "results", "nested")

    def __init__(self, key_values=None, results=None, nested=None):
        self.key_values = key_values if key_values is not None else []
        self.results = results
        self.nested = nested

    def doc_count(self) -> int:
        v = (self.results or {}).get(DOC_COUNT)
        if v is None:
            return 0
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ElasticResponseError(f"{DOC_COUNT} has invalid type")
        return int(v)

    def to_json(self):
        out = {}
        if self.key_values:
            out["$keys$"] = _json_time_safe(self.key_values)
        if self.results:
            out["$results$"] = _json_time_safe(self.results)
        if self.nested:
            out["$nested$"] = {k: v.to_json() for k, v in self.nested.items()}
        return out


class GroupResultMap:
    __slots__ = ("key_columns", "ordered_groups", "groups")

    def __init__(self):
        self.key_columns: list[str] = []
        self.ordered_groups: list[GroupResults] = []
        self.groups: dict[str, GroupResults] = {}

    def to_json(self):
        if not self.ordered_groups:
            return {}
        return {"$groups$": [g.to_json() for g in self.ordered_groups]}


def split_with_prefix(prefix: str, text: str) -> tuple[str, int]:
    if not text.startswith(prefix + ":"):
        return "", -1
    pos = text.rfind("%")
    if pos < 0:
        return "", -1
    try:
        index = int(text[pos + 1:])
    except ValueError:
        return "", -1
    return text[len(prefix) + 1:pos], index


def key_groups(record: dict[str, Any]) -> list[list[str]]:
    """Group the $key:<path>%i columns of a row by path, columns sorted
    and index-checked, groups in sorted path order (elastic_json.go:1036)."""
    by_name: dict[str, list[str]] = {}
    for col in record:
        name, idx = split_with_prefix(KEY_PREFIX, col)
        if idx < 0:
            continue
        by_name.setdefault(name, []).append(col)
    for name, cols in by_name.items():
        cols.sort()
        for i, col in enumerate(cols):
            _, idx = split_with_prefix(KEY_PREFIX, col)
            if i != idx:
                raise ElasticResponseError(f"invalid key-name {col!r}")
    return [by_name[name] for name in sorted(by_name)]


def pre_process(raw: dict[str, Any]) -> dict[str, Any]:
    """Assemble the flat `$bucket:<path>%N` row sets into one hierarchical
    group tree; outer buckets are processed before inner ones because the
    combined names sort that way (elastic_json.go:841-1019)."""
    out: dict[str, Any] = {DOC_COUNT: raw.get(TOTAL_COUNT)}

    for combined in sorted(k for k in raw if isinstance(k, str)):
        bucket = raw[combined]
        bucket_name, idx = split_with_prefix(BUCKET_PREFIX, combined)
        if idx < 0:
            continue
        parts = bucket_name.split(":")
        root = parts[0]

        if bucket is None or isinstance(bucket, list):
            # an ION typed-null list decodes as an empty list in the proxy
            rows = bucket or []
            if not rows:
                continue
            if not isinstance(rows[0], dict):
                raise ElasticResponseError(
                    f"bucket {combined!r} should hold a record first")
            kgs = key_groups(rows[0])

            root_grm = out.get(root)
            if not isinstance(root_grm, GroupResultMap):
                root_grm = GroupResultMap()
                out[root] = root_grm

            for row in rows:
                grm = root_grm
                group: GroupResults | None = None
                pi = 0
                for kg in kgs:
                    if pi > 0:
                        if group.nested is None:
                            group.nested = {}
                        nxt = group.nested.get(parts[pi])
                        if not isinstance(nxt, GroupResultMap):
                            nxt = GroupResultMap()
                            group.nested[parts[pi]] = nxt
                        grm = nxt
                    if not grm.key_columns:
                        grm.key_columns = kg
                        grm.groups = {}
                    key_hash = go_marshal(
                        [row.get(c) for c in grm.key_columns])
                    group = grm.groups.get(key_hash)
                    if group is None:
                        group = GroupResults(
                            key_values=[row.get(c) for c in grm.key_columns])
                        grm.groups[key_hash] = group
                        grm.ordered_groups.append(group)
                    pi += 1

                while pi < len(parts):
                    if group.nested is None:
                        group.nested = {}
                    nxt = group.nested.get(parts[pi])
                    if not isinstance(nxt, GroupResults):
                        nxt = GroupResults()
                        group.nested[parts[pi]] = nxt
                    group = nxt
                    pi += 1

                if row:
                    if group.results is None:
                        group.results = {}
                    for col, v in row.items():
                        if col == DUMMY_ALIAS:
                            continue
                        _, ki = split_with_prefix(KEY_PREFIX, col)
                        if ki < 0:
                            group.results[col] = v

        elif isinstance(bucket, dict):
            # single-object bucket: metric aggregation without group-by
            if len(parts) > 1:
                grm = out.get(root)
                if not isinstance(grm, GroupResultMap):
                    grm = GroupResultMap()
                    out[root] = grm
                group = GroupResults(key_values=[parts[1]], results={})
                grm.groups[parts[1]] = group
                grm.ordered_groups.append(group)
                results = group.results
            elif root != "":
                group = out.get(root)
                if not isinstance(group, GroupResults):
                    group = GroupResults(key_values=[], results={})
                    out[root] = group
                results = group.results
            else:
                results = out
            for col, v in bucket.items():
                if col != DUMMY_ALIAS:
                    results[col] = v
        else:
            raise ElasticResponseError(
                f"bucket {combined!r} has unsupported result data")

    return out


def processed_to_json(processed: dict[str, Any]) -> dict[str, Any]:
    """Serialize the pre_process tree the way the proxy records it."""
    out = {}
    for k, v in processed.items():
        if isinstance(v, (GroupResultMap, GroupResults)):
            out[k] = v.to_json()
        else:
            out[k] = v
    return out


# --------------------------------------------------------------------------
# Aggregation result assembly

class MetricResult:
    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def to_json(self, mapping):
        return {"value": self.value}


class LocationResult:
    __slots__ = ("location",)

    def __init__(self, location):
        self.location = location

    def to_json(self, mapping):
        return {"location": self.location}


class BucketSingleResult:
    __slots__ = ("sub_aggregations", "doc_count")

    def __init__(self, sub_aggregations=None, doc_count=0):
        self.sub_aggregations = sub_aggregations or {}
        self.doc_count = doc_count

    def to_json(self, mapping):
        out = {k: _result_json(v, mapping)
               for k, v in self.sub_aggregations.items()}
        out["doc_count"] = self.doc_count
        return out


class BucketSingleResultWithKey(BucketSingleResult):
    __slots__ = ("key", "key_format", "key_field")

    def __init__(self, key, key_field="", key_format="",
                 sub_aggregations=None, doc_count=0):
        super().__init__(sub_aggregations, doc_count)
        self.key = key
        self.key_field = key_field
        self.key_format = key_format

    def to_json(self, mapping):
        out = super().to_json(mapping)
        key = self.key
        if isinstance(key, bool):
            out["key"] = 1 if key else 0  # booleans emit as 0/1
        elif isinstance(key, datetime):
            out["key"] = round(_epoch(key) * 1000)
        else:
            out["key"] = int(key) if isinstance(key, EpochMillis) else key

        f = self.key_format or map_format(self.key_field, mapping)
        text = ""
        if f:
            formatted = format_out_raw(self.key, f)
            if isinstance(formatted, str):
                text = formatted
        elif isinstance(key, bool):
            text = "true" if key else "false"
        elif isinstance(key, datetime):
            text = rfc3339_nano(key)
        if text:
            out["key_as_string"] = text
        return out


class BucketMultiResult:
    __slots__ = ("buckets", "sum_other_doc_count", "doc_count_error_upper_bound")

    def __init__(self):
        self.buckets: list[BucketSingleResultWithKey] = []
        self.sum_other_doc_count: int | None = None
        self.doc_count_error_upper_bound: int | None = None

    def to_json(self, mapping):
        out = {"buckets": [b.to_json(mapping) for b in self.buckets]}
        if self.sum_other_doc_count is not None:
            out["sum_other_doc_count"] = self.sum_other_doc_count
        if self.doc_count_error_upper_bound is not None:
            out["doc_count_error_upper_bound"] = self.doc_count_error_upper_bound
        return out


class BucketMappedResult:
    __slots__ = ("buckets",)

    def __init__(self):
        self.buckets: dict[str, BucketSingleResult] = {}

    def to_json(self, mapping):
        return {"buckets": {k: v.to_json(mapping)
                            for k, v in self.buckets.items()}}


def _result_json(v, mapping):
    return v.to_json(mapping) if hasattr(v, "to_json") else v


def parse_aggregation(node: dict[str, Any]) -> tuple[str, dict, dict, Any]:
    """Split one request-side aggregation node into (kind, body,
    sub-aggregations, meta); multiple kinds per node are rejected like the
    proxy (aggs.go:61-107)."""
    kind, body, subs, meta = "", {}, {}, None
    found = []
    for field, value in node.items():
        if field in ("aggs", "aggregations"):
            subs = value or {}
        elif field == "meta":
            meta = value
        elif field in METRIC_AGGS or field in BUCKET_AGGS or field in PIPELINE_AGGS:
            kind, body = field, (value or {})
            found.append(field)
        else:
            raise ElasticResponseError(f"invalid field {field!r}")
    if len(found) > 1:
        raise ElasticResponseError(
            "multiple aggregations are not allowed: " + ",".join(found))
    return kind, body, subs, meta


def _effective_size(size) -> int:
    return int(size) if size is not None else 10


def _fixed_interval_seconds(text: str) -> int:
    m = re.match(r"^(\d+)(ms|s|m|h|d)$", str(text))
    if not m or int(m.group(1)) == 0:
        raise ElasticResponseError(f"invalid time-offset {text!r}")
    n, unit = int(m.group(1)), m.group(2)
    scale = {"ms": None, "s": 1, "m": 60, "h": 3600, "d": 86400}[unit]
    if scale is None:
        if n % 1000:
            raise ElasticResponseError(
                f"can't convert {n}ms to second-value")
        return n // 1000
    return n * scale


class _ProcessContext:
    """Per-aggregation processing state (aggs_process_context.go)."""

    def __init__(self, type_mapping, ignore_sum_other, data, doc_count):
        self.type_mapping = type_mapping
        self.ignore_sum_other = ignore_sum_other
        self.data = data
        self.doc_count = doc_count

    def groups(self) -> GroupResultMap | None:
        return self.data if isinstance(self.data, GroupResultMap) else None

    def sub_result(self, subs: dict[str, Any],
                   group: GroupResults | None) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for name in subs:
            kind, body, ssubs, meta = parse_aggregation(subs[name])
            sub = _ProcessContext(self.type_mapping, self.ignore_sum_other,
                                  None, self.doc_count)
            if kind in METRIC_AGGS:
                if group is not None and group.results is not None:
                    sub.data = group.results.get(name)
                out[name] = _process_metric(kind, sub)
            elif kind in BUCKET_AGGS:
                if group is not None and group.nested is not None:
                    sub.data = group.nested.get(name)
                out[name] = _process_bucket(kind, body, ssubs, sub)
                if group is not None and group.results:
                    # pulled-in FILTER(...) doc counts land as inlined
                    # "<name>:$doc_count" columns on the parent row
                    # (aggs_process_context.go:71-88)
                    prefix = f"{name}:{DOC_COUNT}"
                    for col, value in group.results.items():
                        if col.startswith(prefix) and isinstance(
                                out[name], BucketSingleResult) and isinstance(
                                value, int) and not isinstance(value, bool):
                            out[name].doc_count = value
            if meta is not None:
                out["meta"] = meta
        return out


def _process_metric(kind: str, c: _ProcessContext):
    if kind == "top_hits":
        raise ElasticResponseError("'top_hits' not supported")
    v = c.data
    if kind == "geo_centroid":
        return LocationResult(v)
    if kind in ("sum", "cardinality", "value_count") and v is None:
        v = 0
    return MetricResult(v)


def _multi_buckets(c: _ProcessContext, subs, size, key_field,
                   key_of=None, key_format="", want_other=False,
                   single_key=None):
    """The shared shape of terms/multi_terms/geotile_grid/histogram
    bucket assembly."""
    result = BucketMultiResult()
    total = 0
    bucket_doc_count = c.doc_count
    groups = c.groups()
    if groups is not None:
        ordered = groups.ordered_groups
        if size is not None:
            ordered = ordered[:size]
        for group in ordered:
            if single_key is not None and len(group.key_values) != single_key:
                raise ElasticResponseError(
                    f"key-value count is {len(group.key_values)}, which is "
                    f"invalid for this aggregation")
            dc = group.doc_count()
            c.doc_count = dc
            sub = c.sub_result(subs, group)
            key = group.key_values[0]
            if key_of is not None:
                key = key_of(key)
            result.buckets.append(BucketSingleResultWithKey(
                key=key, key_field=key_field, key_format=key_format,
                sub_aggregations=sub, doc_count=dc))
            total += dc
    if want_other and not c.ignore_sum_other and bucket_doc_count > 0:
        result.sum_other_doc_count = bucket_doc_count - total
    return result


def _process_bucket(kind: str, body: dict, subs: dict, c: _ProcessContext):
    if kind == "terms":
        result = _multi_buckets(
            c, subs, _effective_size(body.get("size")),
            body.get("field", ""), want_other=True, single_key=1)
        result.doc_count_error_upper_bound = 0
        return result

    if kind == "multi_terms":
        terms = body.get("terms") or [{}]
        return _multi_buckets(
            c, subs, _effective_size(body.get("size")),
            terms[0].get("field", ""), want_other=True)

    if kind == "geotile_grid":
        return _multi_buckets(
            c, subs, _effective_size(body.get("size")),
            body.get("field", ""), single_key=1)

    if kind == "histogram":
        return _multi_buckets(c, subs, None, body.get("field", ""))

    if kind == "date_histogram":
        fixed = body.get("fixed_interval") or body.get("interval")

        def to_ms(key):
            if fixed is not None:
                # TIME_BUCKET returns epoch seconds
                return EpochMillis(int(key) * 1000)
            if not isinstance(key, datetime):
                raise ElasticResponseError(
                    "unexpected return-type from DATE_PART")
            return EpochMillis(round(_epoch(key) * 1000))

        result = _multi_buckets(
            c, subs, None, body.get("field", ""), key_of=to_ms,
            key_format=body.get("format", ""))
        bounds = body.get("extended_bounds")
        if bounds:
            if fixed is not None:
                step_ms = _fixed_interval_seconds(fixed) * 1000
            else:
                cal = str(body.get("calendar_interval", ""))
                step = {"us": 0.001, "ms": 1, "s": 1000, "m": 60000,
                        "h": 3600000, "d": 86400000}.get(cal)
                if step is None:
                    raise ElasticResponseError(
                        f"unsupported interval {cal!r}")
                step_ms = int(step)
            have = {int(b.key) for b in result.buckets}
            # Go's % truncates toward zero (aggs_date_histogram.go
            # Min - Min%step); Python's floors — they differ for
            # pre-epoch (negative) bounds.min
            bmin = int(bounds["min"])
            rem = bmin % step_ms if bmin >= 0 else -((-bmin) % step_ms)
            lo = bmin - rem
            t = lo
            while t <= bounds["max"]:
                if t not in have:
                    c.doc_count = 0
                    result.buckets.append(BucketSingleResultWithKey(
                        key=EpochMillis(t), key_field=body.get("field", ""),
                        key_format=body.get("format", ""),
                        sub_aggregations=c.sub_result(subs, None),
                        doc_count=0))
                t += step_ms
            result.buckets.sort(key=lambda b: int(b.key))
        return result

    if kind == "filter":
        group = c.data if isinstance(c.data, GroupResults) else None
        sub = c.sub_result(subs, group)
        dc = group.doc_count() if group is not None else 0
        return BucketSingleResult(sub_aggregations=sub, doc_count=dc)

    if kind == "filters":
        result = BucketMappedResult()
        groups = c.groups()
        if groups is not None:
            for group in groups.ordered_groups:
                dc = group.doc_count()
                c.doc_count = dc
                sub = c.sub_result(subs, group)
                key = _key_to_string(group.key_values[0])
                result.buckets[key] = BucketSingleResult(
                    sub_aggregations=sub, doc_count=dc)
        return result

    raise ElasticResponseError(f"unknown bucket aggregation {kind!r}")


def _key_to_string(key) -> str:
    if isinstance(key, bool):
        return "true" if key else "false"
    if isinstance(key, str):
        return key
    return str(key)


# --------------------------------------------------------------------------
# Pipeline aggregations (bucket_script / bucket_sort) run over the finished
# bucket sets (elastic_json.go:676-758, aggs_bucket_script.go,
# aggs_bucket_sort.go)

def _ordered_aggs(aggs: dict[str, Any]) -> list[tuple[str, str, dict, dict]]:
    parsed = {name: parse_aggregation(aggs[name]) for name in aggs}
    names = sorted(aggs)
    ordered = []
    for name in names:  # 1. bucket aggregations
        if parsed[name][0] in BUCKET_AGGS:
            ordered.append(name)
    for name in names:  # 2. bucket_script
        if parsed[name][0] == "bucket_script":
            ordered.append(name)
    for name in names:  # 3. other pipeline aggs (none today)
        if parsed[name][0] in PIPELINE_AGGS and parsed[name][0] not in (
                "bucket_script", "bucket_sort"):
            ordered.append(name)
    for name in names:  # 4. bucket_sort
        if parsed[name][0] == "bucket_sort":
            ordered.append(name)
    return [(n, *parsed[n][:3]) for n in ordered]


def _compare_values(a, b) -> int:
    if isinstance(a, MetricResult):
        if not isinstance(b, MetricResult):
            return -1
        return _compare_values(a.value, b.value)
    if isinstance(a, bool):
        if not isinstance(b, bool):
            return -1
        return (0 if a == b else (-1 if a else 1))
    if isinstance(a, int):
        if not isinstance(b, int) or isinstance(b, bool):
            return -1
        return a - b
    if isinstance(a, float):
        if not isinstance(b, float):
            return -1
        d = a - b
        if math.isnan(d) or math.isinf(d) or not (
                -(2.0**63) <= d < 2.0**63):
            # Go's float->int conversion doesn't panic; on amd64 (the
            # proxy's platform) cvttsd2si returns the minimum int64
            # for every invalid input — NaN, +/-Inf, out of range —
            # so such comparisons all read as "less"
            return -(1 << 63)
        return int(d)  # the proxy truncates float deltas to int
    if isinstance(a, str):
        if not isinstance(b, str):
            return -1
        return (a > b) - (a < b)
    return 0


def _process_bucket_script(name: str, body: dict, data) -> None:
    if not isinstance(data, BucketMultiResult):
        raise ElasticResponseError(
            "bucket sort can only be applied to a set of buckets")
    parts = str(body.get("script", "")).split(" ")
    if len(parts) != 3 or parts[1] != "+" or not (
            parts[0].startswith("params.") and parts[2].startswith("params.")):
        raise ElasticResponseError(f"unsupported script {body.get('script')!r}")
    paths = body.get("buckets_path") or {}
    try:
        left_field = paths[parts[0][7:]]
        right_field = paths[parts[2][7:]]
    except KeyError as e:
        raise ElasticResponseError(
            f"can't find param {e.args[0]!r} in script") from None

    def int_value(bucket, field):
        agg = bucket.sub_aggregations.get(field)
        if isinstance(agg, MetricResult) and isinstance(
                agg.value, int) and not isinstance(agg.value, bool):
            return agg.value
        return 0  # the proxy only reads integer-typed metric values

    for bucket in data.buckets:
        bucket.sub_aggregations[name] = MetricResult(
            int_value(bucket, left_field) + int_value(bucket, right_field))


def _process_bucket_sort(body: dict, data) -> None:
    if not isinstance(data, BucketMultiResult):
        raise ElasticResponseError(
            "bucket sort can only be applied to a set of buckets")
    sort_fields = []
    for s in body.get("sort") or []:
        (field, spec), = s.items()
        order = (spec.get("order", "desc")
                 if isinstance(spec, dict) else (spec or "desc"))
        sort_fields.append((field, order))

    def less(a, b):
        # aggs_bucket_sort.go:36-50 — evaluated under Go's *unstable*
        # sort.Slice; tie permutations are part of the recorded
        # artifacts, so we sort with the same pdqsort (go_sort.py).
        for field, order in sort_fields:
            r = _compare_values(a.sub_aggregations.get(field),
                                b.sub_aggregations.get(field))
            if r < 0:
                return order == "asc"
            if r > 0:
                return order == "desc"
        return False

    go_sort_slice(data.buckets, less)
    size = body.get("size") or 0
    if 0 < size < len(data.buckets):
        del data.buckets[size:]


def _process_pipeline_aggs(aggs: dict[str, Any], data) -> None:
    """Mirror of processPipelineAggregations (elastic_json.go:676-721):
    pipeline aggs act on the *current* data node; descending a bucket agg
    switches to ``data[name]`` only at the top level (when data is still
    the aggregations map) — once inside a bucket result the same node is
    passed down unchanged, so e.g. a bucket_script under histogram runs
    per outer bucket via its multi-result."""
    for name, kind, body, subs in _ordered_aggs(aggs):
        if kind == "bucket_script":
            _process_bucket_script(name, body, data)
            _process_pipeline_aggs(subs, data)
        elif kind == "bucket_sort":
            _process_bucket_sort(body, data)
            _process_pipeline_aggs(subs, data)
        elif kind in BUCKET_AGGS:
            sub_data = data.get(name) if isinstance(data, dict) else data
            _process_pipeline_aggs(subs, sub_data)


# --------------------------------------------------------------------------
# ConvertResult: request + raw flat result → the full Elastic response

def _find_values(m: dict[str, Any], field: str):
    """Glob-match a dotted field path into a hit record
    (elastic_json.go:1102-1130)."""
    parts = field.split(".")
    keys, values = [], []

    def walk(d: dict[str, Any], depth: int, prefix: list[str]) -> None:
        for k in d:
            if not fnmatchcase(k, parts[depth]):
                continue
            if depth == len(parts) - 1:
                keys.append(".".join(prefix + [k]))
                values.append(d[k])
            elif isinstance(d[k], dict):
                walk(d[k], depth + 1, prefix + [k])

    walk(m, 0, [])
    return keys, values


def convert_result(body: dict[str, Any], raw: dict[str, Any], *,
                   type_mapping: dict[str, Any] | None = None,
                   index: str = "",
                   ignore_sum_other: bool = False
                   ) -> tuple[dict[str, Any], dict[str, Any] | None]:
    """Assemble the final Elastic `_search` response from the request
    body and the flat raw result (``$total_count`` / ``$hits`` /
    ``$bucket:...%N`` entries).  Returns (response, processed-tree) —
    the proxy's step-5 and step-4 artifacts (elastic_json.go:476-552)."""
    total_count = int(raw[TOTAL_COUNT])

    hits_env: dict[str, Any] = {"hits": []}
    response: dict[str, Any] = {
        "timed_out": False,
        "hits": hits_env,
        "_shards": {"successful": 1, "failed": 0, "skipped": 0, "total": 1},
        "took": 0,
    }

    tth = body.get("track_total_hits")
    enabled, limit = True, 10000
    if isinstance(tth, bool):
        enabled, limit = tth, -1
    elif isinstance(tth, int):
        if tth <= 0:
            raise ElasticResponseError(f"invalid track_total_limits {tth}")
        limit = tth
    if enabled:
        if 0 <= limit < total_count:
            hits_env["total"] = {"relation": "gte", "value": limit}
        else:
            hits_env["total"] = {"relation": "eq", "value": total_count}

    max_score = None
    if HITS_BUCKET in raw:
        hits = raw[HITS_BUCKET]
        if isinstance(hits, dict):
            hits = [hits] if hits else []
        hits = hits or []
        version = 1 if body.get("version") else None
        sort_spec = []
        for s in body.get("sort") or []:
            if isinstance(s, str):
                sort_spec.append(s)
            else:
                (field, _), = s.items()
                sort_spec.append(field)
        src = body.get("_source")

        for hit in hits:
            hit = {k: v for k, v in hit.items()
                   if not k.startswith(SOURCE_ALIAS_PREFIX)}
            sort_values = []
            for field in sort_spec:
                value = hit.get(field)
                if isinstance(value, datetime):
                    value = round(_epoch(value) * 1000)
                sort_values.append(value)
            hit = {k: format_out(k, v, type_mapping) for k, v in hit.items()}

            rec: dict[str, Any] = {
                "_score": 1, "_type": "_doc", "_id": hash_item(hit)}
            fields = body.get("fields")
            if fields:
                rec["fields"] = {}
                for f in fields:
                    fname = f if isinstance(f, str) else f.get("field", "")
                    ffmt = "" if isinstance(f, str) else f.get("format", "")
                    keys, values = _find_values(hit, fname)
                    for k, v in zip(keys, values):
                        try:
                            v = format_out_raw(v, ffmt) if ffmt else \
                                format_out(k, v, type_mapping)
                        except ElasticResponseError:
                            pass
                        rec["fields"][k] = [v]
            include_all = (
                src is None or src is True
                or (isinstance(src, dict)
                    and not src.get("includes") and not src.get("excludes")))
            if include_all:
                rec["_source"] = hit
            elif isinstance(src, (dict, str, list)):
                if isinstance(src, str):
                    includes, excludes = src.split(","), []
                elif isinstance(src, list):
                    includes, excludes = src, []
                else:
                    includes = src.get("includes") or []
                    excludes = src.get("excludes") or []
                source = {}
                for f, v in hit.items():
                    match = not includes or any(
                        match_wildcard(f, ff) for ff in includes)
                    if match and not any(
                            match_wildcard(f, ff) for ff in excludes):
                        source[f] = v
                rec["_source"] = source
            if version is not None:
                rec["_version"] = version
            if index:
                rec["_index"] = index
            if sort_values:
                rec["sort"] = sort_values
            hits_env["hits"].append(rec)
            if max_score is None or max_score < 1:
                max_score = 1.0
    hits_env["max_score"] = max_score

    processed = None
    aggs = body.get("aggs") or body.get("aggregations")
    if aggs:
        processed = pre_process(raw)
        out_aggs: dict[str, Any] = {}
        response["aggregations"] = out_aggs
        for name in aggs:
            kind, agg_body, subs, meta = parse_aggregation(aggs[name])
            c = _ProcessContext(type_mapping, ignore_sum_other,
                                processed.get(name), total_count)
            if kind in METRIC_AGGS:
                out_aggs[name] = _process_metric(kind, c)
            elif kind in BUCKET_AGGS:
                out_aggs[name] = _process_bucket(kind, agg_body, subs, c)
            else:
                raise ElasticResponseError(f"unknown aggregation {kind!r}")
            if meta is not None:
                out_aggs["meta"] = meta
        _process_pipeline_aggs(aggs, out_aggs)
        response["aggregations"] = {
            k: _result_json(v, type_mapping) for k, v in out_aggs.items()}

    # Any unmapped datetimes left in hits marshal like Go time.Time.
    response["hits"] = _json_time_safe(hits_env)
    return response, (processed_to_json(processed)
                      if processed is not None else None)
