"""Elasticsearch query-DSL adapter: translate a subset of the Elastic
search body into DataFrame plans.

The reference ships `elasticproxy`, which rewrites Elastic DSL JSON to
its SQL — filters become WHERE, metric aggs map to SQL aggregates,
bucket aggs to GROUP BY (/root/reference/elasticproxy/elastic-proxy/:
aggs_avg.go, aggs_sum.go, aggs_cardinality.go, aggs_terms.go,
aggs_date_histogram.go, aggs_histogram.go, aggs_filters.go; pipeline
aggs unsupported per its README).  This module is the same posture on
Spark: the DSL is *translated at plan time* (driver-side JSON walking,
zero per-row Python) into Catalyst expressions, so the resulting plan
is indistinguishable from hand-written DataFrame code — filters push
down, aggregates are two-phase, `filters` buckets become FILTER-clause
aggregates evaluated in ONE pass.

Supported (mirroring elasticproxy's documented surface):
  query:  match_all, match_none, term, terms, range (gt/gte/lt/lte
          and the legacy from/to/include_* spelling), exists, prefix,
          wildcard, match (substring, case-insensitive — no
          scoring/analysis, like the proxy), match_phrase (strict
          equality for every type, query.go:276-281), bool (must/
          filter/should/must_not; object or list clause forms),
          constant_score (its filter; scoring dropped like the
          proxy), geo_bounding_box (corner comparisons on .lat/.lon
          struct fields, query.go:287-307), query_string (Lucene
          search-bar syntax via adapters.qs — lexer/grammar/
          typed-field semantics from qs_lexer.rl + qs_parser.y +
          qs.go) — the proxy's full supported set (query.go:120-122)
  hits:   sort, size, `from` offset pagination, _source projection
          (_source: false keeps all columns)
  aggs:   metric — avg, sum, min, max, value_count, cardinality
          (exact by default so results are oracle-checkable;
          approximate HLL when `precision_threshold` is given, like
          Elastic), stats, percentiles (exact), geo_centroid
          (aggs_geo_centroid.go; flattened lat/lon columns), and
          `filter` sub-aggs under a bucket (FILTER-clause doc_count
          + inner metrics in the parent's single pass — the proxy's
          testaggs/issue-67 shape); metric aggs may also sit BESIDE
          one bucket agg at the same level (computed over the same
          filtered source, attached as broadcast constant columns);
          bucket — terms (size; default doc-count-desc/key-asc order,
          explicit _key/_count order honored, aggs_terms.go),
          multi_terms (composite keys, _count/_key order;
          aggs_multi_terms.go), histogram (interval), date_histogram
          (calendar_interval hour/day/month/year; fixed_interval or
          legacy `interval` ms/s/m/h/d via TIME_BUCKET epoch
          bucketing, aggs_date_histogram.go), filters (named
          predicates -> FILTER-clause aggregates, single pass),
          filter (single named filter bucket, aggs_filter.go),
          geotile_grid (GEO_TILE_ES key + bounds pre-filter,
          aggs_geotile_grid.go);
          pipeline — bucket_script (params.x <op> params.y over
          sibling metrics, aggs_bucket_script.go) and bucket_sort
          (aggs_bucket_sort.go), both plan rewrites over the finished
          bucket set
  nesting: a terms/histogram/date_histogram bucket may hold ONE
          nested bucket agg (terms/histogram/date_histogram, + inner
          metric sub-aggs) — the proxy's aggsGenerateContext nesting,
          flattened to one row per (outer, inner) bucket in a single
          groupBy pass — or a terms bucket may hold ONE top_hits
          sub-agg (aggs_top_hits.go: per-bucket top-N raw rows via a
          partitioned row_number window)
  top level: query + aggs, or query + sort/size/_source (hits)

Unsupported, like the reference proxy: scoring, full-text analysis
chains; nesting deeper than two bucket levels.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ElasticDslError(ValueError):
    pass


# ---------------------------------------------------------------------
# date math (reference: elasticproxy/elastic-proxy/date_math.go)
# ---------------------------------------------------------------------

_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "H": 3600, "d": 86400, "w": 604800}


_ANCHOR_RE = re.compile(
    r"(\d{4})[.\-](\d{1,2})[.\-](\d{1,2})"
    r"(?:[T ](\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d{1,9}))?)?)?\Z"
)
_OP_RE = re.compile(r"([+\-])(\d+)([yMwdhHms])|/([yMwdhHms])")


def parse_date_math(expr: str, now=None):
    """Parse an Elastic date-math string — `now-7d/d`, `now/d+10m`,
    `2022.01.03 12:34||+1M` — into a datetime.

    Grammar (date_math_lexer.rl:48-75): anchor (`now`, or a
    `yyyy[.-]M[.-]d` date with optional `[T ]H:m[:s[.frac]]` time,
    followed by `||`), then ANY interleaving of `+Nu`/`-Nu` adjusts
    and `/u` roundings (u in y M w d h H m s), applied left to right.
    Calendar units (M, y, and w as 7 calendar days) shift via
    calendar arithmetic like the reference's AddDate, and `/w` rounds
    to SUNDAY ("we'll always round to the nearest sunday",
    date_math.go:62-65 — note real Elastic rounds to Monday; this
    follows the reference).  `now` is injectable so query plans are
    deterministic and testable."""
    import datetime as _dt

    if expr.startswith("now"):
        anchor = now or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        rest = expr[len("now"):]
    elif "||" in expr:
        raw, rest = expr.split("||", 1)
        m = _ANCHOR_RE.match(raw)
        if m:
            y, mo, d, hh, mm, ss, frac = m.groups()
            micros = int((frac or "0").ljust(6, "0")[:6])
            try:
                anchor = _dt.datetime(
                    int(y), int(mo), int(d), int(hh or 0), int(mm or 0),
                    int(ss or 0), micros)
            except ValueError as e:
                raise ElasticDslError(
                    f"bad date-math anchor {raw!r}") from e
        else:
            try:
                anchor = _dt.datetime.fromisoformat(raw)
            except ValueError as e:
                raise ElasticDslError(
                    f"bad date-math anchor {raw!r}") from e
    else:
        raise ElasticDslError(f"not a date-math expression: {expr!r}")

    pos = 0
    for m in _OP_RE.finditer(rest):
        if m.start() != pos:
            raise ElasticDslError(f"bad date-math ops {rest!r}")
        pos = m.end()
        if m.group(4):  # /u rounding
            anchor = _round_date(anchor, m.group(4))
        else:
            anchor = _adjust_date(
                anchor, int(m.group(2)) * (1 if m.group(1) == "+" else -1),
                m.group(3))
    if pos != len(rest):
        raise ElasticDslError(f"bad date-math ops {rest!r}")
    return anchor


def _adjust_date(anchor, n: int, unit: str):
    """date_math.go:30-47 adjust(): calendar arithmetic for y/M/w/d,
    fixed seconds for h/m/s."""
    import calendar as _cal
    import datetime as _dt

    if unit == "M":
        month0 = anchor.month - 1 + n
        year, month0 = anchor.year + month0 // 12, month0 % 12
        day = min(anchor.day, _cal.monthrange(year, month0 + 1)[1])
        return anchor.replace(year=year, month=month0 + 1, day=day)
    if unit == "y":
        try:
            return anchor.replace(year=anchor.year + n)
        except ValueError:  # Feb 29 -> Feb 28
            return anchor.replace(year=anchor.year + n, day=28)
    if unit in ("w", "d"):  # AddDate days — calendar, not seconds
        return anchor + _dt.timedelta(days=(7 * n if unit == "w" else n))
    return anchor + _dt.timedelta(seconds=n * _UNIT_SECONDS[unit])


def _round_date(anchor, unit: str):
    """date_math.go:53-76 round()."""
    import datetime as _dt

    if unit == "y":
        return anchor.replace(month=1, day=1, hour=0, minute=0,
                              second=0, microsecond=0)
    if unit == "M":
        return anchor.replace(day=1, hour=0, minute=0, second=0,
                              microsecond=0)
    if unit == "w":
        # the reference rounds to SUNDAY (date_math.go:62-65)
        anchor = anchor.replace(hour=0, minute=0, second=0, microsecond=0)
        return anchor - _dt.timedelta(days=(anchor.weekday() + 1) % 7)
    if unit == "d":
        return anchor.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit in ("h", "H"):
        return anchor.replace(minute=0, second=0, microsecond=0)
    if unit == "m":
        return anchor.replace(second=0, microsecond=0)
    return anchor.replace(microsecond=0)


def _maybe_date_math(val, now):
    if isinstance(val, str) and (val.startswith("now") or "||" in val):
        return parse_date_math(val, now)
    return val


# ---------------------------------------------------------------------
# query -> Column predicate
# ---------------------------------------------------------------------


def _geo_point(v) -> tuple[float, float]:
    """Normalize an Elastic geo-point to (lat, lon).  The proxy's
    geoPoint (geo_helpers.go:30-71) accepts the [lon, lat] array and
    'POINT (lon lat)' WKT forms; the {lat:, lon:} object is the
    common Kibana spelling."""
    if isinstance(v, dict):
        return float(v["lat"]), float(v["lon"])
    if isinstance(v, (list, tuple)) and len(v) == 2:
        return float(v[1]), float(v[0])
    if isinstance(v, str):
        m = re.fullmatch(
            r"POINT\s*\(\s*(-?[0-9.]+)\s+(-?[0-9.]+)\s*\)", v.strip())
        if m:
            return float(m.group(2)), float(m.group(1))
    raise ElasticDslError(f"bad geo-point {v!r}")


def _field_name(field: str, schema=None) -> str:
    """Resolve an Elastic field path: a trailing `.keyword` that does
    not itself resolve in the schema is the default keyword subfield
    (exact match on the base field — expr.go:650-655's no-mapping
    rule), so strip it.  Without a schema the name passes through."""
    if schema is not None and field.endswith(".keyword"):
        from .qs import _schema_type

        parts = field.split(".")
        if _schema_type(parts, schema) is None and _schema_type(
            parts[:-1], schema
        ) is not None:
            return field[: -len(".keyword")]
    return field


def _range_pred(field: str, spec: dict[str, Any], now=None,
                schema=None, mapping=None) -> Column:
    c = F.col(_field_name(field, schema))
    from .qs import _map_type, _schema_type

    is_ts = _schema_type(field.split("."), schema) == "timestamp"
    tm = _map_type(field, mapping)
    mtype = (tm or {}).get("type", "")
    pred = F.lit(True)
    ops = {"gt": c.__gt__, "gte": c.__ge__, "lt": c.__lt__, "lte": c.__le__}
    # the legacy from/to spelling (query.go Range: from/to +
    # include_lower/include_upper, null bound = unbounded) normalizes
    # to gt/gte/lt/lte
    spec = dict(spec)
    if "from" in spec or "to" in spec:
        lo, hi = spec.pop("from", None), spec.pop("to", None)
        inc_lo = spec.pop("include_lower", True)
        inc_hi = spec.pop("include_upper", True)
        if lo is not None:
            spec["gte" if inc_lo else "gt"] = lo
        if hi is not None:
            spec["lte" if inc_hi else "lt"] = hi
    seen = False
    for op, val in spec.items():
        if op in ("format", "time_zone", "boost"):
            continue
        if op not in ops:
            raise ElasticDslError(f"range op {op!r} on {field!r}")
        val = _maybe_date_math(val, now)
        is_num = isinstance(val, (int, float)) and not isinstance(val, bool)
        if mtype == "unix_nano_seconds" and is_num:
            # the proxy's TypeMapping for epoch-nanosecond fields
            # (query_converter_test.go:84-86): numbers are nanos
            lit = F.timestamp_micros(F.lit(int(val) // 1000))
        elif is_ts and is_num:
            # Elastic's default date format is
            # strict_date_optional_time||epoch_millis: a bare number
            # against a date field is epoch milliseconds
            lit = F.timestamp_millis(F.lit(int(val)))
        else:
            lit = F.lit(val)
        pred = pred & ops[op](lit)
        seen = True
    if not seen:
        raise ElasticDslError(f"empty range on {field!r}")
    return pred


def _wildcard_pred(field: str, pattern: str) -> Column:
    # Elastic wildcard: * = any run, ? = one char -> SQL LIKE
    esc = pattern.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
    return F.col(field).like(esc.replace("*", "%").replace("?", "_"))


def query_to_column(q: dict[str, Any] | None, now=None,
                    qs_mapping: dict[str, dict] | None = None,
                    qs_schema=None) -> Column:
    """Translate an Elastic `query` clause into a boolean Column.
    `now` anchors date-math range bounds (injectable for determinism)."""
    if q is None or q == {} or "match_all" in (q or {}):
        return F.lit(True)
    if len(q) != 1:
        raise ElasticDslError(f"query object must have one key, got {list(q)}")
    kind, body = next(iter(q.items()))

    if kind == "term":
        field, spec = next(iter(body.items()))
        val = spec["value"] if isinstance(spec, dict) else spec
        return F.col(_field_name(field, qs_schema)) == F.lit(val)
    if kind == "terms":
        field, vals = next(
            (k, v) for k, v in body.items() if k != "boost")
        return F.col(_field_name(field, qs_schema)).isin(list(vals))
    if kind == "range":
        field, spec = next(iter(body.items()))
        return _range_pred(field, spec, now, qs_schema, qs_mapping)
    if kind == "exists":
        return F.col(_field_name(body["field"], qs_schema)).isNotNull()
    if kind == "prefix":
        field, spec = next(iter(body.items()))
        val = spec["value"] if isinstance(spec, dict) else spec
        return _wildcard_pred(field, f"{val}*")
    if kind == "wildcard":
        field, spec = next(iter(body.items()))
        val = spec["value"] if isinstance(spec, dict) else spec
        return _wildcard_pred(field, val)
    if kind == "match":
        # no scoring/analyzers (reference proxy limitation too):
        # case-insensitive containment of the LITERAL query string —
        # LIKE metacharacters in the value are data, not pattern
        field, spec = next(iter(body.items()))
        val = spec["query"] if isinstance(spec, dict) else spec
        esc = str(val).replace("\\", "\\\\").replace("%", r"\%") \
                      .replace("_", r"\_")
        return F.col(field).ilike(f"%{esc}%")
    if kind == "match_phrase":
        # the reference proxy translates match_phrase to strict
        # equality for every type (elasticproxy/query.go:276-281,
        # Operator "=") — Kibana emits these for keyword/bool/numeric
        # fields
        field, spec = next(iter(body.items()))
        val = spec["query"] if isinstance(spec, dict) else spec
        return F.col(_field_name(field, qs_schema)) == F.lit(val)
    if kind == "match_none":
        return F.lit(False)
    if kind == "constant_score":
        # scoring is out of scope (like the proxy, query.go:259-269):
        # constant_score is just its filter
        filt = body.get("filter")
        if filt is None:
            return F.lit(True)
        clauses = filt if isinstance(filt, list) else [filt]
        pred = F.lit(True)
        for sub in clauses:
            pred = pred & query_to_column(sub, now, qs_mapping, qs_schema)
        return pred
    if kind == "geo_bounding_box":
        # query.go:287-307: per-field lat/lon comparisons against the
        # top_left / bottom_right corners (fields are structs with
        # .lat/.lon like the geotile aggs)
        pred = F.lit(True)
        for field, bounds in body.items():
            if field in ("type", "ignore_unmapped"):
                continue
            tl_lat, tl_lon = _geo_point(bounds["top_left"])
            br_lat, br_lon = _geo_point(bounds["bottom_right"])
            lat, lon = F.col(f"{field}.lat"), F.col(f"{field}.lon")
            pred = (pred & (lat <= F.lit(tl_lat))
                    & (lon >= F.lit(tl_lon))
                    & (lat >= F.lit(br_lat))
                    & (lon <= F.lit(br_lon)))
        return pred
    if kind == "query_string":
        # Lucene search-bar syntax (reference: elasticproxy/
        # elastic-proxy/qs_lexer.rl + qs_parser.y + qs.go) — parsed
        # and lowered by adapters.qs into pure col/lit/rlike
        # predicates; `now` is unused (qs has no date-math anchor)
        from .qs import qs_to_column

        return qs_to_column(body, mapping=qs_mapping, schema=qs_schema)
    if kind == "bool":
        def _clauses(key):
            v = body.get(key)
            # Elastic accepts a single clause object or a list
            return [] if v is None else (v if isinstance(v, list) else [v])

        pred = F.lit(True)
        for sub in _clauses("must") + _clauses("filter"):
            pred = pred & query_to_column(sub, now, qs_mapping, qs_schema)
        for sub in _clauses("must_not"):
            # null-safe: Elastic's must_not KEEPS docs where the inner
            # predicate can't match (e.g. term on a missing field);
            # a bare `~NULL` would be NULL and drop the row
            inner = F.coalesce(
                query_to_column(sub, now, qs_mapping, qs_schema),
                F.lit(False))
            pred = pred & ~inner
        should = [query_to_column(s, now, qs_mapping, qs_schema)
                  for s in _clauses("should")]
        if should:
            if "minimum_should_match" in body:
                msm = body["minimum_should_match"]
                if not isinstance(msm, int) or isinstance(msm, bool) or msm < 0:
                    raise ElasticDslError(
                        f"unsupported minimum_should_match {msm!r} "
                        "(only non-negative integers)"
                    )
            else:
                # Elastic default: should is required only when there
                # is no must/filter context
                msm = 1 if not (body.get("must") or body.get("filter")) else 0
            if msm > len(should):
                return F.lit(False)
            if msm > 0:
                # count satisfied should-clauses (NULL counts as not
                # matching) and require at least msm of them
                matched = sum(
                    (F.coalesce(s, F.lit(False)).cast("int") for s in should),
                    F.lit(0),
                )
                pred = pred & (matched >= F.lit(msm))
        return pred
    raise ElasticDslError(f"unsupported query kind {kind!r}")


# ---------------------------------------------------------------------
# aggs -> aggregate expressions / grouped DataFrame
# ---------------------------------------------------------------------

def _metric_exprs(
    name: str, spec: dict[str, Any], pred: Column | None = None
) -> list[Column]:
    """Aggregate expressions for one metric agg.  With `pred`, the
    metric is computed only over matching rows (the FILTER-clause
    form: non-matching rows become NULL, which every aggregate here
    ignores) — used by the `filters` bucket agg to evaluate all named
    buckets in a single scan."""
    if len(spec) != 1:
        raise ElasticDslError(f"agg {name!r} must have one kind")
    kind, body = next(iter(spec.items()))
    field = body.get("field")
    src = F.col(field) if field else None
    if src is not None and pred is not None:
        src = F.when(pred, src)
    if kind == "avg":
        return [F.avg(src).alias(name)]
    if kind == "sum":
        return [F.sum(src).alias(name)]
    if kind == "min":
        return [F.min(src).alias(name)]
    if kind == "max":
        return [F.max(src).alias(name)]
    if kind == "value_count":
        return [F.count(src).alias(name)]
    if kind == "cardinality":
        if "precision_threshold" in body:  # approximate, like Elastic HLL
            return [F.approx_count_distinct(src).alias(name)]
        return [F.count_distinct(src).alias(name)]
    if kind == "stats":
        return [
            F.count(src).alias(f"{name}_count"),
            F.min(src).alias(f"{name}_min"),
            F.max(src).alias(f"{name}_max"),
            F.avg(src).alias(f"{name}_avg"),
            F.sum(src).alias(f"{name}_sum"),
        ]
    if kind == "percentiles":
        if pred is not None:
            raise ElasticDslError("percentiles inside filters buckets unsupported")
        pcts = body.get("percents", [50.0])
        return [
            F.expr(f"percentile({field}, {p / 100.0})").alias(
                f"{name}_p{str(p).replace('.', '_')}"
            )
            for p in pcts
        ]
    if kind == "geo_centroid":
        # aggs_geo_centroid.go: {lat: AVG(field.lat), lon: AVG(field.lon)}
        # — flattened to two columns so tabular results stay oracle-checkable
        lat = F.col(f"{field}.lat")
        lon = F.col(f"{field}.lon")
        if pred is not None:
            lat, lon = F.when(pred, lat), F.when(pred, lon)
        return [F.avg(lat).alias(f"{name}_lat"), F.avg(lon).alias(f"{name}_lon")]
    raise ElasticDslError(f"unsupported metric agg {kind!r}")


def _sub_metric_exprs(
    sub_aggs: dict[str, Any] | None,
    pred: Column | None = None,
    prefix: str = "",
    ctx: tuple | None = None,
) -> list[Column]:
    """`ctx` is the (now, qs_mapping, schema) triple threaded from
    elastic_search so nested `filter` predicates resolve date-math
    anchors, typed range bounds, and .keyword fields the same way
    top-level queries do."""
    now, qs_mapping, schema = ctx or (None, None, None)
    out: list[Column] = []
    for sub_name, sub_spec in (sub_aggs or {}).items():
        if "filter" in sub_spec:
            # a `filter` agg nested under a bucket compiles to
            # FILTER-clause aggregates inside the same pass, exactly
            # like the proxy (testaggs/issue-67: COUNT(*) FILTER
            # (WHERE ...) AS "aggsN:$doc_count")
            fpred = query_to_column(
                sub_spec["filter"], now, qs_mapping, schema)
            if pred is not None:
                fpred = pred & fpred
            out.append(
                F.count(F.when(fpred, F.lit(1)))
                .alias(f"{prefix}{sub_name}_doc_count"))
            out.extend(_sub_metric_exprs(
                sub_spec.get("aggs"), fpred,
                prefix=f"{prefix}{sub_name}_", ctx=ctx))
            continue
        out.extend(_metric_exprs(prefix + sub_name, sub_spec, pred))
    return out


def _filter_metric_like(spec: dict[str, Any]) -> bool:
    """True when a sub-agg is a `filter` whose own sub-aggs (if any)
    are all metrics — compilable as FILTER-clause aggregates in the
    parent bucket's pass rather than a nested bucket."""
    if "filter" not in spec:
        return False
    return not any(
        set(v) & _BUCKET_KINDS for v in (spec.get("aggs") or {}).values()
    )


_CAL_INTERVALS = {
    "hour": "hour", "1h": "hour",
    "day": "day", "1d": "day",
    "month": "month", "1M": "month",
    "year": "year", "1y": "year",
}


_BUCKET_KINDS = {
    "terms", "multi_terms", "histogram", "date_histogram", "filters",
    "filter", "geotile_grid",
}
_PIPELINE_KINDS = {"bucket_script", "bucket_sort"}


def _apply_pipeline_aggs(out: DataFrame, pipeline: dict[str, Any]) -> DataFrame:
    """Pipeline aggs over already-computed buckets (reference:
    aggs_bucket_script.go / aggs_bucket_sort.go — both operate on the
    finished bucket set, never on raw rows).  bucket_script computes a
    derived per-bucket column `params.X <op> params.Y` over sibling
    metric columns (the reference supports only '+'; this accepts
    + - * /); bucket_sort re-sorts the buckets by sub-agg values and
    truncates to `size`.  Both are driver-side plan rewrites — a
    projection and an orderBy/limit over the (small) aggregated
    DataFrame, no extra scan."""
    import re as _re

    _OPS = {
        "+": lambda a, b: a + b,
        "-": lambda a, b: a - b,
        "*": lambda a, b: a * b,
        "/": lambda a, b: a / b,
    }
    for name, spec in pipeline.items():
        if "bucket_script" in spec:
            body = spec["bucket_script"]
            m = _re.fullmatch(
                r"params\.(\w+)\s*([+\-*/])\s*params\.(\w+)",
                body.get("script", ""),
            )
            if m is None:
                raise ElasticDslError(
                    f"unsupported bucket_script {body.get('script')!r} "
                    "(form: params.x <op> params.y)"
                )
            paths = body.get("buckets_path", {})
            try:
                left, right = paths[m.group(1)], paths[m.group(3)]
            except KeyError as e:
                raise ElasticDslError(
                    f"bucket_script param {e} missing from buckets_path"
                ) from None
            out = out.withColumn(
                name, _OPS[m.group(2)](F.col(left), F.col(right))
            )
    for name, spec in pipeline.items():
        if "bucket_sort" in spec:
            body = spec["bucket_sort"]
            exprs: list[Column] = []
            for s in body.get("sort", []):
                (fld, o), = s.items() if isinstance(s, dict) else ((s, "asc"),)
                order = o.get("order", "asc") if isinstance(o, dict) else o
                exprs.append(F.desc(fld) if order == "desc" else F.asc(fld))
            if exprs:
                out = out.orderBy(*exprs)
            if body.get("size"):
                out = out.limit(int(body["size"]))
    return out


_FIXED_UNIT_S = {"ms": 0.001, "s": 1, "m": 60, "h": 3600, "d": 86400}


def _date_hist_key(body: dict[str, Any], alias: str) -> Column:
    """date_histogram key: calendar intervals truncate to the unit;
    fixed intervals epoch-bucket like the reference's translation to
    TIME_BUCKET(field, seconds) (aggs_date_histogram.go — e.g. Kibana's
    fixed_interval "10d" becomes TIME_BUCKET(ts, 864000))."""
    # legacy `interval` (pre-7.x Elastic, still emitted by clients —
    # testaggs/issue-67 uses interval "86400s") acts as fixed
    iv = (body.get("calendar_interval") or body.get("fixed_interval")
          or body.get("interval"))
    unit = _CAL_INTERVALS.get(iv)
    if unit is not None:
        return F.date_trunc(unit, F.col(body["field"])).alias(alias)
    m = re.fullmatch(r"(\d+)(ms|s|m|h|d)", iv or "")
    if not m:
        raise ElasticDslError(f"unsupported date_histogram interval {iv!r}")
    secs = int(m.group(1)) * _FIXED_UNIT_S[m.group(2)]
    from ..functions import time_bucket

    return time_bucket(F.col(body["field"]), secs).alias(alias)


def _bucket_key_col(kind: str, body: dict[str, Any], alias: str) -> Column:
    """The grouping key expression for one bucket agg level."""
    if kind == "terms":
        return F.col(body["field"]).alias(alias)
    if kind == "histogram":
        interval = float(body["interval"])
        return (F.floor(F.col(body["field"]) / interval) * interval).alias(alias)
    if kind == "date_histogram":
        return _date_hist_key(body, alias)
    raise ElasticDslError(f"unsupported nested bucket kind {kind!r}")


def _terms_order(body: dict[str, Any], count_col: str,
                 key_col: str) -> list[Column]:
    """Sort expressions for a terms bucket: explicit _count/_key
    order when given, else Elastic's default (count desc), always
    with the key as deterministic tiebreak."""
    order = body.get("order") or {"_count": "desc"}
    if isinstance(order, list):
        order = {k: v for d in order for k, v in d.items()}
    exprs: list[Column] = []
    for k, v in order.items():
        col = {"_count": count_col, "_key": key_col}.get(k)
        if col is None:
            # Kibana emits sub-agg metric paths as order keys (e.g.
            # {"2.50": "desc"} = sub-agg 2's 50th percentile — the
            # dashboard-cloud-trail corpus).  The reference's switch
            # matches only _count/_key and silently drops anything
            # else (aggs_terms.go:38-52), leaving the SQL with a LIMIT
            # but NO ORDER BY — an arbitrary bucket subset when the
            # size cap binds.  Mirror the drop; the default-order
            # fallback below keeps OUR cap deterministic (equal to the
            # reference whenever the cap does not bind).
            continue
        exprs.append(F.desc(col) if v == "desc" else F.asc(col))
    if not exprs:
        exprs.append(F.desc(count_col))
    exprs.append(F.asc(key_col))
    return exprs


def _nested_bucket_df(
    df: DataFrame,
    outer_kind: str,
    outer_body: dict[str, Any],
    inner_name: str,
    inner_spec: dict[str, Any],
    ctx: tuple | None = None,
) -> DataFrame:
    """Bucket agg containing a nested bucket agg (the reference
    proxy's aggsGenerateContext nesting — elasticproxy/elastic-proxy/
    aggs_terms.go builds GROUP BY over every nesting level's key in ONE
    query; nestingLevel > 1 caps inner buckets at its groupByLimit).
    The outer level may be terms (doc-count-desc order + size cap) or
    histogram/date_histogram (key-asc order, no cap — Kibana's
    delay-type dashboard shape, aggs_date_histogram.go).

    Flattened tabular output, one row per (outer bucket, inner bucket):
    `key`/`doc_count` for the outer level, `<inner>_key`/
    `<inner>_doc_count` (+ metric sub-aggs) for the inner level.  One
    groupBy over both keys; the outer doc_count is a window sum and
    both size caps are rank filters over the (small) aggregated result
    — never a second scan of the input."""
    from pyspark.sql import Window

    inner_kind = next((k for k in inner_spec if k in _BUCKET_KINDS), None)
    if inner_kind in ("filters", "multi_terms"):
        raise ElasticDslError(f"nested {inner_kind} buckets unsupported")
    inner_body = inner_spec[inner_kind]
    metrics = _sub_metric_exprs(inner_spec.get("aggs"), ctx=ctx)
    okey = _bucket_key_col(outer_kind, outer_body, "key")
    ikey = _bucket_key_col(inner_kind, inner_body, f"{inner_name}_key")
    icnt = f"{inner_name}_doc_count"

    grouped = df.groupBy(okey, ikey).agg(F.count(F.lit(1)).alias(icnt), *metrics)
    out = grouped.withColumn(
        "doc_count", F.sum(icnt).over(Window.partitionBy("key"))
    )
    if outer_kind == "terms":
        # outer bucket order/cap: Elastic terms default (doc_count
        # desc, key asc), explicit _key/_count `order` honored (the
        # venkat-keyorder dashboard shape); dense_rank over the order
        # ranks each outer bucket.  The unpartitioned window runs over
        # the POST-AGGREGATION bucket set (one row per (outer, inner)
        # group), never raw rows — bounded by key cardinality, so the
        # single-partition WindowExec is a few-KB sort, not a scale
        # hazard.
        out = out.withColumn(
            "_orank",
            F.dense_rank().over(Window.orderBy(
                *_terms_order(outer_body, "doc_count", "key"))),
        ).filter(F.col("_orank") <= int(outer_body.get("size", 10)))
        outer_sort = [F.asc("_orank")]
    else:
        # histogram levels are key-ordered and uncapped — sort by the
        # key directly (no global rank window needed)
        outer_sort = [F.asc("key")]
    inner_size = int(inner_body.get("size", 10)) if inner_kind == "terms" else None
    order_inner = (_terms_order(inner_body, icnt, f"{inner_name}_key")
                   if inner_kind == "terms"
                   else [F.asc(f"{inner_name}_key")])
    out = out.withColumn(
        "_irank",
        F.row_number().over(Window.partitionBy("key").orderBy(*order_inner)),
    )
    if inner_size is not None:
        out = out.filter(F.col("_irank") <= inner_size)
    cols = ["key", "doc_count", f"{inner_name}_key", icnt] + [
        c for c in grouped.columns if c not in ("key", f"{inner_name}_key", icnt)
    ]
    return out.orderBy(*outer_sort, F.asc("_irank")).select(*cols)


def _top_hits_df(
    df: DataFrame,
    outer_body: dict[str, Any],
    name: str,
    spec: dict[str, Any],
) -> DataFrame:
    """top_hits sub-agg of a terms bucket (aggs_top_hits.go): the
    reference compiles it to ROW_NUMBER() OVER (PARTITION BY the group
    keys ORDER BY the sort fields) with a rank cutoff and the _source
    projection — the same window this produces.  (The reference's
    cutoff is `row_number < size`, which drops the size-th hit; Elastic
    returns `size` hits, so this uses <= — divergence documented.)

    Flattened rows: (key, doc_count, hit_rank, <included columns>),
    outer buckets capped and ordered the Elastic way.  One window over
    the raw rows + one window pair over bucket stats; no self-join."""
    from pyspark.sql import Window

    size = int(spec.get("size", 3))
    sort_exprs: list[Column] = []
    for s in spec.get("sort", []):
        (fld, o), = s.items() if isinstance(s, dict) else ((s, "asc"),)
        order = o.get("order", "asc") if isinstance(o, dict) else o
        # the bucket field is renamed to 'key' before the window; a
        # sort on it is constant within a bucket but legal DSL — map
        # it instead of letting the window raise unresolved-column
        if fld == outer_body["field"]:
            fld = "key"
        sort_exprs.append(F.desc(fld) if order == "desc" else F.asc(fld))
    if not sort_exprs:
        raise ElasticDslError("top_hits needs a sort (hits have no score here)")
    includes = (spec.get("_source") or {}).get("includes") or [
        c for c in df.columns if c != outer_body["field"]
    ]
    # Elastic sorts and projects independently: sort fields outside
    # _source.includes must still be selectable for the window
    sort_fields = []
    for s in spec.get("sort", []):
        (fld, _), = s.items() if isinstance(s, dict) else ((s, None),)
        sort_fields.append(fld)
    carry = includes + [f for f in sort_fields
                        if f not in includes and f != outer_body["field"]]
    okey = F.col(outer_body["field"]).alias("key")
    base = df.select(okey, *[F.col(c) for c in carry])
    base = base.withColumn(
        "doc_count", F.count(F.lit(1)).over(Window.partitionBy("key"))
    ).withColumn(
        "hit_rank",
        F.row_number().over(Window.partitionBy("key").orderBy(*sort_exprs)),
    ).filter(F.col("hit_rank") <= size)
    # unpartitioned rank over the bucket list only (row_number above
    # already capped hits per bucket inside a keyed window); bounded
    # by the terms-key cardinality, not the input size
    base = base.withColumn(
        "_orank",
        F.dense_rank().over(Window.orderBy(F.desc("doc_count"), F.asc("key"))),
    ).filter(F.col("_orank") <= int(outer_body.get("size", 10)))
    return base.orderBy("_orank", "hit_rank").select(
        "key", "doc_count", "hit_rank", *includes
    )


def _resolve_agg_fields(node, schema):
    """Normalize every ``"field"`` reference in an aggs tree through
    `_field_name` — the default-keyword rule (a trailing `.keyword`
    that isn't a real subfield means exact match on the base field,
    expr.go:650-655) applies to agg fields exactly as to query fields;
    Kibana emits `eventSource.keyword` etc. for every terms tile
    (the dashboard-cloud-trail corpus).  The query path resolves
    per-predicate; the aggs path resolves once up front."""
    if isinstance(node, dict):
        return {
            k: (_field_name(v, schema)
                if k == "field" and isinstance(v, str)
                else _resolve_agg_fields(v, schema))
            for k, v in node.items()
        }
    if isinstance(node, list):
        return [_resolve_agg_fields(v, schema) for v in node]
    return node


def aggs_to_df(df: DataFrame, aggs: dict[str, Any], now=None,
               qs_mapping: dict[str, dict] | None = None) -> DataFrame:
    """Translate an `aggs` object.  Exactly one bucket agg per nesting
    level (with optional metric sub-aggs; a terms/histogram/
    date_histogram bucket may instead hold ONE nested bucket agg) or a
    flat set of metric aggs.  `now`/`qs_mapping` thread into nested
    filter predicates (date math, typed ranges) with df's schema."""
    if df is not None:
        aggs = _resolve_agg_fields(aggs, df.schema)
    ctx = (now, qs_mapping,
           df.schema if df is not None else None)
    bucket_items = [
        (n, s) for n, s in aggs.items()
        if set(s) & _BUCKET_KINDS and not _filter_metric_like(s)
        or "filter" in s  # top-level filter stays a bucket
    ]
    if not bucket_items:
        return df.agg(*_sub_metric_exprs(aggs, ctx=ctx))
    if len(bucket_items) > 1:
        raise ElasticDslError("one bucket agg per level (like elasticproxy)")
    name, spec = bucket_items[0]
    # metric aggs beside the bucket at the same level (testaggs/
    # avg-filter-combined1) compute over the same filtered source in
    # one extra aggregate and attach as constant columns
    side = {
        n: s for n, s in aggs.items()
        if n != name and not set(s) & (_BUCKET_KINDS | _PIPELINE_KINDS)
    }
    side_df = df.agg(*_sub_metric_exprs(side, ctx=ctx)) if side else None
    sub = {k: v for k, v in spec.items() if k == "aggs"}.get("aggs")
    kind = next(k for k in spec if k in _BUCKET_KINDS)
    body = spec[kind]
    nested = [
        (n, s) for n, s in (sub or {}).items()
        if set(s) & _BUCKET_KINDS and not _filter_metric_like(s)
    ]
    if nested:
        if kind not in ("terms", "histogram", "date_histogram") or len(nested) > 1:
            raise ElasticDslError(
                "nested buckets: exactly one, inside a terms/histogram/"
                "date_histogram bucket"
            )
        if len(sub) > 1:
            raise ElasticDslError(
                "metric sub-aggs beside a nested bucket unsupported "
                "(put them on the inner level)"
            )
        out = _nested_bucket_df(df, kind, body, *nested[0], ctx=ctx)
        if side_df is not None:
            out = out.crossJoin(F.broadcast(side_df))
        return out
    hits = [(n, s["top_hits"]) for n, s in (sub or {}).items() if "top_hits" in s]
    if hits:
        if kind != "terms" or len(hits) > 1 or len(sub) > 1:
            raise ElasticDslError(
                "top_hits: exactly one, as the only sub-agg of a terms bucket"
            )
        out = _top_hits_df(df, body, *hits[0])
        if side_df is not None:
            out = out.crossJoin(F.broadcast(side_df))
        return out
    pipeline = {
        n: s for n, s in (sub or {}).items() if set(s) & _PIPELINE_KINDS
    }
    if pipeline:
        sub = {n: s for n, s in sub.items() if n not in pipeline} or None
    metrics = _sub_metric_exprs(sub, ctx=ctx)

    def _finish(out: DataFrame) -> DataFrame:
        if side_df is not None:
            # 1-row metrics attach as constant columns (broadcast)
            out = out.crossJoin(F.broadcast(side_df))
        return _apply_pipeline_aggs(out, pipeline) if pipeline else out

    if kind == "multi_terms":
        # composite-key terms buckets (reference:
        # elasticproxy/elastic-proxy/aggs_multi_terms.go:28-78 — GROUP
        # BY every listed field, COUNT(*) doc_count, default order
        # doc-count DESC, LIMIT size).  Keys surface as key_0..key_n-1
        # so heterogeneous field names never collide.
        fields = [t["field"] for t in body["terms"]]
        if not fields:
            raise ElasticDslError("multi_terms needs at least one term field")
        size = int(body.get("size", 10))
        keys = [F.col(f).alias(f"key_{i}") for i, f in enumerate(fields)]
        out = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("doc_count"), *metrics)
        order = body.get("order") or {"_count": "desc"}
        if isinstance(order, list):  # Elastic also accepts a list of
            # single-key dicts; flatten preserving precedence
            order = {k: v for d in order for k, v in d.items()}
        sort_exprs: list[Column] = []
        for k, v in order.items():
            if k == "_count":
                sort_exprs.append(
                    F.desc("doc_count") if v == "desc" else F.asc("doc_count")
                )
            elif k == "_key":
                sort_exprs.extend(
                    F.desc(f"key_{i}") if v == "desc" else F.asc(f"key_{i}")
                    for i in range(len(fields))
                )
            else:
                raise ElasticDslError(f"unsupported multi_terms order key {k!r}")
        # deterministic tiebreak on the keys (Elastic buckets are
        # key-ordered within equal counts)
        sort_exprs.extend(F.asc(f"key_{i}") for i in range(len(fields)))
        return _finish(out.orderBy(*sort_exprs).limit(size))
    if kind == "terms":
        size = int(body.get("size", 10))
        out = df.groupBy(F.col(body["field"]).alias("key")).agg(
            F.count(F.lit(1)).alias("doc_count"), *metrics
        )
        # Elastic default order: doc_count desc, key asc; an explicit
        # `order` of _count/_key overrides (aggs_terms.go; testaggs/
        # issue-54 pins {_key: asc})
        return _finish(
            out.orderBy(*_terms_order(body, "doc_count", "key"))
            .limit(size))
    if kind == "histogram":
        interval = float(body["interval"])
        key = (F.floor(F.col(body["field"]) / interval) * interval).alias("key")
        return _finish(
            df.groupBy(key).agg(F.count(F.lit(1)).alias("doc_count"), *metrics)
        )
    if kind == "date_histogram":
        key = _date_hist_key(body, "key")
        return _finish(
            df.groupBy(key)
            .agg(F.count(F.lit(1)).alias("doc_count"), *metrics)
            .orderBy("key")
        )
    if kind == "filters":
        # named predicate buckets -> conditional aggregates, ONE scan
        exprs: list[Column] = []
        for bname, bq in body["filters"].items():
            pred = query_to_column(bq, now, qs_mapping, df.schema)
            exprs.append(F.count(F.when(pred, 1)).alias(f"{bname}_doc_count"))
            exprs.extend(_sub_metric_exprs(
                sub, pred, prefix=f"{bname}_", ctx=ctx))
        return _finish(df.agg(*exprs))
    if kind == "filter":
        # SINGLE named filter bucket (aggs_filter.go): doc_count over
        # matching rows + sub-aggs restricted to them — conditional
        # aggregates, one scan, same discipline as `filters`
        pred = query_to_column(body, now, qs_mapping, df.schema)
        return _finish(
            df.agg(
                F.count(F.when(pred, 1)).alias("doc_count"),
                *_sub_metric_exprs(sub, pred, ctx=ctx),
            )
        )
    if kind == "geotile_grid":
        # aggs_geotile_grid.go: GROUP BY GEO_TILE_ES(field.lat,
        # field.lon, precision), optional bounds pre-filter, doc-count
        # desc order with deterministic key tiebreak, size cap
        from ..functions.scalar import geo_tile_es

        precision = int(body.get("precision", 7))
        if not 0 <= precision <= 29:
            raise ElasticDslError(f"invalid geotile precision {precision}")
        field = body["field"]
        lat, lon = F.col(f"{field}.lat"), F.col(f"{field}.lon")
        src_df = df
        if "bounds" in body:
            b = body["bounds"]
            tl_lat, tl_lon = _geo_point(b["top_left"])
            br_lat, br_lon = _geo_point(b["bottom_right"])
            src_df = df.filter(
                (lat <= F.lit(tl_lat)) & (lon >= F.lit(tl_lon))
                & (lat >= F.lit(br_lat)) & (lon <= F.lit(br_lon))
            )
        # Elastic skips docs missing the geo field; without this filter
        # a NULL lat/lon would land in a bogus truncated bucket because
        # geo_tile_es's concat_ws silently drops NULL parts
        src_df = src_df.filter(lat.isNotNull() & lon.isNotNull())
        out = src_df.groupBy(
            geo_tile_es(lat, lon, precision).alias("key")
        ).agg(F.count(F.lit(1)).alias("doc_count"), *metrics)
        size = int(body.get("size", 10000))
        return _finish(
            out.orderBy(F.desc("doc_count"), F.asc("key")).limit(size)
        )
    raise ElasticDslError(f"unsupported bucket agg {kind!r}")


def elastic_search(df: DataFrame, body: dict[str, Any], now=None,
                   qs_mapping: dict[str, dict] | None = None) -> DataFrame:
    """Run an Elastic search body against a DataFrame: `query` filters,
    then either `aggs` (returns buckets/metrics) or hits (`sort`,
    `size`, `_source` projection)."""
    out = df.filter(
        query_to_column(body.get("query"), now, qs_mapping, df.schema))
    # `"aggs": null` / `"aggs": {}` mean NO aggregations, not an empty
    # bucket set — Kibana's flight-log request ships literal null, and
    # the total-count dashboard tiles ship {} (the proxy reads only
    # $total_count from those); both fall through to the hits path
    aggs = body.get("aggs") or body.get("aggregations")
    if aggs:
        return aggs_to_df(out, aggs, now, qs_mapping)
    # Elastic sort is lexicographic over the listed keys (first key
    # primary); collect every key into ONE orderBy — chained orderBy
    # calls would each REPLACE the previous sort
    sort_exprs: list[Column] = []
    for s in body.get("sort", []):
        if isinstance(s, str):
            # bare-string sort keys are an extension (the proxy's
            # SortField only unmarshals the object form); Elastic's own
            # default for them is ascending
            sort_exprs.append(F.asc(s))
        else:
            (field, spec), = s.items()
            # omitted `order` means DESC in the proxy
            # (elastic_json.go:113-115 SortField.UnmarshalJSON)
            order = spec.get("order", "desc") if isinstance(spec, dict) else spec
            sort_exprs.append(F.asc(field) if order == "asc" else F.desc(field))
    if sort_exprs:
        out = out.orderBy(*sort_exprs)
    src = body.get("_source")
    if isinstance(src, str):  # Elastic accepts a bare field name
        out = out.select(src)
    elif isinstance(src, list):
        out = out.select(*src)
    # _source true/false/absent: keep all columns
    if body.get("from"):
        # hits pagination (testdata-news/pagination-from): skip the
        # first `from` hits of the sorted result
        out = out.offset(int(body["from"]))
    if "size" in body:
        out = out.limit(int(body["size"]))
    return out
