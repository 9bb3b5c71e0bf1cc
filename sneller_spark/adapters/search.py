"""End-to-end Elastic `_search`: request body in, Elastic JSON out.

This joins the proxy's two halves as one native surface:

  request ──(adapters/elastic.py: DSL → Catalyst plans, run on Spark)──►
  flat raw rows in the proxy's step-3 shape ──(adapters/
  elastic_response.py: pre_process + convert_result, artifact-proven
  against every recorded step-4/step-5 capture)──► response envelope

`execute_raw` mirrors the *query generation* contract of the
reference's SQL generator (ref: elasticproxy/elastic-proxy/
elastic_json.go:340-474 and aggs_generate_context.go): one
`$total_count` scalar, an optional `$hits` row set, a metrics-only
`"$bucket:%0"` row, one `"$bucket:<name>%0"` row set per top-level
bucket aggregation (metric and FILTER-clause sub-aggs ride along as
extra columns), and one `"$bucket:<outer>:<inner>%0"` row set per
nested bucket level — the exact key layout the recorded
`*-3-output.json` captures use, so the assembly half consumes it
unchanged.

Spark does all the heavy lifting: every bucket set is one
DataFrame aggregation (grouped, FILTER-clause metrics fused into the
same pass), and only the final already-aggregated buckets (bounded by
`size`) plus at most `size` hits are collected to the driver.

Equivalence is pinned scenario-by-scenario in
`tests/test_search_json.py`: for all 34 recorded dashboards/searches,
the raw produced here equals the raw produced by executing the
proxy's *recorded* WITH-form SQL over the same synthesized tables.
"""
from __future__ import annotations

import re
from datetime import datetime, timezone
from decimal import Decimal
from typing import Any

from pyspark.sql import DataFrame

from .elastic import (
    _BUCKET_KINDS,
    _PIPELINE_KINDS,
    ElasticDslError,
    _filter_metric_like,
    elastic_search,
    query_to_column,
)
from .elastic_response import convert_result

TOTAL_COUNT = "$total_count"
HITS = "$hits"


def _bucket_kind(spec: dict[str, Any]) -> str | None:
    return next((k for k in spec if k in _BUCKET_KINDS), None)


def _is_pipeline(spec: dict[str, Any]) -> bool:
    return bool(set(spec) & _PIPELINE_KINDS)


def _strip_pipeline(aggs: dict[str, Any]) -> dict[str, Any]:
    """bucket_script/bucket_sort are response post-processing
    (convert_result runs them); they never reach the query.  Also
    normalizes the `aggregations` alias to `aggs` at every level — an
    Elastic-compatible extension: the proxy IGNORES the alias at top
    level (ElasticJSON json:\"aggs\" tag) and hard-errors on it nested
    (aggregation.UnmarshalJSON `invalid field`), but our response
    half already reads both, so the query half must compute both."""
    out = {}
    for n, s in aggs.items():
        if _is_pipeline(s):
            continue
        s = dict(s)
        if s.get("aggregations") and not s.get("aggs"):
            s["aggs"] = s.pop("aggregations")
        if s.get("aggs"):
            sub = _strip_pipeline(s["aggs"])
            if sub:
                s["aggs"] = sub
            else:
                del s["aggs"]
        out[n] = s
    return out


def _py(v: Any) -> Any:
    """Row value → the type the ION-revived raw would carry."""
    if isinstance(v, Decimal):
        f = float(v)
        return int(f) if f.is_integer() else f
    if isinstance(v, datetime) and v.tzinfo is None:
        # session tz is UTC (session.py:48); the proxy's time.Time
        # values are tz-aware UTC
        return v.replace(tzinfo=timezone.utc)
    if isinstance(v, list):
        return [_py(x) for x in v]
    if isinstance(v, dict):
        return {k: _py(x) for k, x in v.items()}
    return v


def _epoch_s(v: Any) -> Any:
    """Fixed-interval date_histogram keys travel as epoch-second ints
    (the generator's TIME_BUCKET, aggs_date_histogram.go); calendar
    intervals stay timestamps (DATE_TRUNC) — convert_result branches
    on exactly that split (elastic_response.py _process_bucket)."""
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return int(v.timestamp())
    return v


def _fixed_date_hist(spec: dict[str, Any], kind: str) -> bool:
    if kind != "date_histogram":
        return False
    iv = spec[kind].get("fixed_interval") or spec[kind].get("interval")
    if not iv:
        return False
    m = re.fullmatch(r"(\d+)ms", str(iv))
    if m and int(m.group(1)) % 1000:
        # the raw layout carries fixed-interval keys as epoch-SECOND
        # ints (TIME_BUCKET), so sub-second buckets would silently
        # merge; the DataFrame path (elastic_search) supports them
        raise ElasticDslError(
            "sub-second fixed_interval is not representable in the "
            "proxy's epoch-second raw keys; use elastic_search for "
            "the DataFrame form")
    return True


def _fold_geo(rows, sub: dict[str, Any]):
    """Reassemble geo_centroid's flattened <name>_lat/<name>_lon
    columns into the {'lat':…,'lon':…} struct the generator projects
    (aggs_geo_centroid.go:20-31) and LocationResult expects."""
    geo = [n for n, s in sub.items() if "geo_centroid" in s]
    if not geo:
        return rows
    for r in ([rows] if isinstance(rows, dict) else rows):
        for g in geo:
            if f"{g}_lat" in r or f"{g}_lon" in r:
                r[g] = {"lat": r.pop(f"{g}_lat", None),
                        "lon": r.pop(f"{g}_lon", None)}
    return rows


def _rows(df: DataFrame) -> list[dict[str, Any]]:
    return [{k: _py(v) for k, v in r.asDict(recursive=True).items()}
            for r in df.collect()]


def _rename(rows: list[dict], mapping: dict[str, str],
            epoch_cols: set[str]) -> list[dict]:
    out = []
    for r in rows:
        rr = {}
        for k, v in r.items():
            nk = mapping.get(k, k)
            rr[nk] = _epoch_s(v) if nk in epoch_cols else v
        out.append(rr)
    return out


def execute_raw(df: DataFrame, body: dict[str, Any], now=None,
                qs_mapping: dict[str, dict] | None = None
                ) -> dict[str, Any]:
    """Run the request's query plan on Spark and return the flat raw
    result in the proxy's step-3 shape."""
    query = body.get("query")
    filtered = df.filter(query_to_column(query, now, qs_mapping, df.schema))
    raw: dict[str, Any] = {TOTAL_COUNT: filtered.count()}

    # --- $hits: emitted whenever the effective size is > 0
    # (elastic_json.go:340-345 — default 10) ---------------------------
    size = 10 if body.get("size") is None else int(body["size"])
    if size > 0:
        hits_body = {k: v for k, v in body.items()
                     if k in ("query", "sort", "from")}
        hits_body["size"] = size
        raw[HITS] = _rows(elastic_search(df, hits_body, now, qs_mapping))

    aggs = _strip_pipeline(body.get("aggs")
                           or body.get("aggregations") or {})
    if not aggs:
        return raw

    def _reject_top_hits(tree: dict[str, Any]) -> None:
        for s in tree.values():
            if "top_hits" in s:
                # the proxy's own result processor hard-errors on
                # top_hits (aggs_top_hits.go:97 / _process_metric);
                # the DataFrame path (elastic_search) supports it as
                # an extension, but the envelope surface stays
                # reference-faithful
                raise ElasticDslError(
                    "top_hits is not supported by search_json (the "
                    "reference proxy errors too); use elastic_search "
                    "for the DataFrame form")
            _reject_top_hits(s.get("aggs") or {})

    _reject_top_hits(aggs)

    def run_slice(slice_aggs: dict[str, Any]) -> list[dict]:
        return _rows(elastic_search(
            df, {"query": query, "aggs": slice_aggs}, now, qs_mapping))

    # --- metrics-only "$bucket:%0" ------------------------------------
    metric_slice = {n: s for n, s in aggs.items() if _bucket_kind(s) is None}
    if metric_slice:
        rows = run_slice(metric_slice)
        row = _fold_geo(rows[0] if rows else {}, metric_slice)
        row["$dummy$"] = False  # the generator's constant grouping key
        # a one-row subselect decodes from ION as a single struct, and
        # pre_process branches on exactly that shape
        raw["$bucket:%0"] = row

    def _and_query(*qs):
        qs = [x for x in qs if x]
        if not qs:
            return None
        return qs[0] if len(qs) == 1 else {"bool": {"filter": qs}}

    def _keyless_bucket(fquery, sub: dict[str, Any]) -> dict[str, Any]:
        """The generator's keyless COUNT(*) bucket for filter/filters
        levels (aggs_filter.go:23-33, aggs_filters.go:48-69): a
        single struct with $doc_count plus any metric sub-aggs, all in
        ONE aggregation job."""
        from pyspark.sql import functions as F

        from .elastic import _metric_exprs

        if any(_bucket_kind(s) is not None for s in sub.values()):
            raise ElasticDslError(
                "bucket aggs nested under a top-level filter/filters "
                "agg are not supported by search_json")
        fdf = df.filter(query_to_column(_and_query(query, fquery),
                                        now, qs_mapping, df.schema))
        exprs = [F.count(F.lit(1)).alias("$doc_count")]
        for n, s in sub.items():
            exprs.extend(_metric_exprs(n, s))
        [row] = fdf.agg(*exprs).collect()
        return _fold_geo(
            {k: _py(v) for k, v in row.asDict(recursive=True).items()},
            sub)

    # --- one CTE per bucket level -------------------------------------
    for name, spec in aggs.items():
        kind = _bucket_kind(spec)
        if kind is None:
            continue

        # filter/filters levels are keyless: one struct per named
        # filter at the bucket path, no $key columns — pre_process
        # rebuilds the group from the path segment itself
        if kind == "filter":
            raw[f"$bucket:{name}%0"] = _keyless_bucket(
                spec["filter"], spec.get("aggs") or {})
            continue
        if kind == "filters":
            named = spec["filters"]["filters"]
            fsub = spec.get("aggs") or {}
            if not fsub:
                # common Kibana shape (plain named filters): ONE scan,
                # one FILTER-clause count per name — the same fusion
                # elastic.py's own filters path uses
                from pyspark.sql import functions as F

                base = df.filter(query_to_column(query, now, qs_mapping,
                                                 df.schema))
                names = sorted(named)
                exprs = [
                    F.count(F.when(query_to_column(
                        named[fname], now, qs_mapping, df.schema),
                        F.lit(1))).alias(f"_f{i}")
                    for i, fname in enumerate(names)
                ]
                [row] = base.agg(*exprs).collect()
                for i, fname in enumerate(names):
                    raw[f"$bucket:{name}:{fname}%0"] = {
                        "$doc_count": int(row[i])}
            else:
                for fname in sorted(named):
                    raw[f"$bucket:{name}:{fname}%0"] = _keyless_bucket(
                        named[fname], fsub)
            continue
        sub = spec.get("aggs") or {}
        # a bare `filter` sub-agg fuses as a FILTER-clause count in the
        # parent pass; a filter WITH its own metric sub-aggs needs its
        # own nested CTE (the parent pass has nowhere to carry the
        # filtered metrics — the reference emits the CTE via
        # aggs_filter.go transform + subContext.transform())
        nested = {n: s for n, s in sub.items()
                  if _bucket_kind(s) is not None
                  and not (_filter_metric_like(s) and not s.get("aggs"))}
        ride_along = {n: s for n, s in sub.items() if n not in nested}

        # outer level: metrics + FILTER-clause sub-aggs fused in
        outer_spec = dict(spec)
        if ride_along:
            outer_spec["aggs"] = ride_along
        else:
            outer_spec.pop("aggs", None)
        mapping = {"key": f"$key:{name}%0", "doc_count": "$doc_count"}
        if kind == "multi_terms":
            # composite keys: key_i → $key:<name>%i (the generator's
            # groupKeyIndex, aggs_generate_context.go:82)
            for i in range(len(spec["multi_terms"]["terms"])):
                mapping[f"key_{i}"] = f"$key:{name}%{i}"
        for fname, fspec in ride_along.items():
            if _filter_metric_like(fspec):
                mapping[f"{fname}_doc_count"] = f"{fname}:$doc_count"
        epoch = ({f"$key:{name}%0"} if _fixed_date_hist(spec, kind)
                 else set())
        raw[f"$bucket:{name}%0"] = _fold_geo(
            _rename(run_slice({name: outer_spec}), mapping, epoch),
            ride_along)

        # nested levels (the reference's dashboards use two)
        for iname, ispec in nested.items():
            ikind = _bucket_kind(ispec)
            if ikind == "filters":
                raise ElasticDslError(
                    "named `filters` nested under a bucket agg is not "
                    "supported by search_json (a single `filter` fuses "
                    "as a FILTER-clause column)")
            if ikind == "filter":
                # filter-with-metrics under a bucket: its own CTE
                # carrying the parent keys — the outer bucket agg
                # re-grouped over (query AND filter) with the filter's
                # metric sub-aggs in the same pass; size widened to
                # the generator's nested-level groupByLimit
                # (helpers.go:25) so the filtered ranking can't drop a
                # key the %0 pass kept
                fsub = ispec.get("aggs") or {}
                if any(_bucket_kind(s) is not None for s in fsub.values()):
                    raise ElasticDslError(
                        "bucket aggs nested under a filter sub-agg are "
                        "not supported by search_json")
                fslice = dict(spec)
                fslice[kind] = dict(spec[kind])
                fslice[kind]["size"] = 10000
                if fsub:
                    fslice["aggs"] = fsub
                else:
                    fslice.pop("aggs", None)
                fdf = df.filter(query_to_column(
                    _and_query(query, ispec["filter"]),
                    now, qs_mapping, df.schema))
                mapping = {"key": f"$key:{name}%0",
                           "doc_count": "$doc_count"}
                if kind == "multi_terms":
                    for i in range(len(spec["multi_terms"]["terms"])):
                        mapping[f"key_{i}"] = f"$key:{name}%{i}"
                epoch = ({f"$key:{name}%0"}
                         if _fixed_date_hist(spec, kind) else set())
                raw[f"$bucket:{name}:{iname}%0"] = _fold_geo(
                    _rename(
                        _rows(elastic_search(
                            fdf, {"aggs": {name: fslice}},
                            now, qs_mapping)),
                        mapping, epoch),
                    fsub)
                continue
            if any(_bucket_kind(s) is not None
                   and not _filter_metric_like(s)
                   for s in (ispec.get("aggs") or {}).values()):
                raise ElasticDslError(
                    "search_json supports two nested bucket levels, "
                    "matching the reference's recorded dashboards")
            inner_spec = dict(spec)
            inner_spec["aggs"] = {iname: ispec}
            mapping = {
                "key": f"$key:{name}%0",
                f"{iname}_key": f"$key:{name}:{iname}%0",
                f"{iname}_doc_count": "$doc_count",
            }
            isub = ispec.get("aggs") or {}
            for fname, fspec in isub.items():
                if _filter_metric_like(fspec):
                    if fspec.get("aggs"):
                        raise ElasticDslError(
                            "metrics under a filter at the second "
                            "bucket level are not supported by "
                            "search_json")
                    # the inner pass fuses it as <fname>_doc_count
                    # (_sub_metric_exprs); the raw needs the
                    # <fname>:$doc_count inline form
                    mapping[f"{fname}_doc_count"] = f"{fname}:$doc_count"
            epoch = set()
            if _fixed_date_hist(spec, kind):
                epoch.add(f"$key:{name}%0")
            if _fixed_date_hist(ispec, ikind):
                epoch.add(f"$key:{name}:{iname}%0")
            rows = _rename(run_slice({name: inner_spec}), mapping, epoch)
            for r in rows:
                r.pop("doc_count", None)  # outer count lives in %0 above
            raw[f"$bucket:{name}:{iname}%0"] = _fold_geo(rows, isub)

    return raw


def search_json(df: DataFrame, body: dict[str, Any], *,
                type_mapping: dict[str, Any] | None = None,
                index: str = "", now=None,
                qs_mapping: dict[str, dict] | None = None
                ) -> dict[str, Any]:
    """The proxy's `_search` endpoint, natively: execute on Spark,
    assemble the full Elastic response envelope."""
    raw = execute_raw(df, body, now, qs_mapping)
    response, _ = convert_result(
        body, raw, type_mapping=type_mapping, index=index)
    return response
