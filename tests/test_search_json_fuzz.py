"""Grammar-fuzz for the request → Spark → envelope round-trip.

Property: for ANY request the generator can produce, `search_json`
either returns a JSON-serializable Elastic envelope whose
hits.total.value equals the filtered row count, or raises the
surface's own typed errors (ElasticDslError / ElasticResponseError) —
never a bare TypeError/KeyError/AnalysisException from half-translated
state.  The generator covers the supported grammar: bucket kinds
(terms / histogram / date_histogram / filter / filters /
multi_terms), metric kinds, one nested bucket level, ride-along
filters, pipeline aggs, sort/size/from/_source/track_total_hits.
"""
from __future__ import annotations

import json

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from sneller_spark.adapters.elastic import ElasticDslError
from sneller_spark.adapters.elastic_response import ElasticResponseError

FIELDS_NUM = ["v", "n"]
FIELDS_STR = ["kind", "tag"]


@pytest.fixture(scope="module")
def fuzz_df(spark):
    rows = [(i, ["click", "view", "error"][i % 3],
             ["a", "b"][i % 2], float(i % 7) * 11.0, i % 5)
            for i in range(40)]
    return spark.createDataFrame(
        rows, "id int, kind string, tag string, v double, n int")


def metric_st():
    kind = st.sampled_from(["avg", "sum", "min", "max",
                            "value_count", "cardinality"])
    field = st.sampled_from(FIELDS_NUM + FIELDS_STR)
    return st.builds(lambda k, f: {k: {"field": f}}, kind, field)


def query_st():
    return st.one_of(
        st.none(),
        st.builds(lambda f, lo: {"range": {f: {"gte": lo}}},
                  st.sampled_from(FIELDS_NUM), st.integers(0, 60)),
        st.builds(lambda f, val: {"term": {f: val}},
                  st.sampled_from(FIELDS_STR),
                  st.sampled_from(["click", "view", "a", "zzz"])),
    )


def filter_metric_st():
    return st.builds(lambda q: {"filter": q},
                     query_st().filter(lambda q: q is not None))


def bucket_st():
    terms = st.builds(
        lambda f, size: {"terms": {"field": f, "size": size}},
        st.sampled_from(FIELDS_STR), st.integers(1, 5))
    hist = st.builds(
        lambda iv: {"histogram": {"field": "v", "interval": float(iv)}},
        st.sampled_from([11, 22, 40]))
    mt = st.just({"multi_terms": {"terms": [{"field": "kind"},
                                            {"field": "tag"}]}})
    return st.one_of(terms, hist, mt)


def aggs_st():
    inner = st.dictionaries(
        st.sampled_from(["m1", "m2", "flt"]),
        st.one_of(metric_st(), filter_metric_st()),
        max_size=2)
    outer_bucket = st.builds(
        lambda b, sub, nested: {**b, **({"aggs": {**sub, **nested}}
                                        if (sub or nested) else {})},
        bucket_st(), inner,
        st.one_of(st.just({}),
                  st.builds(lambda b: {"nest": b}, bucket_st())))
    filters_agg = st.builds(
        lambda q1, q2: {"filters": {"filters": {"f1": q1, "f2": q2}}},
        query_st().filter(bool), query_st().filter(bool))
    single_filter = filter_metric_st()
    entry = st.one_of(metric_st(), outer_bucket, filters_agg,
                      single_filter)
    return st.dictionaries(st.sampled_from(["a", "b", "2"]), entry,
                           max_size=2)


def body_st():
    return st.builds(
        lambda q, aggs, size, frm, tth: {
            k: v for k, v in [
                ("query", q), ("aggs", aggs or None), ("size", size),
                ("from", frm), ("track_total_hits", tth),
                ("sort", [{"v": {"order": "asc"}}] if size else None),
            ] if v is not None},
        query_st(), aggs_st(),
        st.sampled_from([None, 0, 3]),
        st.sampled_from([None, 2]),
        st.sampled_from([None, True, 5]),
    )


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(body=body_st())
def test_envelope_or_typed_error(spark, fuzz_df, body):
    from sneller_spark.adapters.elastic import query_to_column
    from sneller_spark.adapters.search import search_json

    try:
        resp = search_json(fuzz_df, body, index="fuzz")
    except (ElasticDslError, ElasticResponseError):
        return  # a typed rejection is a valid outcome
    json.dumps(resp)  # envelope must be pure JSON
    expected = fuzz_df.filter(
        query_to_column(body.get("query"), None, None,
                        fuzz_df.schema)).count()
    tth = body.get("track_total_hits")
    total = resp["hits"]["total"]
    if isinstance(tth, int) and not isinstance(tth, bool) \
            and expected > tth:
        assert total == {"relation": "gte", "value": tth}
    else:
        assert total["value"] == expected
    size = body.get("size")
    if size == 0:
        assert resp["hits"]["hits"] == []
    if body.get("aggs"):
        assert "aggregations" in resp
