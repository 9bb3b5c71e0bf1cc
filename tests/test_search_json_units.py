"""Direct unit coverage for `adapters.search` beyond the recorded
scenarios: agg shapes the 34 captures don't exercise at root level
(filters / filter / histogram / geotile-free metrics mixes), the
hits envelope knobs, and the raw-shape contract."""
from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # (id, kind, v, ts-second)
        (1, "click", 5.0), (2, "click", 55.0), (3, "view", 10.0),
        (4, "view", 60.0), (5, "view", 70.0), (6, "error", 0.5),
    ]
    return spark.createDataFrame(rows, "id int, kind string, v double")


def test_root_filters_agg(spark, events):
    """A root-level `filters` agg becomes a BucketMappedResult: named
    buckets keyed by filter name (aggs_filters.go:51-66,
    elastic_json.go bucketMappedResult)."""
    from sneller_spark.adapters.search import search_json

    resp = search_json(events, {
        "size": 0,
        "aggs": {"split": {"filters": {"filters": {
            "big": {"range": {"v": {"gte": 50.0}}},
            "clicks": {"term": {"kind": "click"}},
        }}}},
    })
    json.dumps(resp)
    b = resp["aggregations"]["split"]["buckets"]
    assert b["big"]["doc_count"] == 3
    assert b["clicks"]["doc_count"] == 2


def test_root_filter_single_agg(spark, events):
    """A root-level single `filter` agg: one bucket, doc_count only."""
    from sneller_spark.adapters.search import search_json

    resp = search_json(events, {
        "size": 0,
        "aggs": {"big": {"filter": {"range": {"v": {"gte": 50.0}}}}},
    })
    assert resp["aggregations"]["big"]["doc_count"] == 3


def test_root_histogram_agg(spark, events):
    from sneller_spark.adapters.search import search_json

    resp = search_json(events, {
        "size": 0,
        "aggs": {"h": {"histogram": {"field": "v", "interval": 50.0}}},
    })
    buckets = {b["key"]: b["doc_count"]
               for b in resp["aggregations"]["h"]["buckets"]}
    assert buckets == {0.0: 3, 50.0: 3}


def test_hits_envelope_knobs(spark, events):
    """size/from/sort/_source/track_total_hits all act on the
    envelope exactly as the proxy's ConvertResult does."""
    from sneller_spark.adapters.search import search_json

    resp = search_json(events, {
        "size": 2, "from": 1,
        "sort": [{"v": {"order": "desc"}}],
        "_source": ["kind", "v"],
        "query": {"range": {"v": {"gte": 10.0}}},
        "track_total_hits": 3,
    }, index="unit")
    hits = resp["hits"]["hits"]
    assert [h["_source"]["v"] for h in hits] == [60.0, 55.0]  # 70 skipped
    assert all(set(h["_source"]) == {"kind", "v"} for h in hits)
    assert all(h["sort"] == [h["_source"]["v"]] for h in hits)
    assert resp["hits"]["total"] == {"relation": "gte", "value": 3}
    ids = [h["_id"] for h in hits]
    assert len(set(ids)) == 2 and all(ids)


def test_raw_shape_contract(spark, events):
    """execute_raw emits the step-3 layout: metrics-only struct with
    $dummy$, per-level lists with $key columns, $hits by default."""
    from sneller_spark.adapters.search import execute_raw

    raw = execute_raw(events, {
        "aggs": {
            "avg_v": {"avg": {"field": "v"}},
            "by_kind": {"terms": {"field": "kind"},
                        "aggs": {"h": {"histogram": {
                            "field": "v", "interval": 50.0}}}},
        },
    })
    assert raw["$total_count"] == 6
    assert len(raw["$hits"]) == 6  # default size 10
    m = raw["$bucket:%0"]
    assert isinstance(m, dict) and m["$dummy$"] is False
    assert m["avg_v"] == pytest.approx(200.5 / 6)
    outer = raw["$bucket:by_kind%0"]
    assert {r["$key:by_kind%0"] for r in outer} == {"click", "view", "error"}
    inner = raw["$bucket:by_kind:h%0"]
    assert all(set(r) == {"$key:by_kind%0", "$key:by_kind:h%0",
                          "$doc_count"} for r in inner)


def test_filter_with_metrics_under_terms(spark, events):
    """A filter sub-agg WITH its own metrics gets a nested keyless CTE
    carrying the parent keys (aggs_filter.go transform through
    subContext.transform()); the envelope then reports the filtered
    metric per outer bucket — not null."""
    from sneller_spark.adapters.search import execute_raw, search_json

    body = {"size": 0, "aggs": {"by": {
        "terms": {"field": "kind"},
        "aggs": {"big": {
            "filter": {"range": {"v": {"gte": 50.0}}},
            "aggs": {"m": {"avg": {"field": "v"}}},
        }},
    }}}
    raw = execute_raw(events, body)
    inner = {r["$key:by%0"]: r for r in raw["$bucket:by:big%0"]}
    assert inner["view"]["$doc_count"] == 2
    assert inner["view"]["m"] == pytest.approx(65.0)
    assert set(inner) == {"click", "view"}  # error has no v >= 50 rows

    resp = search_json(events, body)
    b = {x["key"]: x for x in resp["aggregations"]["by"]["buckets"]}
    assert b["view"]["big"]["doc_count"] == 2
    assert b["view"]["big"]["m"]["value"] == pytest.approx(65.0)
    assert b["error"]["big"]["doc_count"] == 0


def test_bucket_under_top_level_filter_rejected(spark, events):
    from sneller_spark.adapters.elastic import ElasticDslError
    from sneller_spark.adapters.search import execute_raw

    with pytest.raises(ElasticDslError, match="top-level filter"):
        execute_raw(events, {"size": 0, "aggs": {"f": {
            "filter": {"term": {"kind": "click"}},
            "aggs": {"by": {"terms": {"field": "kind"}}},
        }}})


def test_hits_sort_defaults_desc(spark, events):
    """Omitted `order` means DESC in the proxy (elastic_json.go:113-115
    SortField.UnmarshalJSON)."""
    from sneller_spark.adapters.search import search_json

    resp = search_json(events, {"size": 3, "sort": [{"v": {}}],
                                "_source": ["v"]})
    assert [h["_source"]["v"] for h in resp["hits"]["hits"]] \
        == [70.0, 60.0, 55.0]


def test_multi_terms_composite_keys(spark, events):
    """multi_terms keys travel as $key:<name>%0/%1 (groupKeyIndex,
    aggs_generate_context.go:82) and assemble to composite-key
    buckets."""
    from sneller_spark.adapters.search import execute_raw, search_json

    body = {"size": 0, "aggs": {"mt": {"multi_terms": {"terms": [
        {"field": "kind"}, {"field": "id"}]}}}}
    raw = execute_raw(events, body)
    rows = raw["$bucket:mt%0"]
    assert all(set(r) == {"$key:mt%0", "$key:mt%1", "$doc_count"}
               for r in rows)
    resp = search_json(events, body)
    buckets = resp["aggregations"]["mt"]["buckets"]
    assert len(buckets) == 6  # every (kind, id) pair is unique
    # faithfully mirrored reference quirk: the proxy emits only the
    # FIRST key value per multi_terms bucket (aggs_multi_terms.go:113
    # `Key: group.KeyValues[0]`, marked TODO there), not Elastic's
    # composite-key array — the groups themselves are still composite
    # (6 buckets, doc_count 1 each)
    assert all(b["doc_count"] == 1 for b in buckets)
    assert {b["key"] for b in buckets} == {"click", "view", "error"}


def test_aggregations_alias_normalized(spark, events):
    """Nested sub-aggs spelled with the `aggregations` alias compute
    (Elastic-compatible extension; the proxy hard-errors on the
    nested alias and silently ignores the top-level one)."""
    from sneller_spark.adapters.search import search_json

    resp = search_json(events, {"size": 0, "aggregations": {"by": {
        "terms": {"field": "kind"},
        "aggregations": {"m": {"avg": {"field": "v"}}},
    }}})
    b = {x["key"]: x for x in resp["aggregations"]["by"]["buckets"]}
    assert b["click"]["m"]["value"] == pytest.approx(30.0)


def test_geo_centroid_reassembled(spark):
    """geo_centroid's flattened lat/lon columns fold back into the
    {'lat':…,'lon':…} struct the generator projects
    (aggs_geo_centroid.go:20-31), at root and under a bucket."""
    from sneller_spark.adapters.search import search_json

    pts = spark.createDataFrame(
        [("a", (10.0, 20.0)), ("a", (30.0, 40.0)), ("b", (-10.0, 5.0))],
        "g string, loc struct<lat:double,lon:double>")
    resp = search_json(pts, {"size": 0, "aggs": {
        "c": {"geo_centroid": {"field": "loc"}},
        "by": {"terms": {"field": "g"},
               "aggs": {"c2": {"geo_centroid": {"field": "loc"}}}},
    }})
    assert resp["aggregations"]["c"]["location"] \
        == {"lat": 10.0, "lon": pytest.approx(65.0 / 3)}
    b = {x["key"]: x for x in resp["aggregations"]["by"]["buckets"]}
    assert b["a"]["c2"]["location"] == {"lat": 20.0, "lon": 30.0}


def test_filters_fused_single_scan(spark, events):
    """Plain named filters (no sub-aggs) fuse into ONE aggregation —
    and the values match the per-name path."""
    from sneller_spark.adapters.search import execute_raw

    raw = execute_raw(events, {"size": 0, "aggs": {"split": {
        "filters": {"filters": {
            "big": {"range": {"v": {"gte": 50.0}}},
            "clicks": {"term": {"kind": "click"}},
            "none": {"term": {"kind": "nope"}},
        }}}}})
    assert raw["$bucket:split:big%0"] == {"$doc_count": 3}
    assert raw["$bucket:split:clicks%0"] == {"$doc_count": 2}
    assert raw["$bucket:split:none%0"] == {"$doc_count": 0}


def test_inner_level_filter_doc_count(spark, events):
    """A metric-like filter under the SECOND bucket level fuses as a
    FILTER-clause count and travels as <name>:$doc_count in the inner
    CTE rows (issue-67's inline form)."""
    from sneller_spark.adapters.search import execute_raw, search_json

    body = {"size": 0, "aggs": {"o": {
        "terms": {"field": "kind"},
        "aggs": {"i": {
            "histogram": {"field": "v", "interval": 50.0},
            "aggs": {"big": {"filter": {"range": {"v": {"gte": 55.0}}}}},
        }},
    }}}
    raw = execute_raw(events, body)
    rows = {(r["$key:o%0"], r["$key:o:i%0"]): r
            for r in raw["$bucket:o:i%0"]}
    assert rows[("view", 50.0)]["big:$doc_count"] == 2  # 60, 70
    assert rows[("click", 50.0)]["big:$doc_count"] == 1  # 55

    resp = search_json(events, body)
    b = {x["key"]: x for x in resp["aggregations"]["o"]["buckets"]}
    inner = {x["key"]: x for x in b["view"]["i"]["buckets"]}
    assert inner[50.0]["big"]["doc_count"] == 2


def test_subsecond_fixed_interval_rejected(spark):
    from sneller_spark.adapters.elastic import ElasticDslError
    from sneller_spark.adapters.search import execute_raw

    ts = spark.createDataFrame(
        [("2022-01-01 00:00:00.2",), ("2022-01-01 00:00:00.7",)],
        "t string").selectExpr("cast(t as timestamp) as t")
    with pytest.raises(ElasticDslError, match="sub-second"):
        execute_raw(ts, {"size": 0, "aggs": {"h": {
            "date_histogram": {"field": "t", "fixed_interval": "500ms"},
        }}})


def test_pipeline_aggs_through_envelope(spark, events):
    """bucket_script + bucket_sort never reach the query (stripped by
    execute_raw); convert_result computes them over the finished
    buckets — the pipeline-order dashboard shape on toy data."""
    from sneller_spark.adapters.search import search_json

    resp = search_json(events, {"size": 0, "aggs": {"by": {
        "terms": {"field": "kind"},
        "aggs": {
            "ids": {"cardinality": {"field": "id"}},
            "big": {"filter": {"range": {"v": {"gte": 50.0}}}},
            "total": {"bucket_script": {
                "buckets_path": {"a": "ids", "b": "big"},
                "script": "params.a + params.b",
            }},
            "top1": {"bucket_sort": {
                "size": 1,
                "sort": [{"total": {"order": "desc"}}],
            }},
        },
    }}})
    buckets = resp["aggregations"]["by"]["buckets"]
    assert len(buckets) == 1  # bucket_sort size cap
    b = buckets[0]
    # faithfully mirrored reference quirk: bucket_script reads ONLY
    # *metricResult int values (aggs_bucket_script.go:57-66) — the
    # `big` filter bucket is a bucketSingleResult, so it contributes 0
    # and total = ids alone (3 for view, its distinct-id count).
    # view wins the sort with 3 ids vs click's 2 and error's 1.
    assert b["key"] == "view"
    assert b["total"]["value"] == 3
    assert b["big"]["doc_count"] == 2  # the filter itself is correct


def test_top_hits_rejected(spark, events):
    """The reference proxy's result processor hard-errors on top_hits
    (aggs_top_hits.go:97); the envelope surface mirrors that, while
    elastic_search keeps the DataFrame extension."""
    from sneller_spark.adapters.elastic import ElasticDslError
    from sneller_spark.adapters.search import execute_raw

    with pytest.raises(ElasticDslError, match="top_hits"):
        execute_raw(events, {"size": 0, "aggs": {"by": {
            "terms": {"field": "kind"},
            "aggs": {"h": {"top_hits": {"size": 2}}},
        }}})


def test_three_level_nesting_rejected(spark, events):
    from sneller_spark.adapters.elastic import ElasticDslError
    from sneller_spark.adapters.search import execute_raw

    with pytest.raises(ElasticDslError, match="two nested"):
        execute_raw(events, {"aggs": {"a": {
            "terms": {"field": "kind"},
            "aggs": {"b": {"terms": {"field": "kind"},
                           "aggs": {"c": {"terms": {"field": "kind"}}}}},
        }}})
