"""Elastic query-DSL adapter (adapters/elastic.py) vs hand-written
DataFrame plans — the elasticproxy analog
(/root/reference/elasticproxy/elastic-proxy/)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sneller_spark.adapters.elastic import (
    ElasticDslError,
    aggs_to_df,
    elastic_search,
    query_to_column,
)

ROWS = [
    # id, kind, score, tag
    (1, "click", 10.0, "alpha"),
    (2, "view", 55.5, "beta"),
    (3, "click", 90.0, None),
    (4, "signup", 7.25, "alphabet"),
    (5, "error", 400.0, "gamma"),
    (6, "click", 55.5, "beta"),
]


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(ROWS, ["id", "kind", "score", "tag"])


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_term_terms_range_exists(ev):
    assert _ids(ev.filter(query_to_column({"term": {"kind": "click"}}))) == [1, 3, 6]
    assert _ids(ev.filter(query_to_column({"terms": {"kind": ["view", "error"]}}))) == [2, 5]
    assert _ids(
        ev.filter(query_to_column({"range": {"score": {"gte": 55.5, "lt": 400}}}))
    ) == [2, 3, 6]
    assert _ids(ev.filter(query_to_column({"exists": {"field": "tag"}}))) == [1, 2, 4, 5, 6]


def test_prefix_wildcard_match(ev):
    assert _ids(ev.filter(query_to_column({"prefix": {"tag": "alpha"}}))) == [1, 4]
    assert _ids(ev.filter(query_to_column({"wildcard": {"tag": "*eta"}}))) == [2, 6]
    assert _ids(ev.filter(query_to_column({"wildcard": {"tag": "bet?"}}))) == [2, 6]
    assert _ids(ev.filter(query_to_column({"match": {"tag": "LPHA"}}))) == [1, 4]


def test_bool_semantics(ev):
    q = {"bool": {
        "filter": [{"range": {"score": {"gte": 10}}}],
        "must_not": [{"term": {"kind": "error"}}],
        "should": [{"term": {"kind": "click"}}, {"term": {"kind": "view"}}],
        "minimum_should_match": 1,
    }}
    assert _ids(ev.filter(query_to_column(q))) == [1, 2, 3, 6]
    # should without must/filter is required (pure disjunction)
    q2 = {"bool": {"should": [{"term": {"kind": "signup"}}, {"term": {"kind": "error"}}]}}
    assert _ids(ev.filter(query_to_column(q2))) == [4, 5]
    # should alongside must WITHOUT minimum_should_match is advisory
    q3 = {"bool": {"must": [{"range": {"score": {"gt": 0}}}],
                   "should": [{"term": {"kind": "error"}}]}}
    assert _ids(ev.filter(query_to_column(q3))) == [1, 2, 3, 4, 5, 6]


def test_match_all_and_errors(ev):
    assert _ids(ev.filter(query_to_column(None))) == [1, 2, 3, 4, 5, 6]
    assert _ids(ev.filter(query_to_column({"match_all": {}}))) == [1, 2, 3, 4, 5, 6]
    with pytest.raises(ElasticDslError):
        query_to_column({"fuzzy": {"tag": "x"}})
    with pytest.raises(ElasticDslError):
        aggs_to_df(None, {"a": {"terms": {"field": "k"}}, "b": {"histogram": {"field": "s", "interval": 1}}})


def test_terms_agg_matches_handwritten(ev):
    body = {"aggs": {"by_kind": {
        "terms": {"field": "kind", "size": 2},
        "aggs": {"avg_score": {"avg": {"field": "score"}}},
    }}}
    got = elastic_search(ev, body).toPandas()
    exp = (
        ev.groupBy(F.col("kind").alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"), F.avg("score").alias("avg_score"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(2)
        .toPandas()
    )
    assert got.equals(exp)
    # doc_count desc, then key asc among the 1-count ties: error first
    assert list(got["key"]) == ["click", "error"]


def test_histogram_agg(ev):
    got = (
        aggs_to_df(ev, {"h": {"histogram": {"field": "score", "interval": 50.0}}})
        .toPandas()
        .set_index("key")["doc_count"]
        .to_dict()
    )
    assert got == {0.0: 2, 50.0: 3, 400.0: 1}


def test_filters_agg_single_pass(ev):
    body = {"aggs": {"b": {
        "filters": {"filters": {
            "clicks": {"term": {"kind": "click"}},
            "big": {"range": {"score": {"gte": 100}}},
        }},
        "aggs": {"s": {"sum": {"field": "score"}}},
    }}}
    out = elastic_search(ev, body)
    row = out.collect()[0]
    assert row["clicks_doc_count"] == 3 and abs(row["clicks_s"] - 155.5) < 1e-9
    assert row["big_doc_count"] == 1 and abs(row["big_s"] - 400.0) < 1e-9
    # ONE scan: a single aggregate over a single source, no union/join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan and "Join" not in plan


def test_hits_sort_size_source(ev):
    body = {
        "query": {"range": {"score": {"gt": 10}}},
        "sort": [{"score": {"order": "desc"}}],
        "size": 2,
        "_source": ["id", "score"],
    }
    got = elastic_search(ev, body).toPandas()
    assert list(got.columns) == ["id", "score"]
    assert list(got["id"]) == [5, 3]


def test_date_math_parsing():
    """Date-math grammar vs the reference's date_math.go semantics."""
    import datetime as dt

    from sneller_spark.adapters.elastic import ElasticDslError, parse_date_math

    now = dt.datetime(2024, 3, 15, 13, 45, 30, 123456)
    assert parse_date_math("now", now) == now
    assert parse_date_math("now-7d", now) == now - dt.timedelta(days=7)
    assert parse_date_math("now-7d/d", now) == dt.datetime(2024, 3, 8)
    assert parse_date_math("now+12h", now) == now + dt.timedelta(hours=12)
    assert parse_date_math("now/M", now) == dt.datetime(2024, 3, 1)
    # the reference rounds /w to SUNDAY (date_math.go:62-65), unlike
    # real Elastic's Monday — bug-compatible, pinned by the replay
    # table in tests/test_replay_datemath.py
    assert parse_date_math("now/w", now) == dt.datetime(2024, 3, 10)
    # calendar month arithmetic incl. clamping (Jan 31 + 1M -> Feb 29)
    jan31 = dt.datetime(2024, 1, 31)
    assert parse_date_math("now+1M", jan31) == dt.datetime(2024, 2, 29)
    assert parse_date_math("now-2M", jan31) == dt.datetime(2023, 11, 30)
    assert parse_date_math("now+1y", dt.datetime(2024, 2, 29)) == dt.datetime(2025, 2, 28)
    # anchored form
    assert parse_date_math("2024-01-05||+1M/d") == dt.datetime(2024, 2, 5)
    assert parse_date_math("2024-01-05 06:07:08||/h") == dt.datetime(2024, 1, 5, 6)
    with pytest.raises(ElasticDslError):
        parse_date_math("yesterday")
    with pytest.raises(ElasticDslError):
        parse_date_math("now-7q")


def test_must_not_null_safe(ev):
    """must_not keeps docs MISSING the field (inner predicate NULL):
    Elastic's must_not excludes only positive matches."""
    q = {"bool": {"must_not": [{"term": {"tag": "beta"}}]}}
    # id 3 has tag=NULL -> term is NULL -> must_not must KEEP it
    assert _ids(ev.filter(query_to_column(q))) == [1, 3, 4, 5]


def test_minimum_should_match_numeric(ev):
    """minimum_should_match honors its numeric value, not mere presence."""
    shoulds = [
        {"term": {"kind": "click"}},
        {"range": {"score": {"gte": 50}}},
        {"prefix": {"tag": "alpha"}},
    ]
    base = {"must": [{"range": {"score": {"gt": 0}}}], "should": shoulds}
    got = {
        n: _ids(ev.filter(query_to_column(
            {"bool": dict(base, minimum_should_match=n)}
        )))
        for n in (0, 1, 2, 3, 4)
    }
    # n=0: should advisory; n=1: any; n=2: at least two (ids 1,3,6);
    # n=3: all three (none); n>len: unsatisfiable
    assert got[0] == [1, 2, 3, 4, 5, 6]
    assert got[1] == [1, 2, 3, 4, 5, 6]
    assert got[2] == [1, 3, 6]
    assert got[3] == []
    assert got[4] == []
    with pytest.raises(ElasticDslError):
        query_to_column({"bool": {"should": shoulds, "minimum_should_match": "75%"}})
    with pytest.raises(ElasticDslError):
        query_to_column({"bool": {"should": shoulds, "minimum_should_match": -1}})


def test_hits_multi_key_sort(ev):
    """A multi-entry sort list is lexicographic (first key primary) —
    one orderBy over all keys, not chained orderBy calls."""
    body = {
        "sort": [{"score": {"order": "desc"}}, {"id": {"order": "asc"}}],
        "size": 4,
        "_source": ["id", "score"],
    }
    got = elastic_search(ev, body).toPandas()
    # score desc: 400, 90, 55.5, 55.5 — the tie broken by id asc (2 < 6)
    assert list(got["id"]) == [5, 3, 2, 6]


def test_multi_terms_agg(ev):
    """multi_terms: composite-key buckets, default _count desc order,
    key tiebreak, size cap, metric sub-agg (aggs_multi_terms.go)."""
    body = {"aggs": {"mt": {
        "multi_terms": {
            "terms": [{"field": "kind"}, {"field": "tag"}],
            "size": 3,
        },
        "aggs": {"s": {"sum": {"field": "score"}}},
    }}}
    got = elastic_search(ev, body).toPandas()
    assert list(got.columns) == ["key_0", "key_1", "doc_count", "s"]
    # (click,beta) is the only 1+-sized... counts: (click,alpha)=1,
    # (click,None)=1, (click,beta)=1, (view,beta)=1, (signup,alphabet)=1,
    # (error,gamma)=1 — all ties, so key order decides the top 3
    assert got["doc_count"].tolist() == [1, 1, 1]
    assert list(zip(got["key_0"], got["key_1"]))[0][0] == "click"
    # explicit _key desc order
    body2 = {"aggs": {"mt": {"multi_terms": {
        "terms": [{"field": "kind"}, {"field": "tag"}],
        "order": {"_key": "desc"}, "size": 2,
    }}}}
    got2 = elastic_search(ev, body2).toPandas()
    assert list(got2["key_0"]) == ["view", "signup"]
    with pytest.raises(ElasticDslError):
        aggs_to_df(ev, {"mt": {"multi_terms": {"terms": []}}})


def test_nested_terms_buckets(ev):
    """terms > terms nesting (the reference proxy's aggs context
    nesting): flattened rows, outer doc_count windowed over the inner
    groupBy, both size caps applied, Elastic bucket order both levels."""
    body = {"aggs": {"outer": {
        "terms": {"field": "kind", "size": 2},
        "aggs": {"by_tag": {"terms": {"field": "tag", "size": 1}}},
    }}}
    got = elastic_search(ev, body).toPandas()
    assert list(got.columns) == ["key", "doc_count", "by_tag_key", "by_tag_doc_count"]
    # outer: click(3) then the count-1 tie broken by key asc -> error
    assert list(got["key"]) == ["click", "error"]
    assert list(got["doc_count"]) == [3, 1]
    # inner top-1 for click: three 1-count tags, NULL sorts first asc
    assert got["by_tag_key"][0] is None and got["by_tag_key"][1] == "gamma"
    assert list(got["by_tag_doc_count"]) == [1, 1]
    # inner metric sub-aggs compute per (outer, inner) bucket
    body2 = {"aggs": {"outer": {
        "terms": {"field": "kind", "size": 1},
        "aggs": {"by_tag": {
            "terms": {"field": "tag", "size": 2},
            "aggs": {"s": {"sum": {"field": "score"}}},
        }},
    }}}
    got2 = elastic_search(ev, body2).toPandas()
    assert list(got2["key"]) == ["click", "click"]
    assert "s" in got2.columns
    # histogram > terms nesting (Kibana delay-type shape) is supported:
    # key-asc outer order, no outer cap
    hist = aggs_to_df(ev, {"o": {"histogram": {"field": "score", "interval": 1},
                                 "aggs": {"i": {"terms": {"field": "kind"}}}}}).toPandas()
    assert list(hist.columns) == ["key", "doc_count", "i_key", "i_doc_count"]
    assert list(hist["key"]) == sorted(hist["key"])
    with pytest.raises(ElasticDslError):
        aggs_to_df(ev, {"o": {"terms": {"field": "kind"},
                              "aggs": {"i": {"terms": {"field": "tag"}},
                                       "m": {"avg": {"field": "score"}}}}})


def test_filter_single_bucket(ev):
    """filter (singular, aggs_filter.go): one named filter bucket —
    doc_count + sub-aggs over matching rows, conditional aggregates in
    ONE scan."""
    body = {"aggs": {"clicks": {
        "filter": {"term": {"kind": "click"}},
        "aggs": {"s": {"sum": {"field": "score"}}},
    }}}
    row = elastic_search(ev, body).collect()[0]
    assert row["doc_count"] == 3
    assert abs(row["s"] - 155.5) < 1e-9


def test_geo_centroid_metric(spark):
    """geo_centroid (aggs_geo_centroid.go): avg lat/lon per bucket,
    flattened to <name>_lat/<name>_lon columns."""
    rows = [
        ("a", (10.0, 20.0)), ("a", (30.0, 40.0)), ("b", (-10.0, 0.0)),
    ]
    df = spark.createDataFrame(rows, ["g", "loc"]).selectExpr(
        "g", "named_struct('lat', loc._1, 'lon', loc._2) AS loc"
    )
    body = {"aggs": {"by_g": {
        "terms": {"field": "g", "size": 5},
        "aggs": {"c": {"geo_centroid": {"field": "loc"}}},
    }}}
    got = elastic_search(df, body).toPandas().set_index("key")
    assert got.loc["a", "c_lat"] == 20.0 and got.loc["a", "c_lon"] == 30.0
    assert got.loc["b", "c_lat"] == -10.0 and got.loc["b", "c_lon"] == 0.0


def test_geotile_grid_buckets(spark):
    """geotile_grid (aggs_geotile_grid.go): GEO_TILE_ES bucket keys at
    the requested precision, bounds pre-filter, count-desc order."""
    rows = [
        (1, 40.0, -74.0), (2, 40.1, -74.1), (3, -33.9, 151.2), (4, 85.0, 0.0),
    ]
    df = spark.createDataFrame(rows, ["id", "lat", "lon"]).selectExpr(
        "id", "named_struct('lat', lat, 'lon', lon) AS loc"
    )
    body = {"aggs": {"g": {"geotile_grid": {"field": "loc", "precision": 2}}}}
    got = elastic_search(df, body).toPandas()
    # zoom 2: NYC pair shares tile 2/1/1; Sydney 2/3/2; lat 85 -> y 0
    counts = dict(zip(got["key"], got["doc_count"]))
    assert counts["2/1/1"] == 2 and counts["2/3/2"] == 1
    assert got["doc_count"].iloc[0] == 2  # count-desc order
    # bounds pre-filter keeps only the northern-west quadrant pair
    body2 = {"aggs": {"g": {"geotile_grid": {
        "field": "loc", "precision": 2,
        "bounds": {"top_left": {"lat": 50.0, "lon": -80.0},
                   "bottom_right": {"lat": 30.0, "lon": -70.0}},
    }}}}
    got2 = elastic_search(df, body2).toPandas()
    assert dict(zip(got2["key"], got2["doc_count"])) == {"2/1/1": 2}
    with pytest.raises(ElasticDslError):
        aggs_to_df(df, {"g": {"geotile_grid": {"field": "loc", "precision": 31}}})
    # docs with a NULL coordinate are skipped (Elastic semantics), not
    # binned into a truncated bucket key
    df2 = spark.createDataFrame(
        [(1, 40.0, -74.0), (2, None, -74.0)], ["id", "lat", "lon"]
    ).selectExpr("id", "named_struct('lat', lat, 'lon', lon) AS loc")
    got3 = aggs_to_df(
        df2, {"g": {"geotile_grid": {"field": "loc", "precision": 2}}}
    ).toPandas()
    assert dict(zip(got3["key"], got3["doc_count"])) == {"2/1/1": 1}


def test_top_hits_per_bucket(ev):
    """top_hits sub-agg (aggs_top_hits.go): per-bucket top-N raw rows
    by the requested sort, flattened with the bucket key/doc_count;
    outer terms order and size still apply."""
    body = {"aggs": {"by_kind": {
        "terms": {"field": "kind", "size": 2},
        "aggs": {"best": {"top_hits": {
            "sort": [{"score": {"order": "desc"}}],
            "size": 2,
            "_source": {"includes": ["id", "score"]},
        }}},
    }}}
    got = elastic_search(ev, body).toPandas()
    assert list(got.columns) == ["key", "doc_count", "hit_rank", "id", "score"]
    # outer buckets: click(3) then error(1) by key-asc tie
    assert list(got["key"]) == ["click", "click", "error"]
    # click hits sorted score desc: id 3 (90.0) then id 6 (55.5)
    assert list(got["id"]) == [3, 6, 5]
    assert list(got["hit_rank"]) == [1, 2, 1]
    with pytest.raises(ElasticDslError):
        aggs_to_df(ev, {"b": {"terms": {"field": "kind"},
                              "aggs": {"h": {"top_hits": {"size": 2}}}}})


def test_bucket_script_and_sort(ev):
    """Pipeline aggs over finished buckets: bucket_script derives a
    per-bucket column from sibling metrics; bucket_sort reorders and
    truncates the bucket set."""
    body = {"aggs": {"by_kind": {
        "terms": {"field": "kind", "size": 10},
        "aggs": {
            "total": {"sum": {"field": "score"}},
            "n": {"value_count": {"field": "score"}},
            "per_doc": {"bucket_script": {
                "buckets_path": {"a": "total", "b": "n"},
                "script": "params.a / params.b",
            }},
            "top2": {"bucket_sort": {"sort": [{"per_doc": {"order": "desc"}}],
                                     "size": 2}},
        },
    }}}
    got = elastic_search(ev, body).toPandas()
    # per_doc: error 400/1=400, view 55.5/1, signup 7.25/1, click 155.5/3
    assert list(got["key"]) == ["error", "view"]
    assert abs(got["per_doc"].iloc[0] - 400.0) < 1e-9
    with pytest.raises(ElasticDslError):
        aggs_to_df(ev, {"b": {"terms": {"field": "kind"},
                              "aggs": {"x": {"bucket_script": {
                                  "buckets_path": {}, "script": "doom()"}}}}})


def test_nested_and_top_hits_plans_single_scan(ev):
    """The nested-bucket and top_hits translations promise one pass
    over the input: no Join and exactly one source scan in the
    physical plan (outer doc_count and size caps are windows over the
    aggregated/filtered result, never a second scan or self-join)."""
    nested = elastic_search(ev, {"aggs": {"o": {
        "terms": {"field": "kind", "size": 2},
        "aggs": {"i": {"terms": {"field": "tag", "size": 2}}},
    }}})
    hits = elastic_search(ev, {"aggs": {"o": {
        "terms": {"field": "kind", "size": 2},
        "aggs": {"h": {"top_hits": {"sort": [{"score": "desc"}], "size": 1}}},
    }}})
    for df in (nested, hits):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert plan.count("LocalTableScan") <= 1


def test_range_with_date_math(ev, spark):
    import datetime as dt

    rows = [(i, dt.datetime(2024, 3, 1) + dt.timedelta(days=i)) for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "ts"])
    now = dt.datetime(2024, 3, 15, 12, 0, 0)
    q = {"range": {"ts": {"gte": "now-3d/d", "lt": "now/d"}}}
    got = sorted(r["id"] for r in df.filter(query_to_column(q, now=now)).collect())
    # [2024-03-12 00:00, 2024-03-15 00:00) -> days 11,12,13
    assert got == [11, 12, 13]


def test_top_hits_sort_field_outside_source(ev):
    """Elastic sorts and projects independently: sorting on a field
    not listed in _source.includes must work (and stay out of the
    output columns)."""
    body = {"aggs": {"b": {
        "terms": {"field": "kind", "size": 1},
        "aggs": {"h": {"top_hits": {
            "sort": [{"score": {"order": "desc"}}],
            "size": 1,
            "_source": {"includes": ["id"]},
        }}},
    }}}
    got = elastic_search(ev, body).toPandas()
    assert list(got.columns) == ["key", "doc_count", "hit_rank", "id"]
    assert list(got["id"]) == [3]  # highest-score click


def test_multi_terms_order_list_form(ev):
    """Elastic also writes `order` as a list of single-key dicts."""
    body = {"aggs": {"mt": {"multi_terms": {
        "terms": [{"field": "kind"}, {"field": "tag"}],
        "order": [{"_key": "desc"}], "size": 2,
    }}}}
    got = elastic_search(ev, body).toPandas()
    assert list(got["key_0"]) == ["view", "signup"]


def test_top_hits_sort_on_bucket_field_itself(ev):
    """A top_hits sort on the terms field itself (constant within each
    bucket, but legal DSL) maps to the renamed 'key' column instead of
    raising an unresolved-column AnalysisException; ties fall to the
    secondary sort."""
    body = {"aggs": {"b": {
        "terms": {"field": "kind", "size": 1},
        "aggs": {"h": {"top_hits": {
            "sort": [{"kind": {"order": "asc"}},
                     {"score": {"order": "desc"}}],
            "size": 2,
            "_source": {"includes": ["id"]},
        }}},
    }}}
    got = elastic_search(ev, body).toPandas()
    assert list(got.columns) == ["key", "doc_count", "hit_rank", "id"]
    assert list(got["id"]) == [3, 6]  # clicks by score desc


def test_match_none_and_constant_score(ev):
    """query.go: match_none -> FALSE; constant_score -> its filter
    (scoring dropped, like the proxy)."""
    assert _ids(ev.filter(query_to_column({"match_none": {}}))) == []
    got = _ids(ev.filter(query_to_column({"constant_score": {
        "filter": {"term": {"kind": "click"}}, "boost": 1.2}})))
    assert got == [1, 3, 6]
    # list-form filter (the proxy's andQueries) ANDs
    got = _ids(ev.filter(query_to_column({"constant_score": {
        "filter": [{"term": {"kind": "click"}},
                   {"range": {"score": {"gte": 50}}}]}})))
    assert got == [3, 6]


def test_geo_bounding_box(spark):
    """query.go:287-307: per-field lat/lon corner comparisons."""
    df = spark.createDataFrame(
        [(1, {"lat": 40.7, "lon": -74.0}),   # NYC — inside
         (2, {"lat": 34.0, "lon": -118.2}),  # LA — west of box
         (3, {"lat": 25.7, "lon": -80.2}),   # Miami — south of box
         (4, {"lat": 41.9, "lon": -87.6})],  # Chicago — inside
        "id int, loc struct<lat:double,lon:double>")
    got = sorted(r["id"] for r in df.filter(query_to_column(
        {"geo_bounding_box": {"loc": {
            "top_left": {"lat": 45.0, "lon": -90.0},
            "bottom_right": {"lat": 30.0, "lon": -70.0}}}}
    )).collect())
    assert got == [1, 4]


def test_hits_from_pagination(ev):
    """`from` skips hits after the sort (testdata-news corpus shape)."""
    out = elastic_search(ev, {
        "query": {"match_all": {}},
        "sort": [{"id": {"order": "asc"}}],
        "from": 2, "size": 2,
        "_source": ["id"],
    })
    assert [r["id"] for r in out.collect()] == [3, 4]
    # _source: false keeps all columns (the proxy returns fields via
    # the `fields` API instead)
    out = elastic_search(ev, {
        "query": {"match_all": {}}, "_source": False, "size": 1,
        "sort": [{"id": {"order": "asc"}}],
    })
    assert out.columns == ["id", "kind", "score", "tag"]


def test_nested_terms_key_order(spark):
    """Both levels of a nested terms/terms agg honor explicit _key
    order (the proxy's venkat-keyorder dashboard shape)."""
    df = spark.createDataFrame(
        [("NL", "DE"), ("NL", "BE"), ("NL", "DE"),
         ("AU", "NZ"), ("AU", "JP"), ("US", "CA")],
        "origin string, dest string")
    body = {"aggs": {"0": {
        "terms": {"field": "origin", "order": {"_key": "asc"}, "size": 2},
        "aggs": {"1": {"terms": {"field": "dest",
                                 "order": {"_key": "asc"}, "size": 3}}},
    }}}
    rows = [(r["key"], r["1_key"], r["1_doc_count"])
            for r in elastic_search(df, body).collect()]
    # _key asc keeps AU+NL (size 2 by key order, NOT by count), with
    # inner dests key-ordered
    assert rows == [("AU", "JP", 1), ("AU", "NZ", 1),
                    ("NL", "BE", 1), ("NL", "DE", 2)]


def test_filter_subagg_threads_now_and_mapping(spark):
    """Nested filter predicates resolve date-math anchors and typed
    range bounds exactly like top-level queries (review finding)."""
    import datetime as dt

    df = spark.createDataFrame(
        [(1, "2024-03-10T00:00:00", "a"), (2, "2024-03-14T00:00:00", "a"),
         (3, "2024-02-01T00:00:00", "b")],
        "id int, ts string, g string",
    ).withColumn("ts", F.to_timestamp("ts"))
    now = dt.datetime(2024, 3, 15)
    body = {"aggs": {"by_g": {
        "terms": {"field": "g"},
        "aggs": {"recent": {"filter": {
            "range": {"ts": {"gte": "now-7d"}}}}},
    }}}
    rows = {r["key"]: (r["doc_count"], r["recent_doc_count"])
            for r in elastic_search(df, body, now=now).collect()}
    # pinned now: only ids 1,2 are within 7 days; id 3 is not
    assert rows == {"a": (2, 2), "b": (1, 0)}


def test_source_scalar_forms(ev):
    """_source accepts true/false/bare-string per the Elastic API."""
    base = {"query": {"match_all": {}}, "size": 1,
            "sort": [{"id": {"order": "asc"}}]}
    assert elastic_search(ev, dict(base, _source=True)).columns == \
        ["id", "kind", "score", "tag"]
    assert elastic_search(ev, dict(base, _source="kind")).columns == \
        ["kind"]
    assert elastic_search(ev, dict(base, _source=False)).columns == \
        ["id", "kind", "score", "tag"]


def test_side_metrics_attach_on_nested_and_top_hits(spark):
    """Metrics beside a bucket survive the nested-bucket and top_hits
    paths too (review finding: they were silently dropped)."""
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0)],
        "g string, h string, v double")
    nested = {"aggs": {
        "outer": {"terms": {"field": "g"},
                  "aggs": {"inner": {"terms": {"field": "h"}}}},
        "overall": {"avg": {"field": "v"}},
    }}
    out = elastic_search(df, nested)
    assert "overall" in out.columns
    assert all(abs(r["overall"] - 2.0) < 1e-9 for r in out.collect())
    hits = {"aggs": {
        "outer": {"terms": {"field": "g"},
                  "aggs": {"top": {"top_hits": {
                      "size": 1, "sort": [{"v": {"order": "desc"}}]}}}},
        "overall": {"avg": {"field": "v"}},
    }}
    out = elastic_search(df, hits)
    assert "overall" in out.columns
