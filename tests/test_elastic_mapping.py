"""`/index/_mapping` derivation (adapters.elastic_mapping) vs the
reference's two corpora:

1. the `TestDataShapeToElasticMapping` unit vectors
   (elastic-proxy/elastic_mapping_test.go:21-168) ported verbatim as
   input data — every type-lattice rule (null reset, int|float union,
   unsupported-Ion fallback, $items skip, malformed entries) asserted
   the same way;
2. the recorded `GET /{index}/_mapping` expected responses
   (proxy_http/testdata/flights_mapping.json, news_mapping.json,
   asserted by mapping_test.go:163-190).  The recorded *inputs* are
   binary-Ion datashape responses this sandbox cannot decode, so the
   table is reconstructed from the recorded mapping's own field/type
   inventory and must round-trip: DataFrame -> datashape_fields ->
   datashape_to_elastic_mapping == the recorded JSON, exactly —
   end-to-end over a real DataFrame, covering every type the corpus
   uses plus the nested-object hierarchy rebuild."""

from __future__ import annotations

import datetime
import json
import os

import pytest

from sneller_spark.adapters.elastic_mapping import (
    datashape_fields,
    datashape_to_elastic_mapping,
    elastic_mapping,
)

REF = "/root/reference/elasticproxy/proxy_http/testdata"

# elastic_mapping_test.go:106-168 testDatashape(), verbatim
_GO_VECTOR = {
    "enabled": {"null": 10, "bool": 5},          # nulls + bool -> bool
    "tags": {"list": 1},
    "tags.$items": {"string": 20},               # list content skipped
    "user.display_name": {"null": 10},           # untyped null -> default
    "user.karma": {"int": 5, "float": 1},        # int & float -> float
    "user.statistics.posts": {"int": 6},
    "user.statistics.postsperday": {"float": 1},
    "user.lastlogin": {"timestamp": 1},
    "user.username": {"string": 1},
    "user.statistics": {"struct": 2},
    "user": {"struct": 1},
    "avatar": {"struct": 1},
    "avatar.url": {"string": 1},
    "avatar.alt-text": {"string": 61},
    "avatar.size": {"int": 4},
    "test": {"decimal": 2},                      # unsupported Ion -> default
    "bag": {"timestamp": 2, "int": 3, "bool": 4,
            "sexp": True},                       # mixed -> default; the
    # sexp count is a bool, NOT an int — the reference's type switch
    # rejects it (elastic_mapping.go:128)
    "wrong-type": 42,                            # not a histogram dict
}


def test_go_unit_vectors():
    m = datashape_to_elastic_mapping(_GO_VECTOR)
    p = m["properties"]
    assert sorted(p) == ["avatar", "bag", "enabled", "tags", "test", "user"]
    assert p["enabled"]["type"] == "boolean"
    assert p["test"]["type"] == "keyword"
    assert p["user"]["type"] == "object"
    assert p["tags"]["type"] == "list"
    assert p["bag"]["type"] == "keyword"
    assert p["avatar"]["type"] == "object"

    u = p["user"]["properties"]
    assert sorted(u) == ["display_name", "karma", "lastlogin",
                         "statistics", "username"]
    assert u["display_name"]["type"] == "keyword"
    assert u["karma"]["type"] == "double"
    assert u["lastlogin"]["type"] == "date"
    assert u["username"]["type"] == "keyword"
    assert u["statistics"]["type"] == "object"

    s = u["statistics"]["properties"]
    assert sorted(s) == ["posts", "postsperday"]
    assert s["posts"]["type"] == "long"
    assert s["postsperday"]["type"] == "double"

    a = p["avatar"]["properties"]
    assert sorted(a) == ["alt-text", "size", "url"]
    assert a["size"]["type"] == "long"
    assert a["alt-text"]["type"] == "keyword"
    assert a["url"]["type"] == "keyword"


# --- recorded-mapping round-trip --------------------------------------

_SPARK_OF = {"keyword": "string", "double": "double", "long": "long",
             "date": "timestamp", "boolean": "boolean"}


def _schema_sql(props: dict) -> str:
    parts = []
    for name, spec in props.items():
        if spec["type"] == "object":
            parts.append(f"`{name}` struct<{_schema_sql(spec['properties'])}>")
        else:
            parts.append(f"`{name}` {_SPARK_OF[spec['type']]}")
    return ", ".join(parts)


def _value_for(spec: dict, i: int):
    t = spec["type"]
    if t == "object":
        return {n: _value_for(s, i) for n, s in spec["properties"].items()}
    return {"keyword": f"s{i}", "double": 1.5 + i, "long": i,
            "date": datetime.datetime(2021, 1, 1 + i),
            "boolean": i % 2 == 0}[t]


@pytest.mark.parametrize("fname,index", [
    ("flights_mapping.json", "kibana_sample_data_flights"),
    ("news_mapping.json", "news"),
])
@pytest.mark.skipif(not os.path.isdir(REF), reason="reference corpus absent")
def test_recorded_mapping_roundtrip(spark, fname, index):
    recorded = json.load(open(os.path.join(REF, fname)))
    props = recorded[index]["properties"]
    df = spark.createDataFrame(
        [tuple(_value_for(s, i) for s in props.values()) for i in range(3)],
        schema=_schema_sql(props))
    assert elastic_mapping(df, index) == recorded


def test_datashape_fields_counts(spark):
    df = spark.createDataFrame(
        [(1, None, ["a", "b"]), (2, "x", None), (3, "y", ["c"])],
        schema="id long, name string, tags array<string>")
    f = datashape_fields(df)
    assert f["id"] == {"int": 3}
    assert f["name"] == {"string": 2, "null": 1}
    assert f["tags"] == {"list": 2, "null": 1}
    assert f["tags.$items"] == {"string": 3}
    # and the mapping derived from live counts
    m = datashape_to_elastic_mapping(f)["properties"]
    assert m == {"id": {"type": "long"}, "name": {"type": "keyword"},
                 "tags": {"type": "list"}}
