"""Elastic `/index/_mapping` derivation — the proxy's
`DataShapeToElasticMapping` (elasticproxy/elastic-proxy/
elastic_mapping.go:71-101) re-expressed over Spark.

The reference proxy answers `GET /{index}/_mapping` by running
`SNELLER_DATASHAPE` against the table and folding the per-field Ion
type histogram into an Elastic mapping (proxy_http/handle_mapping.go):

- each field's histogram collapses to a type SET
  (parseSnellerType, elastic_mapping.go:120-135; only positive
  integer counts participate)
- the set maps to one Elastic type (obtainElasticType,
  elastic_mapping.go:156-196): `null` is discarded first; a single
  surviving type maps bool→boolean, int→long, float→double,
  timestamp→date, string→keyword, struct→object, list→list; the one
  blessed union is int|float→double; everything else — including
  single types with no Elastic analog (decimal/sexp/clob/blob) and a
  field that was ONLY nulls — falls back to the default `keyword`
- `$items` pseudo-fields (list element unions) are skipped
  (elastic_mapping.go:77-80)
- SNELLER_DATASHAPE emits flattened dotted paths; the nested
  `properties` hierarchy is rebuilt by seeding top-level `object`
  fields and recursing (rebuildObjectsHierarchy,
  elastic_mapping.go:198-226)

`datashape_fields` computes the same per-field histogram from a
DataFrame in ONE aggregate pass (schema gives each path's Ion type;
the data contributes the non-null/null counts — the Spark analog of
vm/sysdatashape.go's per-row typing over schemaless Ion).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Ion type-name lattice (elastic_mapping.go:35-49).  Values are bit
# positions only so set arithmetic mirrors the reference's bitmask.
_ION_TYPES = [
    "null", "bool", "int", "float", "decimal", "timestamp", "string",
    "list", "struct", "sexp", "clob", "blob", "annotation",
]

_ELASTIC_OF = {
    "bool": "boolean",
    "int": "long",
    "float": "double",
    "timestamp": "date",
    "string": "keyword",
    "struct": "object",
    "list": "list",
}

_DEFAULT_TYPE = "keyword"


def _elastic_type(types: set[str]) -> str:
    """obtainElasticType (elastic_mapping.go:156-196): drop null,
    single known type maps directly, int|float is the one blessed
    union, anything else -> '' (caller falls back to keyword)."""
    types = types - {"null"}
    if len(types) == 1:
        return _ELASTIC_OF.get(next(iter(types)), "")
    if types == {"int", "float"}:
        return "double"
    return ""


def datashape_to_elastic_mapping(fields: dict[str, Any]) -> dict:
    """Fold a SNELLER_DATASHAPE `fields` histogram into an Elastic
    mapping dict ``{"properties": {...}}`` — the JSON shape the proxy
    serves (DataShapeToElasticMapping, elastic_mapping.go:71-101)."""
    props: dict[str, dict] = {}
    for field, details in fields.items():
        if "$items" in field:
            continue
        if not isinstance(details, dict):
            continue  # wrong input structure, but don't abort
        types = {
            name for name, count in details.items()
            if name in _ION_TYPES
            # the reference requires an integer count (a Go int); a
            # bool is NOT one there, and bool is an int subtype here
            and isinstance(count, int) and not isinstance(count, bool)
            and count > 0
        }
        etype = _elastic_type(types) or _DEFAULT_TYPE
        props[field] = {"type": etype}
    _rebuild_hierarchy(props)
    return {"properties": props}


def _rebuild_hierarchy(props: dict[str, dict]) -> None:
    """rebuildObjectsHierarchy (elastic_mapping.go:198-226): for every
    propertyless `object` at THIS level with an undotted name, pull
    the `name.`-prefixed flat paths under its `properties` and
    recurse."""
    objects = [
        path for path, val in props.items()
        if val.get("type") == "object" and "properties" not in val
        and "." not in path
    ]
    for path in objects:
        prefix = path + "."
        nested: dict[str, dict] = {}
        for key in list(props):
            if key.startswith(prefix):
                nested[key[len(prefix):]] = props.pop(key)
        _rebuild_hierarchy(nested)
        props[path]["properties"] = nested


# ---------------------------------------------------------------------
# DataFrame -> datashape fields histogram (one aggregate pass)
# ---------------------------------------------------------------------

def _ion_name(dt: T.DataType) -> str:
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "timestamp"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "blob"
    if isinstance(dt, T.ArrayType):
        return "list"
    if isinstance(dt, (T.StructType, T.MapType)):
        return "struct"
    return "string"


def _walk(prefix: str, dt: T.DataType, out: list[tuple[str, T.DataType]]):
    out.append((prefix, dt))
    if isinstance(dt, T.StructType):
        for f in dt.fields:
            _walk(f"{prefix}.{f.name}", f.dataType, out)


def datashape_fields(df: DataFrame) -> dict[str, dict[str, int]]:
    """Per-path Ion type histogram of a DataFrame — the
    SNELLER_DATASHAPE `fields` object (vm/sysdatashape.go:24-80) a
    static schema admits: every path contributes its schema type with
    its non-null count plus a `null` count, arrays add a `$items`
    union entry with the total element count.  One `.agg()` pass."""
    paths: list[tuple[str, T.DataType]] = []
    for f in df.schema.fields:
        _walk(f.name, f.dataType, paths)

    exprs, names = [], []
    for p, dt in paths:
        col = F.col("`" + p.replace(".", "`.`") + "`")
        exprs.append(F.count(col))
        exprs.append(F.count(F.lit(1)) - F.count(col))
        names.append((p, _ion_name(dt)))
        if isinstance(dt, T.ArrayType):
            exprs.append(F.sum(
                F.when(col.isNotNull(), F.size(col)).otherwise(0)))
            names.append((f"{p}.$items", _ion_name(dt.elementType)))
    row = df.agg(*exprs).collect()[0]

    fields: dict[str, dict[str, int]] = {}
    i = 0
    for p, ion in names:
        if p.endswith(".$items"):
            n_items = int(row[i] or 0)
            i += 1
            fields[p] = {ion: n_items}
            continue
        n, n_null = int(row[i]), int(row[i + 1])
        i += 2
        d: dict[str, int] = {}
        if n > 0:
            d[ion] = n
        if n_null > 0:
            d["null"] = n_null
        fields[p] = d
    return fields


def elastic_mapping(df: DataFrame, index: str) -> dict:
    """The proxy's `GET /{index}/_mapping` response body:
    ``{index: {"properties": ...}}`` (proxy_http/handle_mapping.go,
    integration-asserted against testdata/flights_mapping.json and
    news_mapping.json in proxy_http/mapping_test.go:163-190)."""
    return {index: datashape_to_elastic_mapping(datashape_fields(df))}
