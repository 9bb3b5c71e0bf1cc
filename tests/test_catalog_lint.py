"""Catalog-wide lints.

The driver's correctness harness canonicalizes EVERY entry's result
through pandas sort/factorize, which cannot hash array- or struct-typed
cells (the round-1 `approx_percentile_tdigest` crash — even a rows-only
entry goes through canonicalization).  So: no entry may expose a
top-level array / map / struct column; unpack to scalars or serialize
to a string inside the entry.
"""

from __future__ import annotations

from pyspark.sql import types as T

from sneller_spark import (  # noqa: F401 — registration side effects
    query_catalog,
    query_catalog_extra,
    query_catalog_ml,
)
from sneller_spark.query_catalog import CATALOG

_FORBIDDEN = (T.ArrayType, T.MapType, T.StructType)


def test_all_entries_return_scalar_columns_only(spark, sf_dir):
    offenders = []
    for name, entry in CATALOG.items():
        schema = entry.fn(spark, sf_dir).schema  # analysis only, no execution
        for f in schema.fields:
            if isinstance(f.dataType, _FORBIDDEN):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, (
        "driver-unsafe result columns (unpack to scalars): " + "; ".join(offenders)
    )


def test_every_oracle_names_a_registered_entry():
    for name, entry in CATALOG.items():
        if entry.oracle is not None:
            assert isinstance(entry.oracle, str) and entry.oracle.strip(), name


def test_limit_oracles_carry_order_by():
    """Determinism discipline: any oracle with LIMIT must also have an
    ORDER BY (a LIMIT without total order compares nondeterministic row
    sets across engines)."""
    import re

    for name, entry in CATALOG.items():
        if entry.oracle is None:
            continue
        sql = entry.oracle.upper()
        if re.search(r"\bLIMIT\b", sql):
            assert "ORDER BY" in sql, f"{name}: LIMIT without ORDER BY in oracle"
