"""Enrichment lookup + routing rule tables (FIXTURES.md §1.2-1.3).

These are the broadcast side of the enrich stage — the Spark analog of
Sneller's HASH_LOOKUP constant maps (/root/reference/expr/node.go:1656)
and its join-elimination-into-broadcast rewrite
(/root/reference/plan/pir/joinelim.go:23-120).  Like the reference, we
enforce a small-side cardinality guard before broadcasting
(/root/reference/doc/sneller-SQL.md:249-250: RHS must be <= 10,000
rows).
"""

from __future__ import annotations

import pandas as pd

from .datagen import SOURCES
from .vocab import LEVELS

TENANTS = ["tenant-blue", "tenant-green", "tenant-red", "tenant-gold"]
CATEGORIES = ["infra", "web", "app", "data", "security", "batch"]

# source -> (tenant, category); 12 live sources + 3 unreferenced extras
_SOURCE_MAP: dict[str, tuple[str, str]] = {
    "syslog-a": ("tenant-blue", "infra"),
    "syslog-b": ("tenant-blue", "infra"),
    "nginx": ("tenant-green", "web"),
    "k8s": ("tenant-green", "infra"),
    "app-api": ("tenant-red", "app"),
    "app-web": ("tenant-red", "web"),
    "cdn": ("tenant-green", "web"),
    "db": ("tenant-gold", "data"),
    "cache": ("tenant-gold", "data"),
    "auth": ("tenant-red", "security"),
    "batch": ("tenant-gold", "batch"),
    "edge": ("tenant-green", "web"),
    # unreferenced extras (never appear in generated data)
    "legacy-ftp": ("tenant-blue", "batch"),
    "mainframe": ("tenant-gold", "batch"),
    "telemetry-x": ("tenant-red", "app"),
}

# Lookup.Else semantics (/root/reference/expr/node.go:1656-1660):
UNKNOWN_TENANT = "unknown"
UNKNOWN_CATEGORY = "unknown"

# routing: (category, level) -> sink_id; 8 sinks, one catch-all
SINKS = [f"sink-{i}" for i in range(8)]
CATCH_ALL_SINK = "sink-7"


def lookup_source_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        [(s, t, c) for s, (t, c) in _SOURCE_MAP.items()],
        columns=["source", "tenant", "category"],
    )


def route_rules_pdf() -> pd.DataFrame:
    """category x level -> sink_id.  ERROR rows concentrate in sink-0/1,
    security in sink-2; the rest spread deterministically.  (category,
    level) pairs with no rule — including level=null (no match in the
    parse stage) — fall through to the catch-all sink."""
    rows: list[tuple[str, str, str]] = []
    for ci, cat in enumerate(CATEGORIES):
        for li, lv in enumerate(LEVELS):
            if lv == "ERROR":
                sink = "sink-0" if cat in ("infra", "web") else "sink-1"
            elif cat == "security":
                sink = "sink-2"
            else:
                sink = f"sink-{3 + (ci * 4 + li) % 4}"  # sink-3..sink-6
            rows.append((cat, lv, sink))
    # drop a couple of rules so the catch-all path is exercised
    rows = [r for r in rows if not (r[0] == "batch" and r[1] == "DEBUG")]
    return pd.DataFrame(rows, columns=["category", "level", "sink_id"])


def lookup_source_df(spark):
    return spark.createDataFrame(lookup_source_pdf())


def route_rules_df(spark):
    return spark.createDataFrame(route_rules_pdf())
