"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the operator catalog (sneller_spark.query_catalog
+ query_catalog_ml — one entry per implemented operator from
SURVEY.md §2); ``oracle_sql()`` the matching DuckDB SQL.  Entries whose
semantics cannot be reproduced in ANSI SQL (approx sketches, xxhash64-
based dedup, generated-input pipelines) have no oracle and get the
driver's rows-only check; their exact-correctness coverage lives in
tests/ against the pure-pandas oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sneller_spark import (  # noqa: F401,E402
    query_catalog,
    query_catalog_extra,
    query_catalog_ml,
)
from sneller_spark.query_catalog import CATALOG  # noqa: E402
from sneller_spark.session import ship_package  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the parse -> enrich -> route -> aggregate DAG in
    miniature over /root/testdata/sf0.001 documents."""
    ship_package(spark)
    return CATALOG["docs_pipeline_route_agg"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ship_package(spark)  # mapInArrow entries need the pkg on workers
            # timestamp->string results must render in UTC regardless of
            # the caller's session defaults (oracle timestamps are
            # UTC-naive)
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    return {name: wrap(e.fn) for name, e in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in CATALOG.items() if e.oracle is not None}
