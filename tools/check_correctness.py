"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark at sf0.01 and compare against oracle_sql()
through DuckDB — row count, column names, and order-insensitive
values (sorted by column name, NaN-safe).

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from sneller_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CHECK", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        canon = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon.append(None)
            elif isinstance(v, float):
                canon.append(round(v, 9))
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                def _elem(x):
                    if hasattr(x, "item"):
                        x = x.item()
                    return round(x, 9) if isinstance(x, float) else x
                canon.append(tuple(_elem(x) for x in v))
            elif hasattr(v, "item"):
                canon.append(v.item())
            else:
                canon.append(v)
        rows.append(tuple(str(x) for x in canon))
    return sorted(rows)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(
        master="local[8]", shuffle_partitions=8, extra_conf={"spark.driver.memory": "8g"}
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        g, e = _canon(got), _canon(exp)
        if g != e:
            diff = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {diff}")
            for i in diff:
                print(f"   got: {g[i]}\n   exp: {e[i]}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(got)} rows")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_rows_only} rows-only, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
