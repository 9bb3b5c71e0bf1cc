"""Debug one replay case: show translated SQL and got-vs-expected rows.

Usage: python tools/replay_debug.py <case-substring> [n_rows]
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from sneller_spark import replay
from sneller_spark.session import get_spark
from sneller_spark.sql_registry import register_sql_functions


def main():
    frag = sys.argv[1]
    nshow = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark(app_name="replay_debug", master="local[4]",
                      shuffle_partitions=4,
                      extra_conf={"spark.driver.memory": "6g"})
    register_sql_functions(spark)
    for path in replay.list_cases():
        if frag not in path:
            continue
        print("=" * 70)
        print(path)
        query, inputs, expected = replay.parse_case(path)
        print("--- original SQL ---")
        print(query)
        print("--- translated ---")
        print(replay.translate(query))
        rec = replay.run_case(spark, path, keep_rows=True)
        print("status:", rec["status"], rec.get("detail", "")[:200])
        got = rec.get("got_rows") or []
        exp = rec.get("exp_rows") or []
        print(f"got {len(got)} rows, expected {len(exp)} rows")
        shown = 0
        for i in range(max(len(got), len(exp))):
            g = got[i] if i < len(got) else None
            e = exp[i] if i < len(exp) else None
            if g != e:
                print(f"[{i}] got {g}\n    exp {e}")
                shown += 1
                if shown >= nshow:
                    break


if __name__ == "__main__":
    main()
