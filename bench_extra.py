"""Extra benchmark harness for the optimization round (guide §1).

`bench.py` is the frozen official harness; this file adds the
measurement tooling the optimization loop needs without touching it:

  * per-query isolation: time any subset of catalog queries with the
    same methodology as bench.py (warm pass + interleaved best-of-N
    collect()), so a single change can be re-measured in seconds
    instead of re-running the whole suite;
  * plan capture: dump ``.explain("formatted")`` for each query to
    plans/<tag>/<name>.txt (the judge-facing before/after evidence);
  * optional noop-sink timing (guide §1.4): computes every column of
    every row without the collect()'s driver-side row materialization,
    isolating cluster compute from driver transfer.

Usage:
  python bench_extra.py q1 q2 ...            # time queries
  python bench_extra.py --plans plans/r07 --suffix _before q1 q2
  python bench_extra.py --noop q1            # noop sink instead of collect
  python bench_extra.py --rounds 5 q1

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sneller_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def capture_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    args = sys.argv[1:]
    rounds = 3
    plans_dir = None
    suffix = ""
    noop = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--rounds":
            rounds = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        elif a == "--noop":
            noop = True; i += 1
        elif a == "--plans-only":
            rounds = 0; i += 1
        else:
            names.append(a); i += 1

    from sneller_spark import query_catalog_ml  # noqa: F401
    from sneller_spark.query_catalog import CATALOG

    unknown = [n for n in names if n not in CATALOG]
    assert not unknown, f"unknown queries: {unknown}"

    spark = get_spark(
        app_name="sneller_spark_bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )

    def run(name):
        df = CATALOG[name].fn(spark, SF_DIR)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()

    # warm (plan + IO cache + python workers), then interleaved best-of-N
    for n in names:
        if rounds > 0:
            spark.sparkContext.setJobDescription(f"warm:{n}")
            run(n)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            plan = capture_plan(CATALOG[n].fn(spark, SF_DIR))
            with open(os.path.join(plans_dir, f"{n}{suffix}.txt"), "w") as f:
                f.write(plan)
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(rounds):
        for n in names:
            spark.sparkContext.setJobDescription(f"time:{n}")
            t0 = time.monotonic()
            run(n)
            samples[n].append(time.monotonic() - t0)
    out = {
        "sf": SF_DIR,
        "cpus": CPUS,
        "mode": "noop" if noop else "collect",
        "best": {n: round(min(s), 3) for n, s in samples.items()},
        "samples": {n: [round(x, 3) for x in s] for n, s in samples.items()},
        "load1": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
