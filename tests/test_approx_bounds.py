"""Quantitative error bounds for the two approximate aggregates.

The reference ships precision contracts for its sketches (HLL:
/root/reference/vm/aggcountdistinct.go:15-60, precision 4-16; t-digest:
/root/reference/vm/aggtdigest.go:26-50).  Spark publishes the matching
contracts — approx_count_distinct's `rsd` is the target relative
standard deviation of the HLL++ estimate, and percentile_approx's
`accuracy` bounds the RANK error at N/accuracy — so the rows-only
catalog entries (approx_count_distinct_hll, approx_percentile_tdigest)
carry these value checks here instead of a SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"

RSD = 0.02
ACCURACY = 10_000


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_approx_count_distinct_within_rsd_band(spark, lineitem):
    """Per-group relative error of HLL++ vs exact COUNT(DISTINCT) must
    sit inside a 5-sigma band of the requested rsd."""
    got = (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=RSD).alias("approx"),
            F.count_distinct("l_orderkey").alias("exact"),
        )
        .toPandas()
    )
    assert len(got) >= 2
    rel_err = (got["approx"] - got["exact"]).abs() / got["exact"]
    assert (rel_err <= 5 * RSD).all(), got


def test_approx_percentile_within_rank_accuracy(spark, lineitem):
    """percentile_approx guarantees rank error <= N/accuracy: the
    returned value's true rank must be within that many positions of
    the requested quantile (checked per group, with a small slack for
    ties/implementation fuzz)."""
    approx = (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, ACCURACY).alias("a50"),
            F.percentile_approx("l_extendedprice", 0.9, ACCURACY).alias("a90"),
        )
        .toPandas()
        .set_index("l_returnflag")
    )
    values = (
        lineitem.select("l_returnflag", "l_extendedprice")
        .toPandas()
        .groupby("l_returnflag")["l_extendedprice"]
    )
    for flag, series in values:
        x = np.sort(series.to_numpy())
        n = len(x)
        budget = max(2.0, 2.0 * n / ACCURACY)  # 2x contract + tie slack
        for q, col in ((0.5, "a50"), (0.9, "a90")):
            v = approx.loc[flag, col]
            rank_lo = np.searchsorted(x, v, side="left")
            rank_hi = np.searchsorted(x, v, side="right")
            target = q * (n - 1)
            # the interval of ranks holding value v must approach the
            # target rank within the accuracy budget
            dist = max(rank_lo - target, target - (rank_hi - 1), 0)
            assert dist <= budget, (flag, q, v, dist, budget)
