"""Planner-corpus replay (sneller_spark.replay_pir).

Every build test of the reference's PIR planner
(/root/reference/plan/pir/testdata/build/**/*.test) must translate and
execute on Spark over tables synthesized from the expected plan's own
FIELDS schema lines, and — where the reference's split plan contains a
partial/merge aggregate — Spark's physical plan must show the same
two-phase split (Catalyst's partial_ HashAggregate is the analog of
the reference's ``UNION MAP`` + ``AGGREGATE .PARTIAL/.MERGE``
decomposition, plan/pir/build_test.go).
"""

from __future__ import annotations

import os

import pytest

from sneller_spark import replay_pir

pytestmark = pytest.mark.skipif(
    not os.path.isdir(replay_pir.PIR_BUILD),
    reason="reference planner corpus not available",
)


def test_pir_corpus_inventory():
    assert len(replay_pir.list_cases()) >= 46


@pytest.mark.parametrize("rel", replay_pir.list_cases())
def test_pir_case(spark, rel):
    rec = replay_pir.run_pir_case(
        spark, os.path.join(replay_pir.PIR_BUILD, rel)
    )
    assert rec["status"] == "pass", (
        f"{rel}: {rec['status']} {rec.get('detail', '')[:300]}\n"
        f"SQL: {rec.get('sql', '')[:300]}"
    )


def test_pir_split_coverage(spark):
    """Six corpus cases ship an expected split (map/reduce) plan; each
    must have been plan-checked against Catalyst's partial_/final
    HashAggregate decomposition."""
    checked = 0
    for rel in replay_pir.list_cases():
        rec = replay_pir.run_pir_case(
            spark, os.path.join(replay_pir.PIR_BUILD, rel)
        )
        if rec.get("split_checked"):
            checked += 1
    assert checked >= 6
