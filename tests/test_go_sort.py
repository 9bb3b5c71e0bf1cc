"""Differential tests for the Go 1.20 pdqsort port (adapters/go_sort).

The port exists so `bucket_sort` tie permutations replay byte-for-byte
(pinned by testdata-new/pipeline-order in
tests/test_replay_elastic_response.py).  These tests harden the
transcription itself:

* as a SORT it must agree with Python's `sorted` on every input
  (ties aside, the multiset and the non-decreasing order are fixed);
* on all-distinct inputs the result is the unique total order, so any
  branch bug that misplaces an element shows up immediately;
* adversarial patterns (sorted, reversed, sawtooth, constant, few
  distinct values) walk the pdqsort special paths — partial insertion
  sort, reverse-range hint, partitionEqual, pattern breaker, heapsort
  depth fallback.
"""
from __future__ import annotations

import random

import pytest

from sneller_spark.adapters.go_sort import go_sort_slice

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def _check(items: list) -> None:
    got = list(items)
    go_sort_slice(got, lambda a, b: a < b)
    assert got == sorted(items)


PATTERNS = [
    [],
    [1],
    [2, 1],
    list(range(100)),
    list(range(100, 0, -1)),
    [i % 7 for i in range(200)],           # few distinct → partitionEqual
    [0] * 150,                              # constant
    [i % 2 for i in range(64)],             # alternating
    list(range(50)) + list(range(50, 0, -1)),  # sawtooth
    [5] * 20 + list(range(20)) + [5] * 20,
]


@pytest.mark.parametrize("idx", range(len(PATTERNS)))
def test_adversarial_patterns(idx):
    _check(PATTERNS[idx])


def test_random_sizes_seeded():
    rng = random.Random(0xC0FFEE)
    for n in [3, 7, 11, 12, 13, 25, 49, 50, 51, 100, 257, 1000, 4096]:
        for _ in range(3):
            _check([rng.randrange(n * 2) for _ in range(n)])
            _check([rng.randrange(3) for _ in range(n)])  # heavy ties


def test_distinct_is_total_order():
    rng = random.Random(7)
    for n in [13, 64, 300]:
        items = list(range(n))
        rng.shuffle(items)
        _check(items)


def test_heapsort_fallback_reached():
    """A quadratic-ish killer input must still sort (limit → heapSort).
    Median-of-3 killer sequence drives repeated bad partitions."""
    n = 1024
    killer = [0] * n
    # classic mo3-killer construction
    for i in range(n // 2):
        killer[i] = i * 2 + 1 if i % 2 else i + 1
        killer[n // 2 + i] = (i + 1) * 2
    _check(killer)


def test_less_call_contract():
    """less() must never see indices out of range and the sort must
    never compare an element with itself via different positions in a
    way that breaks on a strict order."""
    calls = []

    def less(a, b):
        calls.append((a, b))
        return a < b

    items = [3, 1, 2, 3, 1, 2, 0, 5, 4, 9, 8, 7, 6, 3, 1, 2]
    got = list(items)
    go_sort_slice(got, less)
    assert got == sorted(items)
    assert calls  # comparator actually consulted


if HAVE_HYP:

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.integers(min_value=-50, max_value=50), max_size=400))
    def test_hypothesis_matches_sorted(xs):
        _check(xs)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.floats(allow_nan=False), max_size=200))
    def test_hypothesis_floats(xs):
        _check(xs)
