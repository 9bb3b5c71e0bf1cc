"""Go's ``sort.Slice`` (pdqsort), reproduced for byte-exact replay.

The proxy's ``bucket_sort`` pipeline aggregation orders buckets with
Go's *unstable* ``sort.Slice`` (ref: elasticproxy/elastic-proxy/
aggs_bucket_sort.go:36), so when two buckets compare equal their final
order is whatever permutation Go's pattern-defeating quicksort leaves
behind — and the recorded step-5 artifacts capture exactly that
permutation (e.g. testdata-new/pipeline-order, where CA and ZA tie on
``total_count`` at the size cut-off and pdqsort emits ZA).

To replay those artifacts we reproduce the algorithm from Go 1.20's
``sort`` package (``zsortfunc.go`` — public Go standard library, BSD
license; the go.mod of the reference pins ``go 1.20``).  Every branch
below, including the xorshift pattern breaker, is deterministic, so
the permutation is reproducible.

This is driver-side bookkeeping over already-aggregated bucket lists
(tens of entries), never a data-plane sort.
"""
from __future__ import annotations

from typing import Any, Callable

_MAX_INSERTION = 12

_INCREASING, _DECREASING, _UNKNOWN = 1, 2, 0

_M64 = (1 << 64) - 1


class _Xorshift:
    """sort.xorshift — seeded with the slice length.  Go's pdqsort was
    ported from Rust's core::slice::sort, which (like Go) uses the
    13/17/5 shift triple — NOT the 13/7/17 of Marsaglia's 64-bit
    example.  Only reachable via breakPatterns after an unbalanced
    partition; the recorded artifacts never get there, so this is
    pinned by fidelity to the source, not by a capture."""

    def __init__(self, seed: int):
        self.v = seed & _M64

    def next(self) -> int:
        v = self.v
        v = (v ^ (v << 13)) & _M64
        v = (v ^ (v >> 17)) & _M64
        v = (v ^ (v << 5)) & _M64
        self.v = v
        return v


def _bits_len(n: int) -> int:
    return n.bit_length()


def go_sort_slice(items: list, less: Callable[[Any, Any], bool]) -> None:
    """In-place ``sort.Slice(items, less)`` with Go 1.20 tie behavior."""
    n = len(items)
    if n <= 1:
        return
    _pdqsort(items, less, 0, n, _bits_len(n))


def _pdqsort(d: list, less, a: int, b: int, limit: int) -> None:
    was_balanced = True
    was_partitioned = True
    while True:
        length = b - a
        if length <= _MAX_INSERTION:
            _insertion_sort(d, less, a, b)
            return
        if limit == 0:
            _heap_sort(d, less, a, b)
            return
        if not was_balanced:
            _break_patterns(d, a, b)
            limit -= 1

        pivot, hint = _choose_pivot(d, less, a, b)
        if hint == _DECREASING:
            _reverse_range(d, a, b)
            pivot = (b - 1) - (pivot - a)
            hint = _INCREASING

        if was_balanced and was_partitioned and hint == _INCREASING:
            if _partial_insertion_sort(d, less, a, b):
                return

        # If the chosen pivot equals data[a-1], everything < pivot is
        # already left of a — skip over the run of equal elements.
        if a > 0 and not less(d[a - 1], d[pivot]):
            a = _partition_equal(d, less, a, b, pivot)
            continue

        mid, already_partitioned = _partition(d, less, a, b, pivot)
        was_partitioned = already_partitioned

        left_len, right_len = mid - a, b - mid
        was_balanced = min(left_len, right_len) >= length // 8
        if left_len < right_len:
            _pdqsort(d, less, a, mid, limit)
            a = mid + 1
        else:
            _pdqsort(d, less, mid + 1, b, limit)
            b = mid


def _insertion_sort(d: list, less, a: int, b: int) -> None:
    for i in range(a + 1, b):
        j = i
        while j > a and less(d[j], d[j - 1]):
            d[j], d[j - 1] = d[j - 1], d[j]
            j -= 1


def _sift_down(d: list, less, lo: int, hi: int, first: int) -> None:
    root = lo
    while True:
        child = 2 * root + 1
        if child >= hi:
            return
        if child + 1 < hi and less(d[first + child], d[first + child + 1]):
            child += 1
        if not less(d[first + root], d[first + child]):
            return
        d[first + root], d[first + child] = d[first + child], d[first + root]
        root = child


def _heap_sort(d: list, less, a: int, b: int) -> None:
    first, hi = a, b - a
    for i in range((hi - 1) // 2, -1, -1):
        _sift_down(d, less, i, hi, first)
    for i in range(hi - 1, -1, -1):
        d[first], d[first + i] = d[first + i], d[first]
        _sift_down(d, less, 0, i, first)


def _break_patterns(d: list, a: int, b: int) -> None:
    length = b - a
    if length < 8:
        return
    random = _Xorshift(length)
    modulus = 1 << _bits_len(length)  # nextPowerOfTwo
    idx = a + (length // 4) * 2 - 1
    for i in range(3):
        other = random.next() & (modulus - 1)
        if other >= length:
            other -= length
        d[idx - 1 + i], d[a + other] = d[a + other], d[idx - 1 + i]


def _order2(d: list, less, a: int, b: int, swaps: list) -> tuple[int, int]:
    if less(d[b], d[a]):
        swaps[0] += 1
        return b, a
    return a, b


def _median(d: list, less, a: int, b: int, c: int, swaps: list) -> int:
    a, b = _order2(d, less, a, b, swaps)
    b, c = _order2(d, less, b, c, swaps)
    a, b = _order2(d, less, a, b, swaps)
    return b


def _median_adjacent(d: list, less, a: int, swaps: list) -> int:
    return _median(d, less, a - 1, a, a + 1, swaps)


def _choose_pivot(d: list, less, a: int, b: int) -> tuple[int, int]:
    SHORTEST_NINTHER, MAX_SWAPS = 50, 12
    length = b - a
    swaps = [0]
    i = a + (length // 4) * 1
    j = a + (length // 4) * 2
    k = a + (length // 4) * 3
    if length >= 8:
        if length >= SHORTEST_NINTHER:
            i = _median_adjacent(d, less, i, swaps)
            j = _median_adjacent(d, less, j, swaps)
            k = _median_adjacent(d, less, k, swaps)
        j = _median(d, less, i, j, k, swaps)
    if swaps[0] == 0:
        return j, _INCREASING
    if swaps[0] == MAX_SWAPS:
        return j, _DECREASING
    return j, _UNKNOWN


def _reverse_range(d: list, a: int, b: int) -> None:
    i, j = a, b - 1
    while i < j:
        d[i], d[j] = d[j], d[i]
        i += 1
        j -= 1


def _partial_insertion_sort(d: list, less, a: int, b: int) -> bool:
    MAX_STEPS, SHORTEST_SHIFTING = 5, 50
    i = a + 1
    for _ in range(MAX_STEPS):
        while i < b and not less(d[i], d[i - 1]):
            i += 1
        if i == b:
            return True
        if b - a < SHORTEST_SHIFTING:
            return False
        d[i], d[i - 1] = d[i - 1], d[i]
        if i - a >= 2:
            for j in range(i - 1, 0, -1):
                if not less(d[j], d[j - 1]):
                    break
                d[j], d[j - 1] = d[j - 1], d[j]
        if b - i >= 2:
            for j in range(i + 1, b):
                if not less(d[j], d[j - 1]):
                    break
                d[j], d[j - 1] = d[j - 1], d[j]
    return False


def _partition(d: list, less, a: int, b: int,
               pivot: int) -> tuple[int, bool]:
    d[a], d[pivot] = d[pivot], d[a]
    i, j = a + 1, b - 1
    while i <= j and less(d[i], d[a]):
        i += 1
    while i <= j and not less(d[j], d[a]):
        j -= 1
    if i > j:
        d[j], d[a] = d[a], d[j]
        return j, True
    d[i], d[j] = d[j], d[i]
    i += 1
    j -= 1
    while True:
        while i <= j and less(d[i], d[a]):
            i += 1
        while i <= j and not less(d[j], d[a]):
            j -= 1
        if i > j:
            break
        d[i], d[j] = d[j], d[i]
        i += 1
        j -= 1
    d[j], d[a] = d[a], d[j]
    return j, False


def _partition_equal(d: list, less, a: int, b: int, pivot: int) -> int:
    d[a], d[pivot] = d[pivot], d[a]
    i, j = a + 1, b - 1
    while True:
        while i <= j and not less(d[a], d[i]):
            i += 1
        while i <= j and less(d[a], d[j]):
            j -= 1
        if i > j:
            break
        d[i], d[j] = d[j], d[i]
        i += 1
        j -= 1
    return i
