"""Replay of the reference's date-math test table (pure Python).

The 26 cases are verbatim from
elasticproxy/elastic-proxy/date_math_test.go:23-57 (text + expected
RFC3339 result).  The reference computes in Europe/Amsterdam; our
pipeline is tz-naive (session-TZ pinned UTC elsewhere), and every
reference operation (AddDate calendar arithmetic, wall-clock
rounding) preserves wall time across its zone, so the expected NAIVE
wall-clock values — the RFC strings with their offsets dropped —
are the exact contract.

Pinned reference quirks (divergences from real Elastic, followed
deliberately): `/w` rounds to SUNDAY (date_math.go:62-65), and
`+Nd`/`+Nw` are calendar days via AddDate, not fixed seconds.
"""

from __future__ import annotations

import datetime as dt

import pytest

from sneller_spark.adapters.elastic import ElasticDslError, parse_date_math

NOW = dt.datetime(2022, 5, 12, 14, 51, 34, 123456)

# (input, expected-wall-clock) — date_math_test.go:28-56 verbatim,
# offsets dropped (wall time is zone-invariant for every op used).
CASES = [
    ("now", "2022-05-12T14:51:34.123456"),
    ("now/s", "2022-05-12T14:51:34"),
    ("now/m", "2022-05-12T14:51:00"),
    ("now/h", "2022-05-12T14:00:00"),
    ("now/H", "2022-05-12T14:00:00"),
    ("now/d", "2022-05-12T00:00:00"),
    ("now/w", "2022-05-08T00:00:00"),  # SUNDAY — the reference's rule
    ("now/M", "2022-05-01T00:00:00"),
    ("now/y", "2022-01-01T00:00:00"),
    ("now+10s", "2022-05-12T14:51:44.123456"),
    ("now+10m", "2022-05-12T15:01:34.123456"),
    ("now+10h", "2022-05-13T00:51:34.123456"),
    ("now+10H", "2022-05-13T00:51:34.123456"),
    ("now+10d", "2022-05-22T14:51:34.123456"),
    ("now+10w", "2022-07-21T14:51:34.123456"),
    ("now+10M", "2023-03-12T14:51:34.123456"),
    ("now+10y", "2032-05-12T14:51:34.123456"),
    ("now-10s", "2022-05-12T14:51:24.123456"),
    ("now-10m", "2022-05-12T14:41:34.123456"),
    ("now/d+10m", "2022-05-12T00:10:00"),
    ("now-1d/d+10m", "2022-05-11T00:10:00"),
    ("now+1y-2M+3d-4w+5h-6m+7s", "2023-02-15T19:45:41.123456"),
    ("now+1y-2M+3d-4w+5h-6m+7s/s", "2023-02-15T19:45:41"),
    ("2022.01.03||+1M", "2022-02-03T00:00:00"),
    ("2022.01.03 12:34||+1M", "2022-02-03T12:34:00"),
    ("2022.01.03 12:34:56||+1M", "2022-02-03T12:34:56"),
    ("2022.01.03 12:34:56.123||+1M", "2022-02-03T12:34:56.123"),
    ("2022.01.03 12:34:56.123456||+1M", "2022-02-03T12:34:56.123456"),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_date_math_reference_case(text, expected):
    assert parse_date_math(text, NOW) == dt.datetime.fromisoformat(expected)


def test_interleaved_ops_and_errors():
    # ragel grammar allows any (round | adjust)* interleaving
    assert parse_date_math("now/y+1M/M", NOW) == dt.datetime(2022, 2, 1)
    with pytest.raises(ElasticDslError):
        parse_date_math("now+1q", NOW)  # bad unit
    with pytest.raises(ElasticDslError):
        parse_date_math("now+1", NOW)  # dangling adjust
    with pytest.raises(ElasticDslError):
        parse_date_math("2022-13-01||", NOW)  # invalid date
    with pytest.raises(ElasticDslError):
        parse_date_math("yesterday", NOW)
