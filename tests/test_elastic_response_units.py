"""Pure-driver unit tests for elastic_response helpers — branches the
recorded corpus doesn't reach (no SparkSession needed)."""
from __future__ import annotations

from datetime import datetime, timezone

import pytest

from sneller_spark.adapters.elastic_response import (
    MetricResult,
    _compare_values,
    _epoch_micros,
    format_out_raw,
    go_marshal,
    hash_item,
)


def test_go_marshal_negative_zero():
    """encoding/json keeps the sign of -0.0."""
    assert go_marshal(-0.0) == "-0"
    assert go_marshal(0.0) == "0"
    assert hash_item({"v": -0.0}) != hash_item({"v": 0.0})


def test_plain_int_date_format():
    """Every decoded int is a Go int64; type_format.go:250-258 attempts
    the epoch-ms reading for all of them."""
    ms = 1647820800000  # 2022-03-21T00:00:00Z
    # date_time is Go's ".999Z" layout (trailing zeros trimmed);
    # only the "datetime" format pads whole seconds to ".000Z"
    assert format_out_raw(ms, "date_time") == "2022-03-21T00:00:00Z"
    assert format_out_raw(ms, "datetime") == "2022-03-21T00:00:00.000Z"
    assert format_out_raw(ms, "epoch_second") == 1647820800
    # bools are their own Go type and never take the int64 path
    with pytest.raises(Exception):
        format_out_raw(True, "date_time")


def test_trailing_space_format_keys():
    """The two trailing-space keys are verbatim reference case labels
    (type_format.go:223,225); the space-free spellings fall through to
    the RFC3339Nano default."""
    d = datetime(2023, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
    assert format_out_raw(d, "date_hour_minute_second_fraction ") \
        == "2023-01-02T03:04:05"
    assert format_out_raw(d, "date_hour_minute_second_fraction") \
        == "2023-01-02T03:04:05Z"


def test_compare_values_nan_inf():
    """Go's float->int conversion never panics; on amd64 every invalid
    input (NaN, +/-Inf, overflow) becomes min-int64 — 'less'."""
    nan, inf = float("nan"), float("inf")
    assert _compare_values(nan, 1.0) == -(1 << 63)
    assert _compare_values(inf, 1.0) == -(1 << 63)
    assert _compare_values(1.0, inf) == -(1 << 63)
    assert _compare_values(1e300, -1e300) == -(1 << 63)
    assert _compare_values(MetricResult(nan), MetricResult(0.0)) \
        == -(1 << 63)
    assert _compare_values(2.9, 1.0) == 1  # truncation quirk intact
    assert _compare_values(1.5, 1.0) == 0


def test_epoch_micros_exact():
    """timedelta integer arithmetic: exact to the microsecond where
    float epoch seconds round at ~0.24 us past 2001."""
    d = datetime(2026, 8, 18, 10, 0, 0, 123457, tzinfo=timezone.utc)
    assert _epoch_micros(d) % 1_000_000 == 123457
    assert format_out_raw(d, "unix_micro_seconds") % 10 == 7
    assert format_out_raw(d, "unix_nano_seconds") \
        == format_out_raw(d, "unix_micro_seconds") * 1000
    pre = datetime(1965, 1, 1, 0, 0, 0, 250000, tzinfo=timezone.utc)
    assert format_out_raw(pre, "unix_micro_seconds") \
        == -157766400000000 + 250000
