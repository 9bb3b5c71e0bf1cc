from .introspect import (
    assert_broadcast_join,
    assert_no_exchange,
    assert_no_python_in_plan,
    assert_partition_pruned,
    assert_pushed_filters,
    assert_single_arrow_eval,
    assert_single_python_boundary,
    explain_str,
    partition_filters,
    pushed_filters,
    scan_read_schema,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "scan_read_schema",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "assert_single_arrow_eval",
    "assert_single_python_boundary",
    "assert_no_exchange",
    "assert_no_python_in_plan",
    "partition_filters",
    "assert_partition_pruned",
]
