from .bucketing import bucketed_join, write_bucketed
from .readers import (
    append_tables,
    dummy_output,
    no_output,
    read_records_json,
    read_table,
    table_glob,
    table_pattern,
    write_iceberg_or_parquet,
)

__all__ = [
    "write_bucketed",
    "bucketed_join",
    "read_table",
    "read_records_json",
    "table_glob",
    "table_pattern",
    "append_tables",
    "no_output",
    "dummy_output",
    "write_iceberg_or_parquet",
]
