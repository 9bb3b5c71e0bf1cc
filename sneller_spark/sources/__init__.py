from .bucketing import bucketed_join, write_bucketed
from .readers import (
    append_tables,
    dummy_output,
    no_output,
    read_table,
    table_glob,
    write_iceberg_or_parquet,
)

__all__ = [
    "write_bucketed",
    "bucketed_join",
    "read_table",
    "table_glob",
    "append_tables",
    "no_output",
    "dummy_output",
    "write_iceberg_or_parquet",
]
