"""Sources & sinks — the Spark analogs of the reference's format
converters and table operators (SURVEY.md §2.1).

  * read_table       — suffix-dispatched reader (json/ndjson/csv/tsv/
                       parquet), the analog of the converter registry
                       (/root/reference/ion/blockfmt/convert.go:251-370)
  * table_glob       — TABLE_GLOB/TABLE_PATTERN union scan
                       (/root/reference/plan/multi.go:66-157)
  * append_tables    — `++` table append
                       (/root/reference/expr/node.go:2561-2600)
  * no_output /
    dummy_output     — zero-row / single-empty-row sources
                       (/root/reference/plan/plan.go:533-587)
  * write_iceberg_or_parquet — Iceberg table sink when the runtime jar
                       is present, partitioned parquet otherwise
                       (OutputPart/OutputIndex analog,
                       /root/reference/plan/output.go:142-182)
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SUFFIXES = {
    ".parquet": "parquet",
    ".json": "json",
    ".ndjson": "json",
    ".jsonl": "json",
    ".csv": "csv",
    ".tsv": "tsv",
    ".orc": "orc",
}


def read_table(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Read a file/directory, dispatching on suffix like the reference's
    converter registry.  JSON is read as NDJSON (one record per line —
    the reference's jsonrl format); CSV/TSV assume a header row."""
    suffix = os.path.splitext(path.rstrip("/"))[1].lower()
    fmt = _SUFFIXES.get(suffix, "parquet")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "json":
        return reader.json(path)
    if fmt == "csv":
        return reader.option("header", True).csv(path) if schema is None else reader.csv(path, header=True)
    if fmt == "tsv":
        return reader.option("header", True).option("sep", "\t").csv(path)
    if fmt == "orc":
        return reader.orc(path)
    return reader.parquet(path)


def table_glob(spark: SparkSession, pattern: str, schema: T.StructType | None = None) -> DataFrame:
    """TABLE_GLOB: union-scan every table matching a filesystem glob,
    by name (missing columns allowed — the schemaless union the
    reference performs across heterogeneous tables)."""
    paths = sorted(_glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(f"TABLE_GLOB matched nothing: {pattern}")
    out: DataFrame | None = None
    for p in paths:
        df = read_table(spark, p, schema)
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    return out


def table_pattern(
    spark: SparkSession,
    directory: str,
    pattern: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """TABLE_PATTERN: union-scan every table in `directory` whose NAME
    (filename sans format suffix) fully matches the regex — the
    reference lists the db's tables and regex-filters them
    (/root/reference/plan/multi.go:73-103, expr/builtin.go:233).
    Schemas are reconciled by name, like table_glob; no match is an
    error (fs.ErrNotExist in the reference)."""
    import re as _re

    rx = _re.compile(pattern)
    matched: list[str] = []
    for fname in sorted(os.listdir(directory)):
        stem, suffix = os.path.splitext(fname)
        if suffix.lower() not in _SUFFIXES:
            continue
        if rx.fullmatch(stem):
            matched.append(os.path.join(directory, fname))
    if not matched:
        raise FileNotFoundError(f"TABLE_PATTERN matched nothing: {pattern!r} in {directory}")
    out: DataFrame | None = None
    for p in matched:
        df = read_table(spark, p, schema)
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    return out


def append_tables(*dfs: DataFrame) -> DataFrame:
    """`++` append: bag-union of tables, reconciling schemas by name."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def read_records_json(
    spark: SparkSession, path: str, records_field: str = "Records"
) -> DataFrame:
    """CloudTrail-style converter (/root/reference/jsonrl/cloudtrail.go:36):
    files shaped {"Records": [obj, obj, ...]} are flattened so each
    element of the top-level array becomes one row.  Spark's multiLine
    JSON reader + explode + struct-expansion — schema inferred across
    all records."""
    from pyspark.sql import functions as F

    raw = spark.read.option("multiLine", True).json(path)
    if records_field not in raw.columns:
        raise ValueError(f"no top-level {records_field!r} array in {path}")
    rec = raw.select(F.explode(records_field).alias("_r"))
    return rec.select("_r.*")


def no_output(spark: SparkSession, schema: str = "x int") -> DataFrame:
    """NoOutput: a zero-row source with a declared schema."""
    return spark.createDataFrame([], schema)


def dummy_output(spark: SparkSession) -> DataFrame:
    """DummyOutput: the single-empty-row source that makes
    `SELECT 3` work."""
    return spark.range(1).drop("id")


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_iceberg_or_parquet(
    df: DataFrame, target: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> str:
    """Sink: Iceberg `writeTo(...)` when the runtime is on the
    classpath (real clusters), partitioned parquet locally (this
    sandbox ships no Iceberg jar).  Returns the format used."""
    spark = df.sparkSession
    if "/" not in target and iceberg_available(spark):
        writer = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        (writer.createOrReplace() if mode == "overwrite" else writer.append())
        return "iceberg"
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
    return "parquet"
