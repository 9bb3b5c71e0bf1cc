"""Streaming execution of the pipeline.

The reference has NO streaming operators — its "streaming" is periodic
batch ingest with an index that dedups inputs
(/root/reference/db/sync.go:79-450); our batch analog of that is
pipeline/runner.py (unit manifests + resume).  This module is the
capability upside: the SAME transform (parse -> enrich -> route) run as
a Structured Streaming job over a file source, with
``foreachBatch`` writing the partitioned fan-out exactly-once per
micro-batch (checkpointed), which is how the pipeline would tail a
landing bucket on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..datagen import TOKENS_SCHEMA
from ..pipeline.runner import transform


def stream_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 4,
):
    """readStream over a directory of tokens parquet -> transform ->
    partitioned fan-out sink via foreachBatch.  Returns the
    StreamingQuery (caller drives with processAllAvailable/stop)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    routed_dir = os.path.join(out_dir, "routed_stream")

    stream = (
        spark.readStream.schema(TOKENS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )

    def sink(batch_df, epoch_id: int) -> None:
        routed = transform(spark, batch_df)
        # epoch-scoped directory => exactly-once under retries (the
        # same epoch overwrites itself, never double-appends)
        routed.write.mode("overwrite").partitionBy("sink_id").parquet(
            os.path.join(routed_dir, f"epoch={epoch_id}")
        )

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )


def stream_pipeline_memory_sink(
    spark: SparkSession,
    input_path: str,
    query_name: str = "routed_stream",
    max_files_per_trigger: int = 4,
):
    """Memory-sink variant for tests: streaming aggregate (per-sink
    running counts) queryable as a temp view while the stream runs."""
    stream = (
        spark.readStream.schema(TOKENS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    routed = transform(spark, stream, passthrough=["doc_id", "source", "n_tok"])
    agg = routed.groupBy("sink_id", "source", "level").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("n_tok").alias("sum_n_tok")
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
