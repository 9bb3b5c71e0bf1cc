"""spark-submit entry point for the pipeline.

Usage (matches how the job ships to a real cluster — the package goes
as --py-files, not as a working-directory import):

    python tools/make_pyfiles_zip.py                 # -> dist/sneller_spark.zip
    spark-submit --master local[8] \
        --py-files dist/sneller_spark.zip \
        tools/submit_pipeline.py <input_dir> <out_dir> [--resume]

Runs (or resumes) the parse -> enrich -> route -> aggregate pipeline
over <input_dir> and prints the ExecStats summary as one JSON line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    input_dir, out_dir = args[0], args[1]

    spark = (
        SparkSession.builder.appName("sneller_spark_pipeline")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    # package arrives via --py-files; import AFTER session creation
    from sneller_spark.pipeline.runner import read_aggregates, run_pipeline

    stats = run_pipeline(spark, input_dir, out_dir, resume=True)
    stats["n_agg_groups"] = read_aggregates(spark, out_dir).count()
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
