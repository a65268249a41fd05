#!/usr/bin/env python
"""spark-submit job entry: full validation plan over the interleaved
documents table → violations parquet + per-partition lineage append.

    spark-submit --py-files json_schema_py_spark.zip \
        scripts/run_validation_job.py <sf_dir> <out_dir> [run_id]

Resumable: re-running with the same run_id skips checkpointed partitions.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main(sf_dir: str, out_dir: str, run_id: str = "run-0") -> int:
    spark = SparkSession.builder.appName("jsps-validate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from json_schema_py_spark.plans.checkpoint import LineageLog
    from json_schema_py_spark.plans.validation import run_validation
    from json_schema_py_spark.sources.synth import (
        DOCUMENTS_RULESET,
        MEDIA_DEPENDENCY_RULESET,
        media_dim,
        spans_documents,
    )

    log = LineageLog(spark, f"{out_dir}/lineage")
    sd = log.remaining(spans_documents(spark, sf_dir), run_id)
    run = run_validation(
        sd,
        {"structural": DOCUMENTS_RULESET, "media_dep": MEDIA_DEPENDENCY_RULESET},
        media_dim=media_dim(spark),
        run_id=run_id,
    )
    run.violations.write.mode("append").parquet(f"{out_dir}/violations")
    log.append(run.verdicts)
    n = spark.read.parquet(f"{out_dir}/violations").count()
    print(f"violations so far: {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
