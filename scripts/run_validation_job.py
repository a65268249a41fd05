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
    # durable partition identity: the input file path survives re-planning
    # (a resumed run under different core counts / maxPartitionBytes still
    # skips exactly the completed files — plans/checkpoint.py)
    full = spans_documents(spark, sf_dir, include_source_file=True)
    sd = log.remaining(full, run_id, partition_key="_source_file")

    # per-row rulesets: checkpointable per partition (row-local work)
    run = run_validation(
        sd,
        {"structural": DOCUMENTS_RULESET, "media_dep": MEDIA_DEPENDENCY_RULESET},
        unique_key=None,
        media_dim=None,
        run_id=run_id,
        partition_key="_source_file",
    )
    run.violations.write.mode("append").parquet(f"{out_dir}/violations")
    log.append(run.verdicts)

    # cross-row checks (uniqueness, FK): only meaningful over the FULL table
    # — a resumed remainder can't see duplicates spanning completed data, so
    # these re-run table-wide every attempt and overwrite their own output
    from json_schema_py_spark.operators.referential import spans_fk_violations
    from json_schema_py_spark.operators.uniqueness import uniqueness_violations

    cross = uniqueness_violations(full, "doc_id").unionByName(
        spans_fk_violations(full, media_dim(spark))
    )
    cross.write.mode("overwrite").parquet(f"{out_dir}/violations_cross")

    # distribution drift vs the LAST run's snapshot (plans/stats_history):
    # full-table like the other cross-row checks; a retried run_id never
    # baselines against its own appends
    from pyspark.sql import functions as F

    from json_schema_py_spark.operators.drift import psi_drift_violation
    from json_schema_py_spark.plans.stats_history import HistogramLog

    bounds = {"n_spans": (0.0, 10.0, 10)}
    hlog = HistogramLog(spark, f"{out_dir}/stats_history", bounds)
    watched = full.withColumn("n_spans", F.size("spans"))
    drift_rows = 0
    baselines = hlog.latest_baselines(exclude_run=run_id)
    if baselines:
        from json_schema_py_spark.operators.drift import histogram

        drifts = [
            psi_drift_violation(
                histogram(watched, col, *bounds[col]), base, column=col
            )
            for col, base in baselines.items()
        ]
        d = drifts[0]
        for x in drifts[1:]:
            d = d.unionByName(x)
        d.write.mode("overwrite").parquet(f"{out_dir}/violations_drift")
        drift_rows = spark.read.parquet(f"{out_dir}/violations_drift").count()
    hlog.append(watched, run_id)

    n = spark.read.parquet(f"{out_dir}/violations").count()
    nc = spark.read.parquet(f"{out_dir}/violations_cross").count()
    print(f"violations so far: {n} per-row + {nc} cross-row + {drift_rows} drift")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
