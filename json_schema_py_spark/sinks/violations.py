"""Violation sinks: partitioned parquet + roll-up summaries.

Violations are written partitioned by ``rule_id``: downstream consumers
(alerting on one rule class, replaying a single code) prune partitions at
the scan instead of filtering 10^12-row outputs. On Iceberg the same layout
is a partition spec; the sandbox uses parquet directory partitioning — the
reader path is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_violations(violations: DataFrame, path: str, mode: str = "append") -> None:
    """(doc_id, rule_id, path, observed) → parquet partitioned by rule_id."""
    violations.write.mode(mode).partitionBy("rule_id").parquet(path)


def read_violations(spark: SparkSession, path: str, rule_id: str | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    if rule_id is not None:
        df = df.where(F.col("rule_id") == rule_id)  # partition-pruned
    return df


def violation_summary(violations: DataFrame) -> DataFrame:
    """(rule_id, n_violations, n_docs, sample_paths) — the report row a
    monitoring table ingests per run."""
    return violations.groupBy("rule_id").agg(
        F.count(F.lit(1)).alias("n_violations"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.slice(F.sort_array(F.collect_set("path")), 1, 5).alias("sample_paths"),
    )
