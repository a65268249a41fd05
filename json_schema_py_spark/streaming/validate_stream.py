"""Structured-Streaming validation (north-rule scope: continuous ingest).

The rule compiler emits pure Column expressions, so the SAME compiled
ruleset binds to a streaming DataFrame unchanged — validation is a stateless
projection (no watermark needed). Stateful pieces (windowed violation-rate
monitoring with late-data handling) layer on top with event-time watermarks.

At production scale the source is Kafka/Iceberg-CDC; tests use the file
source with Trigger.AvailableNow, which exercises the identical micro-batch
machinery.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from json_schema_py_spark.schema.compiler import compile_ruleset, VIOLATION_TYPE


def validate_stream(stream: DataFrame, schema: Any, key_col: str = "doc_id") -> DataFrame:
    """Streaming violations: (ts?, doc_id, rule_id, path, observed).

    Stateless projection + explode — Spark runs it per micro-batch with the
    same whole-stage-codegen plan as the batch path."""
    v = compile_ruleset(schema, stream.schema)
    base = stream.withColumn("violations", v)
    keep = [c for c in ("ts", key_col) if c in stream.columns]
    return base.select(*keep, F.explode("violations").alias("v")).select(
        *keep,
        F.col("v.rule_id").alias("rule_id"),
        F.col("v.path").alias("path"),
        F.col("v.observed").alias("observed"),
    )


def windowed_violation_counts(
    violations: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-(window, rule_id) violation counts with late-data watermarking —
    the streaming drift monitor. Append-mode safe: windows close once the
    watermark passes."""
    return (
        violations.withColumn(ts_col, F.col(ts_col).cast("timestamp"))  # NTZ → event-time
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("rule_id"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "rule_id",
            "cnt",
        )
    )
