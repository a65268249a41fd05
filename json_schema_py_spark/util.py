"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition when the input has fewer partitions than cores.

    Small/compacted parquet inputs arrive as 1-2 partitions, which serializes
    expression-heavy map stages (hashing, shingling, dot products) onto one
    core. One cheap round-robin shuffle of the raw rows unlocks full
    parallelism; at production scale inputs already have >> cores partitions
    and this is a no-op."""
    if df.isStreaming:
        # no rdd on a streaming frame; micro-batch sizing is the stream's
        # own concern (round-3: validate paths call this and bind to streams)
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
