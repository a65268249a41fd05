"""Per-partition lineage / checkpoint-resume (north rule).

The reference is single-process with no restart story; at 10^12 documents a
validation run WILL be preempted, so verdict rows are appended to a lineage
table keyed (run_id, partition_id) and a restart anti-joins completed
partitions away. Exactly-once semantics under retry come from
last-writer-wins dedup on read: duplicate (run_id, partition_id) appends are
collapsed by a window over ``ts`` — idempotent re-runs.

Sandbox storage is an append-only parquet directory; on a real cluster the
same API binds to an Iceberg table (append snapshot per batch) — the
read-side dedup logic is identical.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("pass", T.BooleanType()),
        T.StructField("docs", T.LongType()),
        T.StructField("violations", T.LongType()),
        T.StructField("ts", T.DoubleType()),
        T.StructField("attempt", T.StringType()),
    ]
)


class LineageLog:
    """Append-only lineage/metrics log with resume support."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def append(self, verdicts: DataFrame) -> None:
        """Append verdict rows (run_id, partition_id, pass, docs, violations)."""
        stamped = verdicts.select(
            "run_id",
            F.col("partition_id").cast("int"),
            "pass",
            F.col("docs").cast("long"),
            F.col("violations").cast("long"),
            F.lit(time.time()).alias("ts"),
            F.lit(uuid.uuid4().hex).alias("attempt"),
        )
        stamped.write.mode("append").parquet(self.path)

    def read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)

    def completed(self, run_id: str) -> DataFrame:
        """Latest verdict per partition for a run (last-writer-wins dedup —
        retried partitions count once)."""
        w = Window.partitionBy("run_id", "partition_id").orderBy(F.desc("ts"))
        return (
            self.read()
            .where(F.col("run_id") == run_id)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def remaining(self, df: DataFrame, run_id: str) -> DataFrame:
        """Rows of ``df`` whose partition has NOT been checkpointed yet for
        ``run_id`` — a broadcast anti-join on partition id; resumed runs skip
        completed partitions without re-reading their data (with Iceberg
        partition values the skip becomes partition PRUNING at the scan)."""
        done = self.completed(run_id).select("partition_id")
        tagged = df.withColumn("_pid", F.spark_partition_id())
        return (
            tagged.join(
                F.broadcast(done.withColumnRenamed("partition_id", "_pid")),
                "_pid",
                "left_anti",
            ).drop("_pid")
        )
