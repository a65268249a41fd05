"""SparkSession factory tuned for the validation workload.

Local-mode defaults stand in for cluster settings; on a real cluster the same
builder is used by ``spark-submit --py-files`` with master/memory supplied
externally. AQE + skew-join stay on in both: the uniqueness / referential
anti-joins rely on them for hot doc_id ranges (north rule).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "json-schema-py-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) else 32.
    Shuffle partitions default to 2x cores: small enough that sf0.1-scale
    partitions stay cache-resident, large enough that AQE can coalesce
    rather than split. On a 1000-executor cluster the same ratio is applied
    to total cores by the submitter.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    n_shuffle = shuffle_partitions or max(2 * int(cpus), 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local-bench scan parallelism: the synthetic corpora compress to a
        # few hundred MB, and the 128MB default yields fewer splits than
        # cores. 4MB keeps every core fed locally; a real-cluster submit
        # overrides via SPARK_MAX_PARTITION_BYTES (at 100TB the default is
        # right — thousands of natural splits)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # bucketed-table demos (co-located joins) land outside the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/jsps_warehouse"),
        )
    )
    return builder.getOrCreate()
