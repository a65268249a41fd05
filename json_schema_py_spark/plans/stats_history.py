"""Run-over-run statistics history: the operational drift loop.

``run_validation`` takes drift baselines as an argument; production runs
don't hand-carry histograms — they compare against WHAT THE LAST RUN SAW.
This module closes that loop with an append-only histogram log (same
storage doctrine as plans/checkpoint.LineageLog: parquet directory in the
sandbox, an Iceberg table in production, identical read-side logic):

    log = HistogramLog(spark, path, bounds={"n_chars": (0.0, 600.0, 12)})
    baselines = log.latest_baselines(exclude_run=run_id)   # {} on first run
    run = run_validation(df, rulesets, drift_baselines=baselines,
                         drift_histogram=None per-column bounds from log, ...)
    log.append(df, run_id)                                  # this run becomes
                                                            # the next baseline

Every run appends one nbins-row histogram per watched column (bounded:
columns × nbins rows per run); the newest PREVIOUS run is the baseline, so
drift always means "vs the last accepted snapshot", and retention is a
plain ts cutoff on the log.
"""

from __future__ import annotations

import os
import time
from typing import Mapping

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_schema_py_spark.operators.drift import histogram

HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("ts", T.DoubleType()),
    ]
)


class HistogramLog:
    """Append-only per-run histogram snapshots with latest-previous lookup.

    ``bounds``: {column: (lo, hi, nbins)} — FIXED bucket bounds per column
    (comparability across runs requires identical bucketing; changing the
    bounds starts a new comparison epoch — old snapshots simply stop
    matching the bucket grid and should be aged out)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        bounds: Mapping[str, tuple[float, float, int]],
    ):
        if not bounds:
            raise ValueError("HistogramLog needs at least one watched column in bounds")
        self.spark = spark
        self.path = path
        self.bounds = dict(bounds)

    def append(self, df: DataFrame, run_id: str) -> None:
        """Snapshot every watched column's histogram for ``run_id``."""
        ts = time.time()
        parts = []
        for col, (lo, hi, nbins) in self.bounds.items():
            parts.append(
                histogram(df, col, lo, hi, nbins).select(
                    F.lit(run_id).alias("run_id"),
                    F.lit(col).alias("column"),
                    F.col("bucket"),
                    F.col("cnt"),
                    F.lit(ts).alias("ts"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("append").parquet(self.path)

    def read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], HISTORY_SCHEMA)
        return self.spark.read.schema(HISTORY_SCHEMA).parquet(self.path)

    def latest_baselines(
        self, exclude_run: str | None = None
    ) -> dict[str, DataFrame]:
        """{column: (bucket, cnt) histogram} from the NEWEST snapshot per
        column (optionally excluding the current run's own appends — an
        idempotent re-run must not use itself as its baseline). Empty dict
        when no history exists yet: the caller's first run simply has no
        drift check, which is the only honest answer."""
        h = self.read()
        if exclude_run is not None:
            h = h.where(F.col("run_id") != exclude_run)
        latest = (
            h.withColumn("_max_ts", F.max("ts").over(Window.partitionBy("column")))
            .where(F.col("ts") == F.col("_max_ts"))
            .drop("_max_ts")
        )
        cols = [r["column"] for r in latest.select("column").distinct().collect()]
        return {
            c: latest.where(F.col("column") == c).select("bucket", "cnt")
            for c in cols
            if c in self.bounds
        }

    def prune(self, older_than_ts: float, keep_latest_per_column: bool = True) -> int:
        """Retention: drop snapshots with ts < ``older_than_ts``; returns
        rows removed. ``keep_latest_per_column`` (default) always retains
        each column's newest snapshot even if it predates the cutoff —
        pruning must never delete the only baseline the drift loop has.

        Sandbox storage is a plain parquet dir, so prune rewrites it
        (read → filter → write-temp → swap); the log is bounded
        (columns × nbins rows per run), so the rewrite is driver-trivial.
        On Iceberg this is a metadata DELETE instead."""
        import shutil

        h = self.read()
        latest = h.withColumn(
            "_max_ts", F.max("ts").over(Window.partitionBy("column"))
        )
        keep_cond = F.col("ts") >= older_than_ts
        if keep_latest_per_column:
            keep_cond = keep_cond | (F.col("ts") == F.col("_max_ts"))
        kept = latest.where(keep_cond).drop("_max_ts")
        n_before = h.count()
        n_after = kept.count()
        if n_after == n_before:
            return 0
        tmp = self.path + ".pruning"
        kept.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self.path)
        shutil.move(tmp, self.path)
        return n_before - n_after
