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


def _rank_snapshots(h):
    """_ts_rank = 1 for each column's newest snapshot rows, 2 for the next,
    … (dense over ts so one snapshot's nbins rows share a rank) — the ONE
    snapshot-identity rule shared by latest_baselines and prune."""
    w = Window.partitionBy("column").orderBy(F.desc("ts"))
    return h.withColumn("_ts_rank", F.dense_rank().over(w))


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
        latest = _rank_snapshots(h).where(F.col("_ts_rank") == 1).drop("_ts_rank")
        cols = [r["column"] for r in latest.select("column").distinct().collect()]
        return {
            c: latest.where(F.col("column") == c).select("bucket", "cnt")
            for c in cols
            if c in self.bounds
        }

    def prune(self, older_than_ts: float, keep_newest: int = 2) -> int:
        """Retention: drop snapshots with ts < ``older_than_ts``; returns
        rows removed. For every column STILL WATCHED (in ``bounds``) the
        ``keep_newest`` most recent snapshots survive regardless of the
        cutoff (default 2: the current snapshot AND the previous one —
        an idempotent re-run calls latest_baselines(exclude_run=own) and
        must still find a baseline after its own append, review r04c).
        Columns no longer in bounds (dropped from the watch list, or an
        old bucket-grid epoch) age out by the cutoff alone. keep_newest=0
        prunes unconditionally.

        Sandbox storage is a plain parquet dir, so prune rewrites it
        (read → filter → write-temp → swap, old dir set ASIDE first so a
        crash mid-swap strands a recoverable copy instead of losing the
        log); bounded at columns × nbins rows per run — driver-trivial.
        On Iceberg this is a metadata DELETE instead."""
        import shutil

        h = _rank_snapshots(self.read())
        keep_cond = F.col("ts") >= older_than_ts
        if keep_newest > 0:
            keep_cond = keep_cond | (
                F.col("column").isin(list(self.bounds))
                & (F.col("_ts_rank") <= keep_newest)
            )
        counts = h.agg(
            F.count(F.lit(1)).alias("before"),
            F.sum(keep_cond.cast("long")).alias("after"),
        ).collect()[0]
        removed = int(counts["before"] - (counts["after"] or 0))
        if removed == 0:
            return 0
        kept = h.where(keep_cond).drop("_ts_rank")
        tmp = self.path + ".pruning"
        old = self.path + ".pruned-old"
        kept.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        shutil.move(self.path, old)   # aside, not gone: crash-recoverable
        shutil.move(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
        return removed
