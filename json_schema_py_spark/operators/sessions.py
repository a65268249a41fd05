"""Event sessionization + order checks (training-pipeline windowed ops).

Window functions partitioned by the entity key: one shuffle on user_id, then
lag/cumulative-sum inside the partition — the standard sessionization plan.
At 10^12 events the shuffle is the cost; it partitions evenly unless a bot
user dominates, which AQE skew handling absorbs (session.py keeps it on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign session ids: a gap > gap_minutes starts a new session.

    Returns the input plus (session_seq, session_id). session_seq is the
    per-user session ordinal (cumulative sum over gap breaks); session_id is
    globally unique as (user_id, session_seq)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # NTZ timestamps can't cast straight to double; hop via TIMESTAMP
    # (session tz is pinned to UTC in session.py, so this is exact)
    gap = F.col(ts_col).cast("timestamp").cast("double") - prev_ts.cast("timestamp").cast("double")
    new_session = F.when(prev_ts.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    seq = F.sum(new_session).over(
        Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("session_seq", seq.cast("long"))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """(user_id, session_seq, n_events, t_start, t_end) per session."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
    )


def out_of_order_events(
    df: DataFrame,
    user_col: str = "user_id",
    seq_col: str = "event_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Events whose timestamp moves backwards relative to the per-user
    sequence order — the cross-row ordering invariant (engine-level cousin of
    the span-sequence order check, BASELINE.json input_hint)."""
    w = Window.partitionBy(user_col).orderBy(seq_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    return (
        df.withColumn("_prev", prev_ts)
        .where(F.col("_prev").isNotNull() & (F.col(ts_col) < F.col("_prev")))
        .drop("_prev")
    )
