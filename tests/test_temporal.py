"""Temporal operators: as-of join, interval join, multi-granularity
rollup — each checked against a naive Python/DataFrame recomputation."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_as_of_join_matches_naive(spark):
    from json_schema_py_spark.operators.temporal import as_of_join

    ev = spark.read.parquet(f"{SF}/events.parquet")
    left = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "value"
    )
    got = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"])
        for r in as_of_join(left, right, ["user_id"]).collect()
    }
    # naive: for each click, the latest error at-or-before it per user
    errors: dict[int, list] = {}
    for r in right.collect():
        errors.setdefault(r["user_id"], []).append(r)
    naive = {}
    for r in left.collect():
        cands = [e for e in errors.get(r["user_id"], []) if e["ts"] <= r["ts"]]
        best = max(cands, key=lambda e: e["ts"]) if cands else None
        naive[r["event_id"]] = (
            (best["event_id"], best["value"]) if best else (None, None)
        )
    assert got == naive
    assert len(got) == left.count()  # every left row exactly once
    # some rows must actually have matches AND some must not, or the
    # fixture proves nothing
    assert any(v[0] is not None for v in got.values())
    assert any(v[0] is None for v in got.values())


def test_as_of_join_tolerance_and_exact_ts(spark):
    from json_schema_py_spark.operators.temporal import as_of_join

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, "k", t0), (2, "k", t0 + timedelta(seconds=100))],
        "lid long, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, "k", t0, 1.0), (11, "k", t0 + timedelta(seconds=5), 2.0)],
        "rid long, key string, ts timestamp, v double",
    )
    got = {
        r["lid"]: r["asof_rid"]
        for r in as_of_join(left, right, ["key"]).collect()
    }
    # right row at EXACTLY the left ts matches (<= semantics)
    assert got == {1: 10, 2: 11}
    tol = {
        r["lid"]: r["asof_rid"]
        for r in as_of_join(left, right, ["key"], tolerance_seconds=30).collect()
    }
    # lid=2's match is 95 s old -> nulled by the 30 s tolerance
    assert tol == {1: 10, 2: None}


def test_interval_join_matches_naive_and_audits(spark):
    from json_schema_py_spark.operators.temporal import (
        interval_join,
        interval_join_oversized,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("interval_id"),
        F.col("user_id"),
        (F.col("ts") - F.expr("INTERVAL 5 MINUTES")).alias("start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    got = {
        (r["interval_id"], r["event_id"])
        for r in interval_join(
            clicks, purchases, key_cols=["user_id"], bucket_seconds=600
        ).collect()
    }
    naive = {
        (r["interval_id"], r["event_id"])
        for r in clicks.join(purchases, "user_id")
        .where((F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
        .collect()
    }
    assert got == naive and len(naive) > 0
    # cap + audit: with 1-second buckets every 10-minute interval is 600
    # buckets -> a cap of 100 excludes ALL of them, and the audit reports
    # exactly those
    capped = interval_join(
        clicks, purchases, key_cols=["user_id"],
        bucket_seconds=1, max_buckets_per_interval=100,
    )
    assert capped.count() == 0
    audited = interval_join_oversized(
        purchases, bucket_seconds=1, max_buckets_per_interval=100
    )
    assert audited.count() == purchases.count()


def test_time_rollup_one_pass_matches_per_granularity_groupbys(spark):
    from json_schema_py_spark.operators.temporal import time_rollup

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        (r["granularity"], r["bucket_start"]): (r["n"], round(r["sum"], 6))
        for r in time_rollup(ev, "ts", "value", ("hour", "day")).collect()
    }
    for g in ("hour", "day"):
        naive = {
            (g, r["b"]): (r["n"], round(r["s"], 6))
            for r in ev.groupBy(F.date_trunc(g, "ts").alias("b"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        sub = {k: v for k, v in got.items() if k[0] == g}
        assert sub == naive
    with pytest.raises(ValueError, match="granularity"):
        time_rollup(ev, granularities=("hour", "fortnight"))
    with pytest.raises(ValueError, match="distinct"):
        time_rollup(ev, granularities=("hour", "hour"))


def test_time_rollup_null_ts_not_misattributed(spark):
    """A NULL-timestamp group stays its own NULL-bucket row per
    granularity — the grouping_id set identity, not bucket-NULL
    sniffing."""
    from json_schema_py_spark.operators.temporal import time_rollup

    df = spark.createDataFrame(
        [(datetime(2026, 1, 2, 3, 30), 1.0), (None, 5.0), (None, 7.0)],
        "ts timestamp, value double",
    )
    rows = time_rollup(df, "ts", "value", ("hour", "day")).collect()
    nulls = [(r["granularity"], r["n"], r["sum"]) for r in rows if r["bucket_start"] is None]
    assert sorted(nulls) == [("day", 2, 12.0), ("hour", 2, 12.0)]
    assert len(rows) == 4  # one real bucket + one NULL bucket per granularity


def test_temporal_plan_shapes(spark):
    """Scale shapes: as_of_join = ONE key exchange (the window), never a
    join node; interval_join = equi-join, never a cartesian product;
    time_rollup = ONE aggregate pass (Expand + partial/final), not one
    scan per granularity."""
    from json_schema_py_spark.operators.temporal import (
        as_of_join,
        interval_join,
        time_rollup,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    left = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "value"
    )
    p1 = as_of_join(left, right, ["user_id"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p1 and "CartesianProduct" not in p1
    assert p1.count("Exchange hashpartitioning") == 1  # the window's only

    iv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("interval_id"), "user_id",
        (F.col("ts") - F.expr("INTERVAL 5 MINUTES")).alias("start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end"),
    )
    p2 = (
        interval_join(left, iv, key_cols=["user_id"], bucket_seconds=600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in p2 and "BroadcastNestedLoop" not in p2

    p3 = time_rollup(ev, "ts", "value", ("hour", "day"))._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in p3                       # grouping sets, one pass
    assert p3.count("Scan parquet") == 1        # not one scan per granularity


def test_as_of_join_null_right_ts_never_matches(spark):
    """Review r05: a NULL-timestamp right row sorts NULLS FIRST and was
    carried as the 'most recent' match for left rows with no genuine
    predecessor — it must never match (NULL <= ts is not true)."""
    from json_schema_py_spark.operators.temporal import as_of_join

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, "k", t0)], "lid long, key string, ts timestamp")
    right = spark.createDataFrame(
        [(10, "k", None, 1.0), (11, "k", t0 + timedelta(seconds=5), 2.0)],
        "rid long, key string, ts timestamp, v double",
    )
    got = as_of_join(left, right, ["key"]).collect()
    assert [(r["lid"], r["asof_rid"]) for r in got] == [(1, None)]


def test_as_of_join_tolerance_rejects_ts_in_keys(spark):
    """ADVICE r05: with tolerance, right_ts must not be a key column —
    the matched-row timestamp lives in the payload, which excludes keys.
    Fail loudly instead of an AnalysisException deep in the select."""
    from json_schema_py_spark.operators.temporal import as_of_join

    l = spark.createDataFrame([(1, 1.0)], "k int, ts double")
    r = spark.createDataFrame([(1, 1.0, "x")], "k int, ts double, v string")
    with pytest.raises(ValueError, match="key column"):
        as_of_join(l, r, ["k", "ts"], tolerance_seconds=5.0)
    # without tolerance the same key set is legal (payload never read back)
    out = as_of_join(l, r, ["k", "ts"]).collect()
    assert len(out) == 1 and out[0]["asof_v"] == "x"


def test_as_of_join_map_payload_is_orderable(spark):
    """ADVICE r05: a map-typed right payload column used to break the
    tie-break ordering (maps are unorderable) — now it orders by its
    to_json form and the join still works."""
    from json_schema_py_spark.operators.temporal import as_of_join

    l = spark.createDataFrame([(1, 10.0)], "k int, ts double")
    r = (
        spark.createDataFrame([(1, 5.0, "a", 1), (1, 5.0, "b", 2)],
                              "k int, ts double, mk string, mv int")
        .select("k", "ts", F.create_map("mk", "mv").alias("m"))
    )
    out = as_of_join(l, r, ["k"]).collect()
    assert len(out) == 1
    # ties at ts=5.0 resolve content-deterministically: the LAST row in
    # to_json order ({"a":1} < {"b":2}) is carried
    assert out[0]["asof_m"] == {"b": 2}


def test_interval_join_invalid_audit(spark):
    """ADVICE r05: invalid intervals (start > end, NULL endpoint) are
    excluded from the join but never silently — the invalid audit holds
    exactly them, and together with the oversized audit every input
    interval is accounted for."""
    from json_schema_py_spark.operators.temporal import (
        interval_join,
        interval_join_invalid,
        interval_join_oversized,
    )

    t0 = datetime(2024, 1, 1)
    iv = spark.createDataFrame(
        [
            ("ok", t0, t0 + timedelta(hours=1)),
            ("backwards", t0 + timedelta(hours=2), t0),
            ("null_end", t0, None),
            ("huge", t0, t0 + timedelta(days=5000)),
        ],
        "interval_id string, start timestamp, end timestamp",
    )
    ev = spark.createDataFrame(
        [("e1", t0 + timedelta(minutes=30))], "event_id string, ts timestamp"
    )
    joined = interval_join(ev, iv, max_buckets_per_interval=10_000)
    assert {r["interval_id"] for r in joined.collect()} == {"ok"}
    invalid = {r["interval_id"] for r in interval_join_invalid(iv).collect()}
    assert invalid == {"backwards", "null_end"}
    oversized = {
        r["interval_id"]
        for r in interval_join_oversized(iv, max_buckets_per_interval=10_000).collect()
    }
    assert oversized == {"huge"}
    # full accounting: joined-eligible + invalid + oversized = all inputs
    assert invalid | oversized | {"ok"} == {
        r["interval_id"] for r in iv.collect()
    }
