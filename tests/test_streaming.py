"""Structured-Streaming validation: file source, AvailableNow micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def stream_dir(spark, tmp_path):
    """Events-like stream data with planted violations, written as parquet."""
    src = str(tmp_path / "in")
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "ts", "event_type", "value"
    )
    ev.write.parquet(src)
    return src


EVENTS_RULESET = {
    "type": "object",
    "properties": {
        "event_type": {"enum": ["click", "view", "purchase", "signup"]},
        "value": {"type": "number", "minimum": 1.0},
    },
}


def test_stream_validation_matches_batch(spark, stream_dir, tmp_path):
    from json_schema_py_spark.schema.compiler import validate
    from json_schema_py_spark.streaming.validate_stream import validate_stream

    batch_df = spark.read.parquet(stream_dir)
    expected = {
        (r["doc_id"], r["rule_id"], r["path"])
        for r in validate(batch_df, EVENTS_RULESET, key_col="event_id").collect()
    }
    assert expected, "ruleset should flag some events ('error' type, value<1)"

    stream = spark.readStream.schema(batch_df.schema).parquet(stream_dir)
    out = validate_stream(stream, EVENTS_RULESET, key_col="event_id")
    q = (
        out.writeStream.format("memory")
        .queryName("viol_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["rule_id"], r["path"])
        for r in spark.sql("select * from viol_stream").collect()
    }
    assert got == expected


def test_windowed_violation_counts(spark, stream_dir, tmp_path):
    from json_schema_py_spark.streaming.validate_stream import (
        validate_stream,
        windowed_violation_counts,
    )

    batch_df = spark.read.parquet(stream_dir)
    stream = spark.readStream.schema(batch_df.schema).parquet(stream_dir)
    v = validate_stream(stream, EVENTS_RULESET, key_col="event_id")
    w = windowed_violation_counts(v, ts_col="ts", window="1 hour", watermark="2 hours")
    q = (
        w.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from win_counts").collect()
    # append mode only emits closed windows; at least the early ones close
    assert all(r["cnt"] > 0 for r in rows)


def test_variant_path_binds_to_streams(spark, tmp_path):
    """The variant binder is pure Column expressions, so the SAME compiled
    plan validates a STREAM of raw-JSON payloads — AvailableNow micro-batches
    must equal the batch run row-for-row."""
    from json_schema_py_spark.plans.json_variant import validate_json_variant

    src = str(tmp_path / "vin")
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "props")
    ev.write.parquet(src)
    schema = {"type": "object", "additionalProperties": {"type": "integer", "minimum": 50}}

    batch = {
        tuple(r)
        for r in validate_json_variant(ev, "props", schema, key_col="event_id").collect()
    }
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        validate_json_variant(stream, "props", schema, key_col="event_id")
        .writeStream.format("memory")
        .queryName("variant_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "vck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {tuple(r) for r in spark.sql("select * from variant_stream").collect()}
    assert streamed == batch and len(batch) > 0


def test_pii_scan_binds_to_streams(spark, tmp_path):
    """pii_scan is one stateless projection, so the same compiled plan
    scans a STREAM of documents — AvailableNow micro-batches equal the
    batch run row-for-row (the triage path for live ingest)."""
    from pyspark.sql import functions as F

    from json_schema_py_spark.operators.contamination import pii_scan

    src = str(tmp_path / "pin")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(F.col("doc_id") % 5 == 0, F.lit(" mail x@y.io")).otherwise(F.lit("")),
            ).alias("text"),
        )
    )
    docs.write.parquet(src)
    batch = {tuple(r) for r in pii_scan(docs).collect()}
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        pii_scan(stream)
        .writeStream.format("memory")
        .queryName("pii_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "pck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {tuple(r) for r in spark.sql("select * from pii_stream").collect()}
    assert streamed == batch and any(r[1] > 0 for r in batch)
