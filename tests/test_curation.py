"""Composed corpus-curation plan: deterministic verdicts, no silent loss."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_curation_reasons_and_row_preservation(spark):
    from json_schema_py_spark.plans.curation import curate_documents

    d = spark.read.parquet(f"{SF}/documents.parquet").where(F.col("doc_id") < 300)
    extra = d.where(F.col("doc_id") < 10).withColumn("doc_id", F.col("doc_id") + 100000)
    src = d.unionByName(extra)
    out = curate_documents(src, min_tokens=30, max_tokens=80)

    assert out.count() == src.count()  # every input doc gets a verdict
    assert out.select("doc_id").distinct().count() == src.count()
    by = {r["reason"]: r["cnt"] for r in out.groupBy("reason").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(by) >= {"kept", "too_short", "too_long", "lang_mismatch", "exact_duplicate"}
    # planted copies that survive quality must drop as exact duplicates of
    # their lower-id originals
    copies = out.where(F.col("doc_id") >= 100000).collect()
    assert all(
        (not r["keep"]) or False for r in copies if r["reason"] == "exact_duplicate"
    )
    assert all(r["keep"] == (r["reason"] == "kept") for r in out.collect())


def test_curation_low_quality_and_determinism(spark):
    from json_schema_py_spark.plans.curation import curate_documents

    rows = [
        (1, "the cat sat on the mat and it is a fine day for everyone involved today"),
        (2, "zx qv wp ls mn op qr st uv wx yz ab cd ef gh ij kl mn op qr"),  # no stopwords
        (3, "the cat sat on the mat and it is a fine day for everyone involved today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["reason"] for r in curate_documents(
        df, min_tokens=3, max_tokens=100, lang=None, min_stopword_ratio=0.05
    ).collect()}
    assert out[1] == "kept"
    assert out[2] == "low_quality"
    assert out[3] == "exact_duplicate"  # identical to doc 1, higher id drops

    again = {r["doc_id"]: r["reason"] for r in curate_documents(
        df, min_tokens=3, max_tokens=100, lang=None, min_stopword_ratio=0.05
    ).collect()}
    assert again == out
