"""Sequence packing: distributed prefix sum == naive global window; exact
window manifests."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

SF = "/root/testdata/sf0.001"


def test_token_spans_match_naive_global_window(spark):
    from json_schema_py_spark.functions.text import token_count
    from json_schema_py_spark.operators.packing import assign_token_spans

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r["doc_id"]: (r["start_tok"], r["first_pack"], r["last_pack"])
        for r in assign_token_spans(docs, max_tokens=256, num_buckets=7).collect()
    }
    # naive single-partition global window (the plan this op avoids)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = (
        docs.select("doc_id", token_count(F.col("text")).alias("n"))
        .withColumn("cum", F.sum("n").over(w))
    )
    for r in naive.collect():
        start = r["cum"] - r["n"]
        assert got[r["doc_id"]] == (start, start // 256, (r["cum"] - 1) // 256), r
    assert len(got) == docs.count()


def test_pack_summary_windows_are_exact(spark):
    from json_schema_py_spark.operators.packing import assign_token_spans, pack_summary

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spans = assign_token_spans(docs, max_tokens=512)
    total_tokens = spans.agg(F.sum("n_tokens")).collect()[0][0]
    packs = pack_summary(spans, max_tokens=512).orderBy("pack_id").collect()
    # windows tile the token stream exactly: all full except the last
    assert sum(p["n_tokens"] for p in packs) == total_tokens
    for p in packs[:-1]:
        assert p["n_tokens"] == 512, p
    assert 0 < packs[-1]["n_tokens"] <= 512
    assert [p["pack_id"] for p in packs] == list(range(len(packs)))


def test_token_spans_string_ids_match_naive_window(spark):
    """String ids (round-2 VERDICT item 9): the order-preserving surrogate
    bucketing reproduces the naive global window ordered LEXICOGRAPHICALLY
    — ids 'd<k>' sort d1 < d10 < d2, a genuinely different order from the
    numeric one, and the corpus-wide 'd' prefix is stripped so the
    surrogate span spreads across buckets."""
    from json_schema_py_spark.functions.text import token_count
    from json_schema_py_spark.operators.packing import assign_token_spans

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.concat(F.lit("d"), F.col("doc_id").cast("string")).alias("doc_id"),
        "text",
    )
    spans = assign_token_spans(docs, max_tokens=256, num_buckets=7)
    got = {
        r["doc_id"]: (r["start_tok"], r["first_pack"], r["last_pack"])
        for r in spans.collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = (
        docs.select("doc_id", token_count(F.col("text")).alias("n"))
        .withColumn("cum", F.sum("n").over(w))
    )
    for r in naive.collect():
        start = r["cum"] - r["n"]
        assert got[r["doc_id"]] == (start, start // 256, (r["cum"] - 1) // 256), r
    assert len(got) == docs.count()


def test_token_spans_unsupported_id_type_rejected(spark):
    import pytest

    from json_schema_py_spark.operators.packing import assign_token_spans

    df = spark.createDataFrame([([1], "x y z")], "doc_id array<int>, text string")
    with pytest.raises(ValueError, match="numeric or string"):
        assign_token_spans(df, max_tokens=10)


def test_select_to_token_budget_matches_naive_and_is_prefix(spark):
    """Greedy quality-first token-budget selection equals the naive global
    window ordered by (quality DESC, id), and the kept set is a strict
    PREFIX of that ordering (no gaps)."""
    from json_schema_py_spark.operators.packing import select_to_token_budget

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = select_to_token_budget(
        docs, budget_tokens=5000, quality_col="n_chars", num_buckets=7
    )
    rows = out.collect()
    assert len(rows) == docs.count()
    from json_schema_py_spark.functions.text import token_count

    naive = (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("double").alias("q"),
            token_count(F.col("text")).alias("n"),
        )
        .withColumn(
            "cum",
            F.sum("n").over(
                Window.orderBy(F.desc("q"), F.asc("doc_id")).rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .collect()
    )
    expect = {r["doc_id"]: (r["n"], r["cum"], r["cum"] <= 5000) for r in naive}
    for r in rows:
        assert (r["n_tokens"], r["cum_tokens"], r["keep"]) == expect[r["doc_id"]], r
    # prefix property: every kept doc outranks every dropped doc
    kept_max = max(r["cum_tokens"] for r in rows if r["keep"])
    assert all(r["cum_tokens"] > kept_max for r in rows if not r["keep"])
