"""Substring-level dedup (hot n-gram span removal) — contract tests."""

import pytest
from pyspark.sql import functions as F

from json_schema_py_spark.operators.substring import (
    duplicate_ngram_spans,
    hot_ngrams,
    strip_duplicate_ngrams,
)

BANNER = "alpha beta gamma delta"  # 4 tokens


def _corpus(spark):
    rows = [
        (0, f"unique zero text {BANNER} tail zero"),
        (1, f"other one body {BANNER} trailing words here"),
        (2, f"{BANNER} {BANNER} doubled up"),  # self-repetition
        (3, "completely unrelated document body"),
        (4, "tiny"),  # fewer than k tokens -> no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_ngrams_counts_occurrences(spark):
    docs = _corpus(spark)
    hot = {(r["ngram"], r["cnt"]) for r in hot_ngrams(docs, k=4, min_count=3).collect()}
    # the banner occurs 4 times (docs 0, 1, and twice in doc 2)
    assert (BANNER, 4) in hot
    # nothing else reaches 3 occurrences
    assert all(ng == BANNER for ng, _ in hot)
    with pytest.raises(ValueError, match="min_count"):
        hot_ngrams(docs, min_count=1)
    with pytest.raises(ValueError, match="k must"):
        hot_ngrams(docs, k=0)


def test_duplicate_spans_positions(spark):
    docs = _corpus(spark)
    hot = hot_ngrams(docs, k=4, min_count=3)
    spans = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in duplicate_ngram_spans(docs, hot, k=4).collect()
    }
    # 0-based token positions, half-open [start, end)
    assert spans == {(0, 3, 7), (1, 3, 7), (2, 0, 4), (2, 4, 8)}


def test_strip_removes_all_occurrences(spark):
    docs = _corpus(spark)
    hot = hot_ngrams(docs, k=4, min_count=3)
    out = {r["doc_id"]: r for r in strip_duplicate_ngrams(docs, hot, k=4).collect()}
    assert len(out) == 5  # every doc survives, stripped or not
    assert out[0]["clean_text"] == "unique zero text tail zero"
    assert out[1]["clean_text"] == "other one body trailing words here"
    assert out[2]["clean_text"] == "doubled up"  # both copies removed
    assert out[3]["clean_text"] == "completely unrelated document body"
    assert out[4]["clean_text"] == "tiny"
    assert (out[2]["n_tokens"], out[2]["n_removed"]) == (10, 8)
    assert out[3]["n_removed"] == 0


def test_strip_overlapping_hot_shingles_union(spark):
    """Overlapping hot shingles cover a contiguous span once — removed
    token count is the UNION of covered indices, not the sum."""
    long = "w0 w1 w2 w3 w4 w5"
    docs = spark.createDataFrame(
        [(i, long) for i in range(3)] + [(9, "solo body")],
        "doc_id long, text string",
    )
    hot = hot_ngrams(docs, k=4, min_count=3)
    # shingles w0..w3, w1..w4, w2..w5 are each hot (3 occurrences)
    assert hot.count() == 3
    out = {r["doc_id"]: r for r in strip_duplicate_ngrams(docs, hot, k=4).collect()}
    for i in range(3):
        assert out[i]["clean_text"] == ""
        assert out[i]["n_removed"] == 6  # union of three overlapping spans
    assert out[9]["clean_text"] == "solo body"


def test_hot_lines_doc_counts_trim_and_exemption(spark):
    """Line tier: hot = trimmed line in >= min_docs DISTINCT docs; in-doc
    repeats don't inflate the count; short/empty lines exempt."""
    import pytest

    from json_schema_py_spark.operators.substring import hot_lines

    docs = spark.createDataFrame(
        [
            (1, "footer text\nbody one\nfooter text"),   # footer twice IN-doc
            (2, "  footer text  \nbody two"),            # trims to same line
            (3, "body three\n\nbody three tail"),
            (4, "\n\n"),                                 # only empty lines
        ],
        "doc_id long, text string",
    )
    hot = {r["line"]: r["n_docs"] for r in hot_lines(docs, min_docs=2).collect()}
    assert hot == {"footer text": 2}  # docs 1+2; in-doc repeat not counted
    with pytest.raises(ValueError, match="min_docs"):
        hot_lines(docs, min_docs=1)
    with pytest.raises(ValueError, match="min_line_chars"):
        hot_lines(docs, min_line_chars=0)


def test_strip_boilerplate_lines_preserves_bytes_and_order(spark):
    from json_schema_py_spark.operators.substring import (
        hot_lines,
        strip_boilerplate_lines,
    )

    docs = spark.createDataFrame(
        [
            (1, "NAV\nreal body a\n  NAV  \ntail a"),
            (2, "NAV\nreal body b"),
            (3, "no boilerplate here"),
        ],
        "doc_id long, text string",
    )
    hot = hot_lines(docs, min_docs=2)
    out = {r["doc_id"]: r for r in strip_boilerplate_lines(docs, hot).collect()}
    # both NAV occurrences in doc 1 stripped (raw '  NAV  ' matched via trim);
    # survivors keep original bytes and order
    assert out[1]["clean_text"] == "real body a\ntail a"
    assert out[1]["n_lines"] == 4 and out[1]["n_removed_lines"] == 2
    assert out[2]["clean_text"] == "real body b"
    assert out[3]["clean_text"] == "no boilerplate here"
    assert out[3]["n_removed_lines"] == 0
    # a doc that is ALL boilerplate survives with empty clean_text
    all_nav = spark.createDataFrame([(9, "NAV"), (8, "NAV")], "doc_id long, text string")
    hot2 = hot_lines(all_nav, min_docs=2)
    row = {r["doc_id"]: r for r in strip_boilerplate_lines(all_nav, hot2).collect()}
    assert row[9]["clean_text"] == "" and row[9]["n_removed_lines"] == 1


def test_substring_collapse_identical_to_direct(spark):
    """Round-7: hot_ngrams multiplicity-weighted counting and the
    per-distinct-text strip must be row-identical to the direct path on
    a replicated corpus, including NULL-text docs."""
    from pyspark.sql import functions as F

    from json_schema_py_spark.operators.substring import (
        hot_ngrams,
        strip_duplicate_ngrams,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    big = docs.crossJoin(spark.range(6).select(F.col("id").alias("_r"))).select(
        (F.col("doc_id") + F.col("_r") * 1000).alias("doc_id"),
        F.when(F.col("doc_id") % 47 == 0, F.lit(None))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    h_d = hot_ngrams(big, k=3, min_count=6, collapse=False)
    h_c = hot_ngrams(big, k=3, min_count=6, collapse="broadcast")
    assert h_d.exceptAll(h_c).count() == 0 and h_c.exceptAll(h_d).count() == 0
    hot = h_d
    s_d = strip_duplicate_ngrams(big, hot, k=3, collapse=False)
    for mode in ("broadcast", "shuffle"):
        s_c = strip_duplicate_ngrams(big, hot, k=3, collapse=mode)
        assert s_c.count() == big.count()
        assert s_d.exceptAll(s_c).count() == 0 and s_c.exceptAll(s_d).count() == 0
