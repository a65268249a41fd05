"""Quality classifier (NB log-odds) — train/score contract tests."""

import math

import pytest
from pyspark.sql import functions as F

from json_schema_py_spark.operators.classifier import (
    score_quality,
    train_nb_classifier,
)

SF = "/root/testdata/sf0.001"


def test_classifier_separates_planted_vocab(spark):
    """Class-distinct vocabularies: every class-1 doc must score positive,
    every class-0 doc negative, and unseen-vocab docs score exactly bias."""
    rows = (
        [(i, "good clean prose text", 1) for i in range(10)]
        + [(i + 10, "spam casino pills buy", 0) for i in range(10)]
        + [(99, "", 1)]  # empty doc -> bias exactly
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w, b = train_nb_classifier(docs)
    scores = {r["doc_id"]: r for r in score_quality(docs, w, b).collect()}
    assert len(scores) == 21
    bias = math.log(11 / 10)
    for i in range(10):
        assert scores[i]["score"] > 0
        assert scores[i + 10]["score"] < 0
        assert scores[i]["matched"] == scores[i]["n_tokens"] == 4
    assert scores[99]["n_tokens"] == 0
    assert scores[99]["matched"] == 0
    assert scores[99]["score"] == pytest.approx(bias, abs=1e-6)


def test_classifier_multinomial_occurrences_exact(spark):
    """Hand-computed arithmetic: occurrences count multiply (a token seen
    twice contributes its weight twice), Laplace smoothing over the UNITED
    vocabulary."""
    docs = spark.createDataFrame(
        [(1, "a a b", 1), (2, "b c", 0)],
        "doc_id long, text string, label int",
    )
    w, b = train_nb_classifier(docs, alpha=1.0)
    wts = {r["token"]: r for r in w.collect()}
    # c1: a=2, b=1; c0: b=1, c=1; T1=3, T0=2, V=3
    assert (wts["a"]["c1"], wts["a"]["c0"]) == (2, 0)
    assert (wts["b"]["c1"], wts["b"]["c0"]) == (1, 1)
    assert (wts["c"]["c1"], wts["c"]["c0"]) == (0, 1)
    w_a = math.log(3 / 6) - math.log(1 / 5)
    w_b = math.log(2 / 6) - math.log(2 / 5)
    assert wts["a"]["weight"] == pytest.approx(w_a, abs=1e-9)
    s = {r["doc_id"]: r["score"] for r in score_quality(docs, w, b).collect()}
    assert s[1] == pytest.approx(round(2 * w_a + w_b + math.log(1.0), 6), abs=1e-6)


def test_classifier_on_documents_lang_split(spark):
    """Real corpus smoke: an English-vs-rest classifier trained on the
    documents table must rank English docs above non-English on average
    (the lang-ID-by-classifier shape)."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            "text",
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
            "lang",
        )
    )
    w, b = train_nb_classifier(docs)
    scored = score_quality(docs, w, b).join(
        docs.select("doc_id", "label"), "doc_id"
    )
    avg = {
        r["label"]: r["avg"]
        for r in scored.groupBy("label").agg(F.avg("score").alias("avg")).collect()
    }
    assert avg[1] > avg[0]


def test_classifier_validation(spark):
    docs = spark.createDataFrame([(1, "x", 1)], "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="alpha"):
        train_nb_classifier(docs, alpha=0.0)


def test_classifier_and_tfidf_collapse_identical_to_direct(spark):
    """Round-7: duplicate-text collapse must reproduce the direct path
    for NB train/score and tf-idf top-k exactly (scores at the gate's
    6-digit rounding), including NULL-text docs."""
    from pyspark.sql import functions as F

    from json_schema_py_spark.operators.classifier import (
        score_quality,
        train_nb_classifier,
    )
    from json_schema_py_spark.operators.keywords import tfidf_top_terms

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    big = docs.crossJoin(spark.range(6).select(F.col("id").alias("_r"))).select(
        (F.col("doc_id") + F.col("_r") * 1000).alias("doc_id"),
        F.when(F.col("doc_id") % 53 == 0, F.lit(None))
        .otherwise(F.col("text"))
        .alias("text"),
        (F.crc32(F.col("text")) % 2 == 0).cast("int").alias("label"),
    )
    w_d, b_d = train_nb_classifier(big, collapse=False)
    w_c, b_c = train_nb_classifier(big, collapse="broadcast")
    a = w_d.select("token", "c1", "c0", F.round("weight", 9).alias("w"))
    b = w_c.select("token", "c1", "c0", F.round("weight", 9).alias("w"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    s_d = score_quality(big, w_d, b_d, collapse=False)
    for mode in ("broadcast", "shuffle"):
        s_c = score_quality(big, w_d, b_d, collapse=mode)
        assert s_c.count() == big.count()
        assert s_d.exceptAll(s_c).count() == 0 and s_c.exceptAll(s_d).count() == 0
    t_d = tfidf_top_terms(big, k=3, min_df=2, collapse=False)
    for mode in ("broadcast", "shuffle"):
        t_c = tfidf_top_terms(big, k=3, min_df=2, collapse=mode)
        assert t_d.exceptAll(t_c).count() == 0 and t_c.exceptAll(t_d).count() == 0
