"""DSIR importance resampling (round-6): hand-math weight verification,
zero-feature docs, deterministic Gumbel top-k, plan shapes."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

B = 64
SF = "/root/testdata/sf0.001"


def _bucket(feat: str) -> int:
    return int(hashlib.md5(f"dsir|{feat}".encode()).hexdigest()[:15], 16) % B


def _feats(text: str) -> list[str]:
    toks = [t for t in text.split(" ") if t]
    return [f"u|{t}" for t in toks] + [
        f"b|{a} {b}" for a, b in zip(toks, toks[1:])
    ]


def _expected_weights(target: list[str], raw: list[str], scored: list[str]):
    tp = Counter(_bucket(f) for t in target for f in _feats(t))
    rp = Counter(_bucket(f) for t in raw for f in _feats(t))
    const = math.log(sum(rp.values()) + B) - math.log(sum(tp.values()) + B)
    out = []
    for t in scored:
        fs = _feats(t)
        s = sum(
            math.log(tp.get(_bucket(f), 0) + 1) - math.log(rp.get(_bucket(f), 0) + 1)
            for f in fs
        )
        out.append((len(fs), s + len(fs) * const))
    return out


def test_importance_weights_hand_math(spark):
    from json_schema_py_spark.operators.importance import (
        hashed_ngram_profile,
        importance_weights,
    )

    target_texts = ["the quick brown fox", "the lazy dog sleeps"]
    raw_texts = [
        "the quick brown fox",
        "spam spam spam spam spam",
        "buy now cheap deals now",
        "the lazy dog sleeps",
        "lorem ipsum dolor sit amet",
    ]
    t = spark.createDataFrame(
        [(i, s) for i, s in enumerate(target_texts)], "doc_id long, text string"
    )
    r = spark.createDataFrame(
        [(i, s) for i, s in enumerate(raw_texts)], "doc_id long, text string"
    )
    w = importance_weights(
        r, hashed_ngram_profile(t, B), hashed_ngram_profile(r, B), B
    )
    got = {x["doc_id"]: (x["n_feats"], x["log_w"]) for x in w.collect()}
    exp = _expected_weights(target_texts, raw_texts, raw_texts)
    assert set(got) == set(range(len(raw_texts)))
    for i, (nf, lw) in enumerate(exp):
        assert got[i][0] == nf
        assert got[i][1] == pytest.approx(lw, abs=1e-9)
    # target-like docs must outscore spam under the target distribution
    assert got[0][1] > got[1][1] and got[3][1] > got[2][1]


def test_importance_zero_feature_doc_survives(spark):
    from json_schema_py_spark.operators.importance import (
        hashed_ngram_profile,
        importance_weights,
    )

    r = spark.createDataFrame(
        [(0, "some real text"), (1, ""), (2, "   ")], "doc_id long, text string"
    )
    w = importance_weights(
        r, hashed_ngram_profile(r.where("doc_id = 0"), B), hashed_ngram_profile(r, B), B
    )
    got = {x["doc_id"]: (x["n_feats"], x["log_w"]) for x in w.collect()}
    assert got[1] == (0, 0.0) and got[2] == (0, 0.0)


def test_importance_resample_deterministic_and_biased(spark):
    from json_schema_py_spark.operators.importance import importance_resample

    # one overwhelming weight: selected under EVERY seed; the rest tie at 0
    rows = [(i, 0.0) for i in range(100)] + [(999, 50.0)]
    w = spark.createDataFrame(rows, "doc_id long, log_w double")
    for seed in ("a", "b", "c"):
        picked = {
            r["doc_id"]
            for r in importance_resample(w, 10, seed=seed).select("doc_id").collect()
        }
        assert 999 in picked and len(picked) == 10
    # layout-independent: identical selection at any partitioning
    a = sorted(
        r["doc_id"] for r in importance_resample(w, 10, seed="a").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in importance_resample(w.repartition(13), 10, seed="a").collect()
    )
    assert a == b
    with pytest.raises(ValueError, match="k must be"):
        importance_resample(w, 0)


def test_importance_plan_shapes(spark):
    """Scale doctrine: the ≤B-row ratio/const tables broadcast; the top-k
    compiles to TakeOrderedAndProject (no single-partition Exchange, no
    global sort)."""
    from json_schema_py_spark.operators.importance import (
        hashed_ngram_profile,
        importance_resample,
        importance_weights,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    w = importance_weights(
        docs, hashed_ngram_profile(docs.where("doc_id < 50"), B),
        hashed_ngram_profile(docs, B), B,
    )
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # no global sort anywhere in the weighting plan (the only
    # single-partition exchanges are the 1-row totals aggregates over the
    # ≤B-row profiles — bounded by construction, map-side partials first)
    assert "rangepartitioning" not in plan

    rplan = (
        importance_resample(w, 25)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in rplan
    assert "rangepartitioning" not in rplan

    with pytest.raises(ValueError, match="n_buckets"):
        hashed_ngram_profile(docs, 1)


def test_importance_collapse_identical_to_direct(spark):
    """Round-7: the duplicate-text collapse and the single-pass featurize
    must reproduce the direct path exactly (counts are integers; log_w
    compared at the gate's 6-digit rounding), including NULL-text docs
    (NULL n_feats/log_w) and empty-text docs (0 / smoothing-only)."""
    from pyspark.sql import functions as F

    from json_schema_py_spark.operators.importance import (
        hashed_ngram_profile,
        importance_weights,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    big = docs.crossJoin(spark.range(6).select(F.col("id").alias("_r"))).select(
        (F.col("doc_id") + F.col("_r") * 1000).alias("doc_id"),
        F.when(F.col("doc_id") % 49 == 0, F.lit(None))
        .when(F.col("doc_id") % 31 == 0, F.lit(""))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    B = 4096
    p_d = hashed_ngram_profile(big, B, collapse=False)
    p_c = hashed_ngram_profile(big, B, collapse="broadcast")
    assert p_d.exceptAll(p_c).count() == 0 and p_c.exceptAll(p_d).count() == 0
    t = hashed_ngram_profile(big.where("doc_id % 7 = 0"), B, collapse=False)
    w_d = importance_weights(big, t, p_d, B, collapse=False)
    for mode in ("broadcast", "shuffle"):
        w_c = importance_weights(big, t, p_d, B, collapse=mode)
        assert w_c.count() == big.count()
        a = w_d.select("doc_id", "n_feats", F.round("log_w", 6).alias("w"))
        b = w_c.select("doc_id", "n_feats", F.round("log_w", 6).alias("w"))
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # NULL-text rows carry NULL n_feats (r6 size(NULL) semantics)
    nulls = w_d.where(F.col("n_feats").isNull()).count()
    assert nulls == big.where(F.col("text").isNull()).count() and nulls > 0
