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


def test_curation_ngram_capped_band_swept_by_lsh(spark):
    """near_dup_method='ngram': a length band hotter than the bucket cap is
    EXCLUDED from the exact join (scale contract) but its near-dups are
    still caught — the plan routes capped bands through MinHash-LSH
    automatically (round-2 VERDICT item 7)."""
    from json_schema_py_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_with_lsh_sweep,
    )
    from json_schema_py_spark.plans.curation import curate_documents

    # hot band (lb=1: 16-31 tokens): 60 mutually-dissimilar docs + one
    # planted near-dup pair (500, 501) -> 62 rows > cap of 30
    hot = [
        (i, " ".join(f"h{i}w{j}" for j in range(20))) for i in range(60)
    ]
    p500 = " ".join(f"p0w{j}" for j in range(20))
    hot += [(500, p500), (501, p500 + " p0extra")]
    # sub-cap band (lb=2: 32-47 tokens): 10 docs + planted pair (600, 601)
    cool = [
        (100 + i, " ".join(f"s{i}w{j}" for j in range(35))) for i in range(10)
    ]
    q600 = " ".join(f"q0w{j}" for j in range(35))
    cool += [(600, q600), (601, q600 + " q0extra")]
    df = spark.createDataFrame(hot + cool, "doc_id long, text string")

    # the capped exact operator alone MISSES the hot-band pair
    alone = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            df, threshold=0.7, max_bucket_rows=30
        ).collect()
    }
    assert (500, 501) not in alone and (600, 601) in alone

    # the composed operator catches both (exact half + LSH sweep)
    swept = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs_with_lsh_sweep(
            df, threshold=0.7, max_bucket_rows=30
        ).collect()
    }
    assert {(500, 501), (600, 601)} <= swept

    # and the curation plan drops the higher id of BOTH pairs
    out = {r["doc_id"]: r["reason"] for r in curate_documents(
        df, min_tokens=3, max_tokens=100, lang=None,
        near_dup_method="ngram", ngram_max_bucket_rows=30,
        near_dup_threshold=0.7,
    ).collect()}
    assert out[501] == "near_duplicate" and out[601] == "near_duplicate"
    assert out[500] == "kept" and out[600] == "kept"


def test_curation_pii_reason(spark):
    """max_pii_total: PII-heavy docs drop with reason 'pii' BEFORE dedup —
    a PII doc must never survive as the smaller-id keeper of a duplicate
    family (its clean higher-id duplicate is kept instead)."""
    from json_schema_py_spark.plans.curation import curate_documents

    base = "the cat sat on the mat and it is a fine day for everyone involved"
    rows = [
        (1, base + " email me at leak@example.com or 555-123-4567 now"),
        (2, base + " email me at leak@example.com or 555-123-4567 now"),  # dup of 1
        (3, base),
        (4, base),  # exact dup of 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["reason"] for r in curate_documents(
        df, min_tokens=3, max_tokens=100, lang=None, max_pii_total=1
    ).collect()}
    # 1 and 2 exceed the PII cap (2 hits each); 2 drops as pii, NOT as a
    # duplicate of 1 (pii outranks dedup); 3 keeps, 4 drops as exact dup
    assert out[1] == "pii" and out[2] == "pii"
    assert out[3] == "kept" and out[4] == "exact_duplicate"
    # without the cap the same corpus keeps 1 and drops 2 as duplicate
    out2 = {r["doc_id"]: r["reason"] for r in curate_documents(
        df, min_tokens=3, max_tokens=100, lang=None
    ).collect()}
    assert out2[1] == "kept" and out2[2] == "exact_duplicate"


def test_repetition_metrics_hand_computed(spark):
    """Round-4: repetition signals against hand-computed values."""
    from json_schema_py_spark.functions.text import repetition_metrics

    docs = spark.createDataFrame(
        [
            # 4 lines, 'dup' twice: dup_line_fraction 1/4; dup chars 3 of 12
            (1, "dup\nxx\ndup\nyyyy"),
            # bigrams of 'a b a b a': [a b, b a, a b, b a] -> top 'a b' x2
            # covers 6 chars of 9
            (2, "a b a b a"),
            (3, ""),  # empty: all zeros
            (4, "solo line no repeats here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (
            r["m"]["dup_line_fraction"],
            r["m"]["dup_line_char_fraction"],
            r["m"]["top_ngram_char_fraction"],
        )
        for r in docs.select(
            "doc_id", repetition_metrics(F.col("text"), 2).alias("m")
        ).collect()
    }
    assert out[1][0] == 0.25
    assert out[1][1] == round(3 / 12, 6)
    assert out[2][2] == round(6 / 9, 6)
    assert out[3] == (0.0, 0.0, 0.0)
    assert out[4][0] == 0.0 and out[4][1] == 0.0


def test_curation_repetitive_drop_reason(spark):
    """Round-4: opt-in repetition caps drop with reason 'repetitive',
    slotted between low_quality and pii; defaults leave behavior
    unchanged."""
    from json_schema_py_spark.plans.curation import curate_documents

    good = "the quick brown fox is happy and it runs to the hill for fun"
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, good + " spam ham" * 30),          # top-bigram heavy
            (3, "the a of to in\nis it for and\n" * 5 + good),  # dup lines
        ],
        "doc_id long, text string",
    )
    # defaults: no repetition gate, everything kept
    base = {r["doc_id"]: (r["keep"], r["reason"]) for r in
            curate_documents(docs, min_tokens=1, max_tokens=10_000,
                             lang=None, near_dup_threshold=0.99).collect()}
    assert all(k for k, _ in base.values()), base

    out = {r["doc_id"]: (r["keep"], r["reason"]) for r in
           curate_documents(docs, min_tokens=1, max_tokens=10_000, lang=None,
                            near_dup_threshold=0.99,
                            max_dup_line_fraction=0.3,
                            max_top_ngram_char_fraction=0.3).collect()}
    assert out[1] == (True, "kept")
    assert out[2] == (False, "repetitive")
    assert out[3] == (False, "repetitive")


def test_curation_component_policy_transitive_star(spark):
    """Round-5: near_dup_policy='components' vs 'pairs' on the star family
    where they genuinely differ — hub 5 near-dups leaves 1 and 2, the
    leaves don't near-dup each other. Pairwise (drop-the-larger-of-each-
    pair) keeps BOTH leaves; components keeps exactly the family minimum.
    ngram method: exact pairs, no LSH S-curve probability in the test."""
    import pytest as _pytest

    from json_schema_py_spark.plans.curation import curate_documents

    toks = [f"w{i}" for i in range(1, 31)]
    hub = " ".join(toks)
    a = " ".join(toks[:-3] + ["a1", "a2", "a3"])  # J(a,hub)=25/31~0.81
    b = " ".join(["b1", "b2", "b3"] + toks[3:])   # J(b,hub)~0.81; J(a,b)=22/34~0.65
    docs = spark.createDataFrame([(1, a), (2, b), (5, hub)], "doc_id long, text string")

    def verdicts(policy):
        return {
            r["doc_id"]: (r["keep"], r["reason"])
            for r in curate_documents(
                docs, lang=None, near_dup_threshold=0.7,
                near_dup_method="ngram", near_dup_policy=policy,
            ).collect()
        }

    pw = verdicts("pairs")
    assert pw == {1: (True, "kept"), 2: (True, "kept"), 5: (False, "near_duplicate")}
    comp = verdicts("components")
    assert comp == {
        1: (True, "kept"),
        2: (False, "near_duplicate"),
        5: (False, "near_duplicate"),
    }
    with _pytest.raises(ValueError, match="near_dup_policy"):
        curate_documents(docs, near_dup_policy="bogus")


def test_curation_perplexity_gate(spark):
    """Round-5: the CCNet-style LM gate — reversed-token docs exceed the
    perplexity cap and drop with reason 'high_perplexity'; natural docs
    survive; sub-2-token docs are NEVER dropped by this gate (NULL
    perplexity); lm/max_perplexity must arrive together."""
    import pytest as _pytest

    from json_schema_py_spark.operators.lm import score_perplexity, train_bigram_lm
    from json_schema_py_spark.plans.curation import curate_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    lm = train_bigram_lm(docs, vocab_size=500)

    natural = docs.where(F.col("doc_id") < 20)
    garbage = natural.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.array_join(F.reverse(F.split(F.col("text"), " ")), " ").alias("text"),
    )
    short = spark.createDataFrame([(5000, "word")], "doc_id long, text string")
    corpus = natural.unionByName(garbage).unionByName(short)

    # cap between the two populations' means
    ppl = score_perplexity(corpus, *lm)
    nat_mean = ppl.where(F.col("doc_id") < 1000).agg(F.avg("perplexity")).collect()[0][0]
    gar_mean = (
        ppl.where((F.col("doc_id") >= 1000) & (F.col("doc_id") < 5000))
        .agg(F.avg("perplexity")).collect()[0][0]
    )
    cap = (nat_mean + gar_mean) / 2
    v = {
        r["doc_id"]: r["reason"]
        for r in curate_documents(
            corpus, lang=None, min_tokens=0, lm=lm, max_perplexity=cap
        ).collect()
    }
    dropped = {i for i, r in v.items() if r == "high_perplexity"}
    # clear majority of garbage drops, clear majority of natural
    # survives, and the 1-token doc is untouched by this gate
    n_gar = len(dropped & set(range(1000, 1020)))
    n_nat = len(dropped & set(range(20)))
    assert n_gar >= 12 and n_nat <= 8 and n_gar > n_nat
    assert v[5000] != "high_perplexity"
    with _pytest.raises(ValueError, match="together"):
        curate_documents(corpus, lm=lm)
