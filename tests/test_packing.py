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


def test_select_to_token_budget_low_cardinality_and_nulls(spark):
    """Review r03: (a) low-cardinality quality scores (the classifier-
    output case) must SPREAD tied rows across buckets — correctness
    pinned against the naive window for constant and {0..5} scores;
    (b) NULL-quality docs come back keep=False with NULL cum, never
    silently selected; (c) string ids tie-break lexicographically."""
    from json_schema_py_spark.operators.packing import select_to_token_budget

    rows = [(i, float(i % 6), "w " * (5 + i % 7)) for i in range(300)]
    rows += [(900 + i, None, "x y z") for i in range(3)]  # null quality
    df = spark.createDataFrame(rows, "doc_id long, q double, text string")
    out = {r["doc_id"]: (r["cum_tokens"], r["keep"]) for r in
           select_to_token_budget(df, 400, "q", num_buckets=8).collect()}
    assert len(out) == 303
    for i in range(3):
        assert out[900 + i] == (None, False)
    naive = sorted(
        ((r[1], r[0], len(r[2].split())) for r in rows if r[1] is not None),
        key=lambda t: (-t[0], t[1]),
    )
    cum = 0
    for q, did, n in naive:
        cum += n
        assert out[did] == (cum, cum <= 400), (did, out[did], cum)

    # constant quality: everything ties — still exact
    cdf = spark.createDataFrame(
        [(i, 1.0, "a b c d") for i in range(50)], "doc_id long, q double, text string"
    )
    cout = {r["doc_id"]: r["cum_tokens"] for r in
            select_to_token_budget(cdf, 100, "q", num_buckets=8).collect()}
    assert cout == {i: (i + 1) * 4 for i in range(50)}

    # string ids: ties order lexicographically (d1 < d10 < d2)
    sdf = spark.createDataFrame(
        [(f"d{i}", 1.0, "a b") for i in range(12)], "doc_id string, q double, text string"
    )
    sout = {r["doc_id"]: r["cum_tokens"] for r in
            select_to_token_budget(sdf, 100, "q", num_buckets=4).collect()}
    order = sorted((f"d{i}" for i in range(12)))
    assert sout == {d: (k + 1) * 2 for k, d in enumerate(order)}


def test_select_to_token_budget_nan_and_noncastable_quality(spark):
    """ADVICE r03: NaN quality (driver sorted() and F.desc disagree on NaN
    placement → wrong offsets for every later row) and non-double-castable
    quality (post-cast NULL silently dropped by the rank join) must both be
    routed to keep=False/NULL-cum like NULL quality, preserving the
    one-row-per-input-doc shape and exact cums for the good rows."""
    from json_schema_py_spark.operators.packing import select_to_token_budget

    rows = [(i, float(i % 3), "w " * (3 + i % 4)) for i in range(60)]
    rows.append((900, float("nan"), "x y z"))
    rows.append((901, None, "x y"))
    df = spark.createDataFrame(rows, "doc_id long, q double, text string")
    out = {r["doc_id"]: (r["cum_tokens"], r["keep"]) for r in
           select_to_token_budget(df, 120, "q", num_buckets=8).collect()}
    assert len(out) == 62
    assert out[900] == (None, False)
    assert out[901] == (None, False)
    naive = sorted(
        ((r[1], r[0], len(r[2].split())) for r in rows[:60]),
        key=lambda t: (-t[0], t[1]),
    )
    cum = 0
    for q, did, n in naive:
        cum += n
        assert out[did] == (cum, cum <= 120), (did, out[did], cum)

    # string-typed quality column: castable values rank, junk gets keep=False
    sdf = spark.createDataFrame(
        [(1, "2.0", "a b c"), (2, "1.0", "a b"), (3, "not-a-number", "a")],
        "doc_id long, q string, text string",
    )
    sout = {r["doc_id"]: (r["cum_tokens"], r["keep"]) for r in
            select_to_token_budget(sdf, 4, "q", num_buckets=4).collect()}
    assert sout == {1: (3, True), 2: (5, False), 3: (None, False)}


def test_quantile_buckets_balance_skewed_ids(spark):
    """Round-4 (VERDICT r03 item 8): a pathological id distribution (95%
    of ids inside 0.1% of the span) collapses uniform range-bucketing
    into one hot bucket; quantile boundaries keep buckets balanced. Both
    modes must produce the IDENTICAL global prefix sum (output is
    bucketing-invariant), pinned against the naive global window."""
    from json_schema_py_spark.operators.packing import (
        _quantile_bucket_col,
        assign_token_spans,
    )

    # 380 ids in [0, 400), 20 ids flung out to ~10^9: the uniform span
    # [0, 1e9] puts 95% of rows in bucket 1
    rows = [(i, "w " * (3 + i % 5)) for i in range(380)]
    rows += [(1_000_000_000 + i * 1000, "x y z") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    naive = sorted((r[0], len(r[1].split())) for r in rows)
    cum, truth = 0, {}
    for did, n in naive:
        truth[did] = (n, cum, cum // 40, (cum + n - 1) // 40)
        cum += n

    for mode in ("range", "quantile"):
        got = {
            r["doc_id"]: (r["n_tokens"], r["start_tok"], r["first_pack"], r["last_pack"])
            for r in assign_token_spans(df, 40, num_buckets=8, bucket_mode=mode).collect()
        }
        assert got == truth, mode

    # balance: quantile buckets each hold ≤ ~2x the fair share; range
    # bucketing concentrates 95% in one bucket
    base = df.selectExpr("doc_id", "1 as n_tokens")
    qb = base.withColumn("_b", _quantile_bucket_col(base, F.col("doc_id"), 8))
    sizes = {r["_b"]: r["c"] for r in qb.groupBy("_b").agg(F.count("*").alias("c")).collect()}
    assert max(sizes.values()) <= 2 * (400 / 8), sizes
    rb = base.withColumn(
        "_b", F.width_bucket(F.col("doc_id"), F.lit(0), F.lit(1_000_000_000 + 19_001), F.lit(8))
    )
    rsizes = {r["_b"]: r["c"] for r in rb.groupBy("_b").agg(F.count("*").alias("c")).collect()}
    assert max(rsizes.values()) >= 380  # the documented collapse

    # invalid mode rejected
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bucket_mode"):
        assign_token_spans(df, 40, bucket_mode="zipf")

    # string ids take the quantile path through the surrogate
    sdf = spark.createDataFrame(
        [(f"doc-{i:04d}", "a b c") for i in range(50)], "doc_id string, text string"
    )
    sgot = {r["doc_id"]: r["start_tok"] for r in
            assign_token_spans(sdf, 10, num_buckets=4, bucket_mode="quantile").collect()}
    assert sgot == {f"doc-{i:04d}": i * 3 for i in range(50)}


def test_select_mixture_per_source_budgets(spark):
    """Round-4: data mixing — per-source budgets floor(w_s/Σw x total),
    within-source quality-first prefixes matching the naive window,
    unlisted sources keep=False/NULL, weight guards enforced."""
    from json_schema_py_spark.operators.packing import select_mixture

    rows = []
    for s, n in (("web", 30), ("code", 20), ("junk", 5)):
        for i in range(n):
            rows.append((f"{s}{i:03d}", s, float(i % 4), "w " * (4 + i % 3)))
    df = spark.createDataFrame(rows, "doc_id string, source string, q double, text string")
    out = {r["doc_id"]: (r["source"], r["n_tokens"], r["cum_tokens"], r["keep"])
           for r in select_mixture(df, 100, {"web": 3.0, "code": 1.0}, "q").collect()}
    assert len(out) == 55

    # junk: unlisted → excluded
    for i in range(5):
        assert out[f"junk{i:03d}"] == ("junk", 4 + i % 3, None, False)

    # per-source naive truth: web budget 75, code budget 25
    for s, budget, n in (("web", 75, 30), ("code", 25, 20)):
        naive = sorted(
            ((r[2], r[0], len(r[3].split())) for r in rows if r[1] == s),
            key=lambda t: (-t[0], t[1]),
        )
        cum = 0
        for q, did, nt in naive:
            cum += nt
            assert out[did] == (s, nt, cum, cum <= budget), (did, out[did])

    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive"):
        select_mixture(df, 100, {"web": 0.0}, "q")
    with _pytest.raises(ValueError, match="at least one"):
        select_mixture(df, 100, {}, "q")
    with _pytest.raises(ValueError, match="total_budget"):
        select_mixture(df, -1, {"web": 1.0}, "q")


def test_quantile_mode_single_bucket(spark):
    """ADVICE r04: bucket_mode='quantile' with num_buckets=1 used to build
    an empty percentage list for percentile_approx (analysis error); it
    must short-circuit and still match the naive global window."""
    from json_schema_py_spark.functions.text import token_count
    from json_schema_py_spark.operators.packing import assign_token_spans

    docs = spark.createDataFrame(
        [(i, "tok " * (1 + i % 5)) for i in range(40)], "doc_id long, text string"
    )
    got = assign_token_spans(docs, 16, num_buckets=1, bucket_mode="quantile")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = (
        docs.select("doc_id", token_count(F.col("text")).alias("n"))
        .withColumn("cum", F.sum("n").over(w))
    )
    g = {r["doc_id"]: r["start_tok"] for r in got.collect()}
    n = {r["doc_id"]: r["cum"] - r["n"] for r in naive.collect()}
    assert g == n
