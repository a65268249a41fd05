#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

The headline metric follows BASELINE.json: validated documents/sec in a
SINGLE fused stats+constraint pass over the interleaved documents table.
The spans corpus is replicated deterministically ($BENCH_REPLICATION, default
400 → ~2M docs at sf0.1) so the engine is measured on millions of documents,
not the 5k-row seed table; reference comparison: 29,302 docs/sec
compile-once single-thread (BASELINE.md).

--scaling: re-runs the headline job in two fresh JVMs at local[8] and
local[32] (N vs 4N executors stand-in, per BASELINE.md) on IDENTICAL input
and reports throughput at both + efficiency = T(4N)/(4·T(N)).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATION = int(os.environ.get("BENCH_REPLICATION", "400"))


def _replicated_spans(spark, sf_dir: str, replication: int):
    """Deterministic corpus scale-up, MATERIALIZED: copy r gets doc indices
    i + r*N; the derived interleaved spans table is written to parquet once
    (cached across bench runs) so the headline measures the ENGINE reading
    the input_hint-shaped table — not the synthetic derivation.

    Returns (spans_df, flat_docs_df, n_docs) — the flat replicated
    documents table feeds the round-6 text-operator benches (lm, tfidf)
    at the same 2M-doc scale as the headline."""
    from pyspark.sql import functions as F

    from json_schema_py_spark.sources.synth import spans_documents

    import hashlib
    import inspect

    from json_schema_py_spark.sources import synth as _synth

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    # cache key includes the derivation-source hash: a change to synth.py
    # must invalidate corpora cached by earlier rounds
    src_tag = hashlib.md5(inspect.getsource(_synth).encode()).hexdigest()[:8]
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}_{replication}_{src_tag}"
    spans_path = f"/tmp/bench_spans_{tag}"
    flat = f"/tmp/bench_docs_{tag}"
    if not os.path.exists(spans_path) or not os.path.exists(flat):
        reps = spark.range(replication).select(F.col("id").alias("rep"))
        big = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        link_dir = flat + "_dir"
        big.repartition(max(CPUS * 2, 8)).write.mode("overwrite").parquet(flat)
        os.makedirs(link_dir, exist_ok=True)
        link = f"{link_dir}/documents.parquet"
        if not os.path.exists(link):
            os.symlink(flat, link)
        spans_documents(spark, link_dir).repartition(256).write.mode(
            "overwrite"
        ).parquet(spans_path)
    return spark.read.parquet(spans_path), spark.read.parquet(flat), n * replication


def run_benchmarks(cpus: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from pyspark.sql import functions as F

    from json_schema_py_spark.session import get_spark

    spark = get_spark(app_name=f"bench-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from json_schema_py_spark.operators.dedup import minhash_lsh_pairs
    from json_schema_py_spark.operators.referential import spans_fk_violations
    from json_schema_py_spark.operators.similarity import brute_force_topk
    from json_schema_py_spark.operators.stats import column_stats
    from json_schema_py_spark.operators.uniqueness import duplicate_keys
    from json_schema_py_spark.schema.compiler import with_violations
    from json_schema_py_spark.sources.synth import (
        DOCUMENTS_RULESET,
        media_dim,
        spans_documents,
    )

    queries: dict[str, float] = {}
    t_all = time.time()

    # -- headline: single fused stats+constraint pass over replicated corpus.
    # Run twice: first run pays one-time plan compile + codegen (~seconds,
    # amortized to nothing on a real cluster run); steady-state is the metric.
    spans_big, docs_big, n_docs = _replicated_spans(spark, SF_DIR, REPLICATION)

    def fused_pass():
        ann = with_violations(spans_big, DOCUMENTS_RULESET)
        return ann.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.size("violations")).alias("violations"),
            F.sum(F.col("doc_id").isNull().cast("long")).alias("null_ids"),
            F.min(F.size("spans")).alias("min_spans"),
            F.max(F.size("spans")).alias("max_spans"),
            F.approx_count_distinct("doc_id", 0.05).alias("distinct_ids"),
        ).collect()[0]

    # default 8 reps (round-6): the interleaved attribution run showed the
    # fused pass still decaying through rep ~5 (1.9 s at rep 5 vs 1.31 s
    # steady) — the r5 sub-second lesson applies to the headline too, so
    # the artifact of record now samples genuine C2 steady state
    times = []
    for _ in range(int(os.environ.get("BENCH_FUSED_REPS", "8"))):
        t0 = time.time()
        row = fused_pass()
        times.append(time.time() - t0)
    queries["fused_validate_stats_cold"] = round(times[0], 3)
    fused_sec = min(times)
    queries["fused_validate_stats"] = round(fused_sec, 3)
    assert row["docs"] == n_docs, (row["docs"], n_docs)
    docs_per_sec = n_docs / fused_sec

    # every per-query number is min-of-N (BENCH_NOISY_REPS, default 3):
    # round-2's "+21%/+27% regressions" were single-shot artifacts — this
    # host's first-call JIT + page-cache variance exceeds real deltas.
    # Round-5 raised the default 3 → 5: a min-of-6×2 attribution run showed
    # sub-second queries still decaying through rep 6 (C2 steady state
    # arrives around rep 7-10), which manufactured the four r4 "+16-26%"
    # upticks out of warm-up state
    noisy_reps = int(os.environ.get("BENCH_NOISY_REPS", "5"))

    def _timed(fn) -> float:
        t0 = time.time()
        fn()
        return time.time() - t0

    def min_of(fn) -> float:
        return round(min(_timed(fn) for _ in range(noisy_reps)), 3)

    # -- cross-row checks on the replicated corpus
    queries["uniqueness_salted"] = min_of(
        lambda: duplicate_keys(spans_big, "doc_id").count()
    )
    queries["referential_fk"] = min_of(
        lambda: spans_fk_violations(spans_big, media_dim(spark)).count()
    )

    # -- engine ops at native sf scale
    sd = spans_documents(spark, SF_DIR)
    queries["validate_native_sf"] = min_of(
        lambda: with_violations(sd, DOCUMENTS_RULESET).where(~F.col("valid")).count()
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    queries["stats_lineitem"] = min_of(
        lambda: column_stats(
            li, ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"]
        ).collect()
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    queries["minhash_lsh"] = min_of(
        lambda: minhash_lsh_pairs(docs, threshold=0.7).count()
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries["ann_bruteforce"] = min_of(
        lambda: brute_force_topk(emb, emb.where(F.col("vec_id") < 50), k=10).count()
    )

    from json_schema_py_spark.operators.dedup import simhash
    from json_schema_py_spark.operators.sessions import session_stats
    from json_schema_py_spark.plans.json_docs import validate_json_exact

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    queries["sessionize"] = min_of(lambda: session_stats(ev).count())

    queries["json_exact_pandas"] = min_of(
        lambda: validate_json_exact(
            ev,
            "props",
            {"type": "object", "additionalProperties": {"type": "integer", "minimum": 50}},
            key_col="event_id",
        ).count()
    )

    # variant dynamic-JSON path (round-4: propertyNames string fast path,
    # compiled-Column cache, ensure_parallelism — tracks the exact path)
    from json_schema_py_spark.plans.json_variant import validate_json_variant

    queries["json_variant"] = min_of(
        lambda: validate_json_variant(
            ev,
            "props",
            {"type": "object", "additionalProperties": {"type": "integer", "minimum": 50}},
            key_col="event_id",
        ).count()
    )

    # int8-quantized top-k (round-4: integer inner product)
    from json_schema_py_spark.operators.similarity import quantized_topk

    queries["ann_quantized"] = min_of(
        lambda: quantized_topk(emb, emb.where(F.col("vec_id") < 50), k=10).count()
    )

    # count() would prune the simhash column
    queries["simhash"] = min_of(
        lambda: simhash(docs).agg(F.max("simhash")).collect()
    )

    # temporal operators (round-5): as-of join + one-pass rollup on events
    from json_schema_py_spark.operators.temporal import as_of_join, time_rollup

    ev_l = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    ev_r = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "value"
    )
    queries["as_of_join"] = min_of(
        lambda: as_of_join(ev_l, ev_r, ["user_id"]).count()
    )
    queries["time_rollup"] = min_of(
        lambda: time_rollup(ev, "ts", "value", ("hour", "day")).count()
    )

    # -- interval join at scale (round-6, VERDICT r05 item 6): 2M events
    # against 10k time intervals, including ONE oversized interval (the
    # full 30-day span at bucket_seconds=600 = ~4,320 buckets > cap 1,000)
    # exercising the cap + audit. Events replicate 20x and are
    # re-partitioned + persisted once OUTSIDE the timed region (the
    # crossJoin inherits the tiny parquet's 1-2 partitions — the r5 dedup
    # drive lesson).
    from json_schema_py_spark.operators.temporal import (
        interval_join,
        interval_join_oversized,
    )

    b = ev.agg(
        F.unix_seconds(F.min("ts").cast("timestamp")).alias("lo"),
        F.unix_seconds(F.max("ts").cast("timestamp")).alias("hi"),
    ).first()
    lo_s, hi_s = float(b["lo"]), float(b["hi"])
    step = (hi_s - lo_s) / 10_000
    iv = spark.range(10_000).select(
        F.col("id").alias("interval_id"),
        F.timestamp_seconds(F.lit(lo_s) + F.col("id") * F.lit(step)).alias("start"),
        F.when(F.col("id") == 0, F.timestamp_seconds(F.lit(hi_s)))
        .otherwise(
            F.timestamp_seconds(F.lit(lo_s) + F.col("id") * F.lit(step) + F.lit(1800.0))
        )
        .alias("end"),
    )
    ev_big = (
        ev.crossJoin(spark.range(20).select(F.col("id").alias("_rep")))
        .select(
            (F.col("event_id") + F.col("_rep") * 1_000_000).alias("event_id"),
            "user_id",
            "ts",
        )
        .repartition(max(cpus * 2, 8))
        .persist()
    )
    ev_big.count()
    queries["interval_join_2m_x_10k"] = min_of(
        lambda: interval_join(
            ev_big, iv, bucket_seconds=600, max_buckets_per_interval=1_000
        ).count()
    )
    n_oversized = interval_join_oversized(
        iv, bucket_seconds=600, max_buckets_per_interval=1_000
    ).count()
    assert n_oversized == 1, n_oversized  # the audit catches exactly the plant
    ev_big.unpersist()

    # -- round-6 heavy text operators over the SAME 2M-doc corpus as the
    # headline (VERDICT r05 item 7). Gated by BENCH_HEAVY so --scaling
    # (which re-runs the whole file twice) keeps its r5-comparable cost.
    if os.environ.get("BENCH_HEAVY", "1") == "1":
        # heavy entries are multi-second and memory-bound: the sub-second
        # C2-warm-up problem that forced min-of-5 does not apply, and rep
        # variance here is host-window-level (which more same-window reps
        # cannot fix). min-of-2 keeps the driver's per-round run bounded;
        # clean serialized records live in BASELINE.md.
        heavy_reps = int(os.environ.get("BENCH_HEAVY_REPS", "2"))

        def heavy_min_of(fn) -> float:
            return round(min(_timed(fn) for _ in range(heavy_reps)), 3)

        from json_schema_py_spark.operators.keywords import tfidf_top_terms
        from json_schema_py_spark.operators.lm import (
            score_perplexity,
            train_bigram_lm,
        )

        d2m = docs_big.select("doc_id", "text")
        queries["tfidf_top_terms"] = heavy_min_of(
            lambda: tfidf_top_terms(d2m, k=5, min_df=2)
            .agg(F.count(F.lit(1)), F.sum("tfidf"))
            .collect()
        )

        # train once, MATERIALIZE the LM (the production shape: an LM is a
        # reusable artifact — scoring must not re-run the train lineage),
        # then score the full corpus against it
        t0 = time.time()
        vocab, uni, bi = train_bigram_lm(d2m, vocab_size=50_000)
        vocab, uni, bi = vocab.persist(), uni.persist(), bi.persist()
        lm_sizes = (vocab.count(), uni.count(), bi.count())
        queries["lm_train_50k_cold"] = round(time.time() - t0, 3)
        queries["lm_score_2m"] = heavy_min_of(
            lambda: score_perplexity(d2m, vocab, uni, bi)
            .agg(F.count(F.lit(1)), F.sum("perplexity"), F.sum("n_bigrams"))
            .collect()
        )
        for t in (vocab, uni, bi):
            t.unpersist()

        # round-6 operators at the same 2M corpus: NB-classifier train+
        # score (one exploded groupBy + one shuffle-join scoring pass) and
        # substring dedup (hot 8-gram count + covered-token strip). The
        # corpus replicates base texts VERBATIM, so every shingle occurs
        # >= REPLICATION times; hot must mean "repeated in the BASE
        # corpus" (>= 3x) or the strip degenerates to removing everything.
        from json_schema_py_spark.operators.classifier import (
            score_quality,
            train_nb_classifier,
        )
        from json_schema_py_spark.operators.substring import (
            hot_ngrams,
            strip_duplicate_ngrams,
        )

        labeled = docs_big.select(
            "doc_id",
            "text",
            (F.crc32(F.col("text")) % 2 == 0).cast("int").alias("label"),
        )
        t0 = time.time()
        w, b = train_nb_classifier(labeled)
        w, b = w.persist(), b.persist()
        _ = (w.count(), b.count())
        queries["classifier_train_2m_cold"] = round(time.time() - t0, 3)
        queries["classifier_score_2m"] = heavy_min_of(
            lambda: score_quality(labeled, w, b)
            .agg(F.count(F.lit(1)), F.sum("score"), F.sum("matched"))
            .collect()
        )
        for t in (w, b):
            t.unpersist()

        hot = hot_ngrams(d2m, k=8, min_count=3 * REPLICATION).persist()
        n_hot = hot.count()
        queries["substring_strip_2m"] = heavy_min_of(
            lambda: strip_duplicate_ngrams(d2m, hot, k=8)
            .agg(F.count(F.lit(1)), F.sum("n_removed"), F.sum("n_tokens"))
            .collect()
        )
        hot.unpersist()

        # line tier at 2M: footers planted on 1/3 of docs; hot threshold
        # follows the substring convention — the corpus replicates base
        # texts VERBATIM (each base line lands in REPLICATION docs), so
        # "boilerplate" must mean shared by >= 3 BASE docs
        from json_schema_py_spark.operators.substring import (
            hot_lines,
            strip_boilerplate_lines,
        )

        dlines = d2m.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit("(c) example corp\n"), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        hotl = hot_lines(dlines, min_docs=3 * REPLICATION).persist()
        n_hotl = hotl.count()
        assert n_hotl >= 1, "planted footer must be hot"
        queries["boilerplate_strip_2m"] = heavy_min_of(
            lambda: strip_boilerplate_lines(dlines, hotl)
            .agg(F.count(F.lit(1)), F.sum("n_removed_lines"), F.sum("n_lines"))
            .collect()
        )
        hotl.unpersist()

        # domain cap at 2M: URLs planted on 1/2 of docs across synthetic
        # hosts — one host ("hot0.example") takes half the planted mass,
        # exercising the WindowGroupLimit partial cap on a genuinely hot key
        from json_schema_py_spark.operators.contamination import domain_cap

        durl = d2m.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" via https://hot"),
                    F.when(F.col("doc_id") % 4 == 0, F.lit(0))
                    .otherwise(F.col("doc_id") % 32)
                    .cast("string"),
                    F.lit(".example/p"),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        cap_row = (
            domain_cap(durl, n_per_domain=1000)
            .agg(
                F.count(F.lit(1)).alias("kept"),
                F.count("domain").alias("capped_side"),
                F.max("rank_in_domain").alias("max_rank"),
            )
            .collect()[0]
        )
        # planted truth (dense ids 0..n-1): hot0 = the %4 quarter, 8 cold
        # hosts = n/32 each, every host capped at 1000; odd half exempt
        exp_capped = min(1000, n_docs // 4) + 8 * min(1000, n_docs // 32)
        assert cap_row["capped_side"] == exp_capped, (cap_row, exp_capped)
        assert cap_row["kept"] == exp_capped + n_docs // 2, cap_row
        assert cap_row["max_rank"] == min(1000, n_docs // 4), cap_row
        queries["domain_cap_2m"] = heavy_min_of(
            lambda: domain_cap(durl, n_per_domain=1000)
            .agg(
                F.count(F.lit(1)),
                F.count("domain"),
                F.max("rank_in_domain"),
            )
            .collect()
        )

        # DSIR importance resampling at 2M: target = a 1% id slice (the
        # texts replicate base docs, so the target profile is a genuine
        # subsample of the raw distribution). Profiles are reusable
        # artifacts (like the LM): fit cold once, persist, then the
        # weighting pass + Gumbel top-k are the steady-state cost.
        from json_schema_py_spark.operators.importance import (
            hashed_ngram_profile,
            importance_resample,
            importance_weights,
        )

        n_buckets = 65_536
        t0 = time.time()
        tprof = hashed_ngram_profile(
            d2m.where(F.col("doc_id") % 100 == 0), n_buckets
        ).persist()
        rprof = hashed_ngram_profile(d2m, n_buckets).persist()
        prof_rows = (tprof.count(), rprof.count())
        assert prof_rows[0] <= n_buckets and prof_rows[1] <= n_buckets
        queries["dsir_profiles_2m_cold"] = round(time.time() - t0, 3)
        w2m = importance_weights(d2m, tprof, rprof, n_buckets)

        def _dsir_weights():
            row = w2m.agg(
                F.count(F.lit(1)).alias("n"), F.sum("log_w"), F.sum("n_feats")
            ).collect()[0]
            assert row["n"] == n_docs, (row["n"], n_docs)  # zero row loss
            return row

        queries["dsir_weights_2m"] = heavy_min_of(_dsir_weights)
        wp = w2m.persist()
        wp.count()
        k_res = min(10_000, n_docs // 2)
        queries["dsir_resample_top10k"] = heavy_min_of(
            lambda: importance_resample(wp, k_res)
            .agg(F.count(F.lit(1)), F.sum("key"))
            .collect()
        )
        assert importance_resample(wp, k_res).count() == k_res
        for t in (tprof, rprof, wp):
            t.unpersist()

        # deterministic shard-shuffle at 2M: 64 shards, one hash exchange
        # + partition-local sort — the training-shard write path
        from json_schema_py_spark.operators.sampling import shuffle_shards

        def _shards():
            row = (
                shuffle_shards(d2m, 64)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.countDistinct("shard_id").alias("shards"),
                    F.max("pos").alias("max_pos"),
                )
                .collect()[0]
            )
            assert row["n"] == n_docs and row["shards"] == 64, row
            if n_docs >= 500_000:
                # uniform hash: the biggest shard within 5% of n/64
                # (binomial sd at 2M/64 is ~0.6%; tiny smoke corpora skip)
                assert row["max_pos"] + 1 < (n_docs / 64) * 1.05, row
            return row

        queries["shuffle_shards_2m_x64"] = heavy_min_of(_shards)

        # incremental cross-snapshot dedup at 2M: the two indexes are
        # persisted snapshot artifacts (like the LM) — build them cold
        # once; the steady-state cost is the batch probe. The replicated
        # corpus is a worst-case bucket-skew fixture (every band bucket
        # holds REPLICATION byte-identical ids), so the probe slice stays
        # at 100 base texts to bound the candidate fan-out the way a real
        # deduped snapshot would.
        from json_schema_py_spark.operators.incremental import (
            corpus_index,
            incremental_dedup,
            incremental_oversized_keys,
        )

        t0 = time.time()
        exact_idx, band_idx = corpus_index(d2m)
        exact_idx, band_idx = exact_idx.persist(), band_idx.persist()
        idx_rows = (exact_idx.count(), band_idx.count())
        assert idx_rows[1] == n_docs * 4, idx_rows  # 4 bands per doc
        queries["incremental_index_2m_cold"] = round(time.time() - t0, 3)
        # the production hasher: same index shape, xxhash64 signatures
        t0 = time.time()
        _, xx_band = corpus_index(d2m, hash_impl="xxhash64")
        assert xx_band.count() == n_docs * 4
        queries["incremental_index_2m_xxhash_cold"] = round(time.time() - t0, 3)
        # planted truth: every bucket holds >= REPLICATION ids (byte
        # replicas share all band keys), so at cap REPLICATION-1 the
        # audit must fire; the probe below runs at a cap tuned to the
        # replication (base near-dup FAMILIES merge buckets to several
        # x REPLICATION — the sf0.1 seed has 8 byte-duplicate texts and
        # planted near-dup pairs, which is what tripped an ==0 assert at
        # cap 1000 on the first run of this entry)
        assert incremental_oversized_keys(band_idx, REPLICATION - 1).count() > 0
        # the hot-key set is a snapshot artifact: precompute + persist it
        # with the index, never inside the probe loop
        hot_keys = incremental_oversized_keys(band_idx, 64 * REPLICATION).persist()
        hot_keys.count()
        n_base = n_docs // REPLICATION
        base_lim = min(100, n_base)
        n_near_reps = max(1, min(25, REPLICATION // 16))
        n_exact_reps = max(1, min(250, REPLICATION - n_near_reps))
        hi_rep = n_near_reps + n_exact_reps
        base_c = F.col("doc_id") % n_base
        rep_c = (F.col("doc_id") / n_base).cast("long")
        probe = (
            d2m.where(
                (base_c < base_lim) & (rep_c >= n_near_reps) & (rep_c < hi_rep)
            )
            .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
            .unionByName(
                d2m.where((base_c < base_lim) & (rep_c < n_near_reps)).select(
                    (F.col("doc_id") + 10_000_000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" zzzz yyyy")).alias("text"),
                )
            )
            .repartition(max(cpus * 2, 8))
            .persist()
        )
        n_probe = probe.count()
        assert n_probe == base_lim * hi_rep, n_probe

        def _inc_probe():
            got = {
                r["verdict"]: r["n"]
                for r in incremental_dedup(
                    probe, d2m, exact_idx, band_idx,
                    max_ids_per_bucket=64 * REPLICATION, hot_keys=hot_keys,
                )
                .groupBy("verdict")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            assert sum(got.values()) == n_probe, (got, n_probe)  # no row loss
            # byte copies -> exact, exactly
            assert got.get("exact_dup", 0) == base_lim * n_exact_reps, got
            # appended-token probes: near_dup unless LSH banding misses the
            # base signature (P ~ 2e-3 per base text) or the base is too
            # short to clear jaccard 0.7 with 2 extra tokens
            assert got.get("near_dup", 0) >= int(0.92 * base_lim * n_near_reps), got
            return got

        queries["incremental_probe_27k_vs_2m"] = heavy_min_of(_inc_probe)
        probe.unpersist()
        exact_idx.unpersist()
        band_idx.unpersist()
        hot_keys.unpersist()

        # k-means diversity sampling at 800k x 64-dim embeddings (2000-vector
        # base snapshot x REPLICATION): the model
        # is a bounded k x dim driver artifact fitted on the base snapshot
        # (like IVF's cell table); steady state = one shuffle-free
        # assignment projection + the Partial WindowGroupLimit cap.
        # Replicas of a base vector are byte-identical, so each lands in
        # the same cluster and the expected keep count is exact.
        from json_schema_py_spark.operators.clustering import (
            kmeans_assign,
            kmeans_fit,
            semantic_diversity_sample,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        n_emb_base = emb.count()
        emb2m = (
            emb.crossJoin(spark.range(REPLICATION).select(F.col("id").alias("_r")))
            .select(
                (F.col("vec_id") + F.col("_r") * n_emb_base).alias("vec_id"),
                "embedding",
            )
            .repartition(max(cpus * 2, 8))
            .persist()
        )
        n_emb = emb2m.count()
        assert n_emb == n_emb_base * REPLICATION
        t0 = time.time()
        cents = kmeans_fit(emb, k=16, iters=2)
        queries["kmeans_fit_16x2_cold"] = round(time.time() - t0, 3)
        cluster_sizes = [
            r["n"]
            for r in kmeans_assign(emb2m, cents)
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        exp_kept = sum(min(1_000, n) for n in cluster_sizes)

        def _kdiv():
            row = (
                semantic_diversity_sample(emb2m, n_per_cluster=1_000, centroids=cents)
                .agg(
                    F.count(F.lit(1)).alias("kept"),
                    F.max("rank_in_cluster").alias("max_rank"),
                )
                .collect()[0]
            )
            assert row["kept"] == exp_kept, (row["kept"], exp_kept)
            assert row["max_rank"] <= 1_000, row
            return row

        queries["kmeans_diversity_800k_x64d"] = heavy_min_of(_kdiv)
        emb2m.unpersist()

    total = time.time() - t_all
    result = {
        "metric": "validated_docs_per_sec_fused_pass",
        "value": round(docs_per_sec, 1),
        "unit": "docs/sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "docs": n_docs,
        "violations": int(row["violations"]),
        "cpus": cpus,
        "total_sec": round(total, 2),
        "reference_docs_per_sec": 29302,
    }
    spark.stop()
    return result


def _host_cpu_scaling(lo: int, hi: int) -> dict:
    """Pure-CPU roofline calibration: aggregate md5 throughput at ``lo``
    and ``hi`` concurrent PROCESSES (no shared memory, no JVM, no Spark).
    On shared-vCPU cloud hosts the per-core rate itself drops as
    occupancy rises (measured 1.81 → 1.15 M md5/s/core from 8 → 32 on
    this box = 0.61 host efficiency) — a ceiling NO engine can beat, so
    the engine's scaling efficiency is reported raw AND normalized by
    the host's own."""
    import multiprocessing as mp

    def measure(procs, n=2_000_000):
        ctx = mp.get_context("spawn")
        with ctx.Pool(procs) as p:
            t0 = time.time()
            p.map(_burn_global, [n] * procs)
            wall = time.time() - t0
        return procs * n / wall

    t_lo, t_hi = measure(lo), measure(hi)
    return {
        f"host_md5_per_sec_{lo}procs": round(t_lo),
        f"host_md5_per_sec_{hi}procs": round(t_hi),
        "host_cpu_efficiency": round(t_hi / (t_lo * hi / lo), 3),
    }


def _burn_global(n):  # top-level for spawn-pickling
    import hashlib

    h = b"x" * 64
    for _ in range(n):
        h = hashlib.md5(h).digest()


def run_scaling() -> None:
    """Two-parallelism evidence: same job at N and 4N cores (default
    local[8] vs local[32]; override via BENCH_SCALE_LEVELS="4,16").
    Also emits the host's OWN pure-CPU scaling over the same span
    (shared-vCPU hosts slow per-core as occupancy rises) and the
    engine efficiency normalized by that roofline."""
    lo, hi = (int(x) for x in os.environ.get("BENCH_SCALE_LEVELS", "8,32").split(","))
    results = {}
    for cpus in (lo, hi):
        env = dict(
            os.environ, SPARK_GRAFT_CPUS=str(cpus), BENCH_FUSED_REPS="3",
            BENCH_HEAVY="0",
        )
        out = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True, text=True, timeout=1800
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    host = _host_cpu_scaling(lo, hi)
    t_lo = results[lo]["value"]
    t_hi = results[hi]["value"]
    eff = t_hi / (hi / lo * t_lo)
    print(json.dumps({
        f"throughput_local{lo}_docs_per_sec": t_lo,
        f"throughput_local{hi}_docs_per_sec": t_hi,
        "scaling_efficiency_N_to_4N": round(eff, 3),
        **host,
        "scaling_efficiency_normalized_by_host": round(
            min(eff / host["host_cpu_efficiency"], 1.0), 3
        ),
        f"queries_local{lo}": results[lo]["queries"],
        f"queries_local{hi}": results[hi]["queries"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_benchmarks(CPUS)))
