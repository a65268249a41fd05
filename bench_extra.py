#!/usr/bin/env python
"""Round-7 optimization bench: per-operator isolation with the noop sink
(spark_optimization_guide §1.4) so each number times the COMPUTATION, not
the collect/sink, plus an --explain mode that dumps .explain("formatted")
for the plan-artifact files under plans/r07/.

bench.py is FROZEN for the driver's measurement; this file exists so the
round-7 before/after evidence in OPTIMIZATION_r07.md is reproducible:

    python bench_extra.py fused index_band lm_train ...      # time stages
    python bench_extra.py --explain index_band lm_score ...  # dump plans
    BENCH_REPLICATION=100 python bench_extra.py ...          # smaller corpus

Each stage prints one line: name, wall seconds (min of N, default 2), rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATION = int(os.environ.get("BENCH_REPLICATION", "400"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main(argv: list[str]) -> int:
    explain = "--explain" in argv
    wanted = [a for a in argv if not a.startswith("--")]

    from pyspark.sql import functions as F

    from bench import _replicated_spans
    from json_schema_py_spark.session import get_spark

    spark = get_spark(app_name="bench-extra-r7", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    spans_big, docs_big, n_docs = _replicated_spans(spark, SF_DIR, REPLICATION)
    d2m = docs_big.select("doc_id", "text")

    stages: dict[str, object] = {}

    # --- headline fused pass -------------------------------------------
    from json_schema_py_spark.schema.compiler import with_violations
    from json_schema_py_spark.sources.synth import DOCUMENTS_RULESET

    def _fused():
        return with_violations(spans_big, DOCUMENTS_RULESET).select(
            "doc_id", F.size("violations").alias("nv"), F.size("spans").alias("ns")
        )

    stages["fused"] = _fused

    # --- incremental index / probe --------------------------------------
    from json_schema_py_spark.operators.incremental import (
        corpus_index,
        incremental_dedup,
        incremental_oversized_keys,
    )

    stages["index_exact"] = lambda: corpus_index(d2m)[0]
    stages["index_band"] = lambda: corpus_index(d2m)[1]
    stages["index_band_xx"] = lambda: corpus_index(d2m, hash_impl="xxhash64")[1]

    from json_schema_py_spark.operators.dedup import minhash_signatures

    stages["minhash_sig"] = lambda: minhash_signatures(d2m).select(
        "id", F.size("sig").alias("k"), F.size("shingles").alias("s")
    )

    def _probe():
        # mirror bench.py's probe fixture exactly
        exact_idx, band_idx = corpus_index(d2m)
        exact_idx, band_idx = exact_idx.persist(), band_idx.persist()
        exact_idx.count(), band_idx.count()
        hot_keys = incremental_oversized_keys(band_idx, 64 * REPLICATION).persist()
        hot_keys.count()
        n_base = n_docs // REPLICATION
        base_lim = min(100, n_base)
        n_near = max(1, min(25, REPLICATION // 16))
        n_exact = max(1, min(250, REPLICATION - n_near))
        hi = n_near + n_exact
        base_c = F.col("doc_id") % n_base
        rep_c = (F.col("doc_id") / n_base).cast("long")
        probe = (
            d2m.where((base_c < base_lim) & (rep_c >= n_near) & (rep_c < hi))
            .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
            .unionByName(
                d2m.where((base_c < base_lim) & (rep_c < n_near)).select(
                    (F.col("doc_id") + 10_000_000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" zzzz yyyy")).alias("text"),
                )
            )
            .repartition(max(CPUS * 2, 8))
            .persist()
        )
        probe.count()
        out = incremental_dedup(
            probe, d2m, exact_idx, band_idx,
            max_ids_per_bucket=64 * REPLICATION, hot_keys=hot_keys,
        )
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            noop(out)
            ts.append(time.time() - t0)
        for t in (exact_idx, band_idx, hot_keys, probe):
            t.unpersist()
        return min(ts)

    # --- lm --------------------------------------------------------------
    from json_schema_py_spark.operators.lm import score_perplexity, train_bigram_lm

    def _lm_train():
        vocab, uni, bi = train_bigram_lm(d2m, vocab_size=50_000)
        t0 = time.time()
        noop(vocab)
        noop(uni)
        noop(bi)
        return time.time() - t0

    def _lm_score():
        vocab, uni, bi = train_bigram_lm(d2m, vocab_size=50_000)
        vocab, uni, bi = vocab.persist(), uni.persist(), bi.persist()
        vocab.count(), uni.count(), bi.count()
        out = score_perplexity(d2m, vocab, uni, bi)
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            noop(out)
            ts.append(time.time() - t0)
        for t in (vocab, uni, bi):
            t.unpersist()
        return min(ts)

    # --- dsir --------------------------------------------------------------
    from json_schema_py_spark.operators.importance import (
        hashed_ngram_profile,
        importance_weights,
    )

    NB = 65_536
    stages["dsir_profile_raw"] = lambda: hashed_ngram_profile(d2m, NB)

    def _dsir_weights():
        tprof = hashed_ngram_profile(d2m.where(F.col("doc_id") % 100 == 0), NB).persist()
        rprof = hashed_ngram_profile(d2m, NB).persist()
        tprof.count(), rprof.count()
        out = importance_weights(d2m, tprof, rprof, NB)
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            noop(out)
            ts.append(time.time() - t0)
        tprof.unpersist(), rprof.unpersist()
        return min(ts)

    # --- tfidf / classifier ------------------------------------------------
    from json_schema_py_spark.operators.keywords import tfidf_top_terms

    stages["tfidf"] = lambda: tfidf_top_terms(d2m, k=5, min_df=2)

    from json_schema_py_spark.operators.classifier import (
        score_quality,
        train_nb_classifier,
    )

    labeled = docs_big.select(
        "doc_id", "text", (F.crc32(F.col("text")) % 2 == 0).cast("int").alias("label")
    )

    def _cls_score():
        w, b = train_nb_classifier(labeled)
        w, b = w.persist(), b.persist()
        w.count(), b.count()
        out = score_quality(labeled, w, b)
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            noop(out)
            ts.append(time.time() - t0)
        w.unpersist(), b.unpersist()
        return min(ts)

    stages["classifier_train"] = lambda: train_nb_classifier(labeled)[0]

    # --- substring / boilerplate -------------------------------------------
    from json_schema_py_spark.operators.substring import (
        hot_lines,
        hot_ngrams,
        strip_boilerplate_lines,
        strip_duplicate_ngrams,
    )

    stages["substring_hot"] = lambda: hot_ngrams(d2m, k=8, min_count=3 * REPLICATION)

    def _substring_strip():
        hot = hot_ngrams(d2m, k=8, min_count=3 * REPLICATION).persist()
        hot.count()
        out = strip_duplicate_ngrams(d2m, hot, k=8)
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            noop(out)
            ts.append(time.time() - t0)
        hot.unpersist()
        return min(ts)

    def _boilerplate():
        dlines = d2m.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit("(c) example corp\n"), F.col("text")),
            ).otherwise(F.col("text")).alias("text"),
        )
        hotl = hot_lines(dlines, min_docs=3 * REPLICATION).persist()
        hotl.count()
        out = strip_boilerplate_lines(dlines, hotl)
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            noop(out)
            ts.append(time.time() - t0)
        hotl.unpersist()
        return min(ts)

    # --- small ones ----------------------------------------------------------
    from json_schema_py_spark.operators.uniqueness import duplicate_keys

    stages["uniqueness"] = lambda: duplicate_keys(spans_big, "doc_id")

    custom = {
        "probe": _probe,
        "lm_train": _lm_train,
        "lm_score": _lm_score,
        "dsir_weights": _dsir_weights,
        "classifier_score": _cls_score,
        "substring_strip": _substring_strip,
        "boilerplate": _boilerplate,
    }

    names = wanted or list(stages) + list(custom)
    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r7:{name}")
        if name in custom:
            if explain:
                print(f"# {name}: composite stage, no single plan — skipped")
                continue
            sec = custom[name]()
            results[name] = round(sec, 3)
            print(f"{name:22s} {sec:8.3f} s  (min of {REPS}, composite)")
            continue
        df = stages[name]()
        if explain:
            os.makedirs("plans/r07", exist_ok=True)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/r07/{name}.txt"
            with open(path, "w") as f:
                f.write(txt)
            print(f"# wrote {path}")
            continue
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            noop(df)
            ts.append(time.time() - t0)
        results[name] = round(min(ts), 3)
        print(f"{name:22s} {min(ts):8.3f} s  (min of {REPS}, samples {[round(t,2) for t in ts]})")
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"stages": results, "docs": n_docs, "cpus": CPUS}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
