#!/usr/bin/env python
"""2M-doc curation drive for the ROUND-5 additions (round-6, VERDICT r05
item 5): the perplexity gate (a REAL 50k-vocab bigram LM trained on the
corpus itself) and near_dup_policy="components" — both landed AFTER the
round-5 2M drive ran, so that drive exercised neither. This one does, and
it is also the scale proof for the de-broadcast fix (VERDICT r05 item 2):
the LM scoring join runs over 2M docs against a multi-million-row bigram
table with NO forced broadcast.

Corpus: identical planted-cluster construction as dedup_scale_run.py
(100 clusters x 20 members, replica-suffixed background), so the
components-policy contract has exact ground truth: every cluster whose
members survive the quality gates must keep EXACTLY its minimum id.

Two modes (the corpus-trained LM rightfully flags the planted clusters
as anomalous — their member-specific bigrams are the corpus tail — so
the perplexity gate eats the components fixture when both run together;
each feature gets the arm that exercises it):

  lm          — quality -> PERPLEXITY GATE (p90 threshold) -> exact ->
                LSH, pairs policy: the 2M-doc / 50k-vocab scoring join
                with no forced broadcast.
  components  — quality -> exact -> LSH -> CONNECTED COMPONENTS: the
                exactly-one-kept-per-family contract vs planted truth.

Usage: python scripts/curation_scale_r6.py [lm|components] [sf_dir] [repl]
Prints one JSON line per run, consumed by BASELINE.md's round-6 deltas.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from dedup_scale_run import build_corpus  # noqa: E402


def main(
    mode: str = "lm",
    sf_dir: str = "/root/testdata/sf0.1",
    replication: int = 400,
) -> int:
    from json_schema_py_spark.operators.lm import score_perplexity, train_bigram_lm
    from json_schema_py_spark.plans.curation import curate_documents
    from json_schema_py_spark.session import get_spark

    if mode not in ("lm", "components"):
        raise SystemExit(f"mode must be lm|components, got {mode!r}")
    spark = get_spark(app_name=f"curation-scale-r6-{mode}", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = build_corpus(spark, sf_dir, replication).persist()
    n_docs = corpus.count()
    docs = corpus.select("doc_id", "text")
    out: dict = {"mode": mode, "corpus_docs": n_docs}

    lm = None
    thr = None
    if mode == "lm":
        # train the LM on the corpus and MATERIALIZE it (an LM is a
        # reusable artifact; scoring must not re-run the train lineage)
        t0 = time.time()
        vocab, uni, bi = train_bigram_lm(docs, vocab_size=50_000)
        vocab, uni, bi = vocab.persist(), uni.persist(), bi.persist()
        out["lm_sizes"] = {
            "vocab": vocab.count(), "unigrams": uni.count(), "bigrams": bi.count()
        }
        out["lm_train_materialize_sec"] = round(time.time() - t0, 1)

        # gate threshold at the corpus's own p90 perplexity (one scoring
        # pass; recorded so the run is reproducible) — a fixed policy
        # number would drop nothing or everything on a synthetic corpus
        t0 = time.time()
        scored = score_perplexity(docs, vocab, uni, bi)
        thr = scored.approxQuantile("perplexity", [0.9], 0.001)[0]
        out["score_pass_sec"] = round(time.time() - t0, 1)
        out["perplexity_p90_threshold"] = round(thr, 2)
        lm = (vocab, uni, bi)

    t0 = time.time()
    verdicts = curate_documents(
        docs,
        near_dup_threshold=0.7,
        lang=None,
        lm=lm,
        max_perplexity=thr,
        near_dup_policy="components" if mode == "components" else "pairs",
    ).persist()
    n_verdicts = verdicts.count()
    out["curation_wall_sec"] = round(time.time() - t0, 1)
    out["curation_verdict_rows"] = n_verdicts
    out["curation_no_row_loss"] = n_verdicts == n_docs
    out["curation_reasons"] = {
        r["reason"] or "kept": r["count"]
        for r in verdicts.groupBy("reason").count().collect()
    }

    if mode == "components":
        # components contract vs planted truth: within every planted
        # cluster, among members that reached the dedup stage (kept or
        # near_duplicate), EXACTLY ONE survives — and it is the minimum id
        members = corpus.where(F.col("cluster").isNotNull()).select(
            "cluster", "doc_id"
        )
        mv = members.join(verdicts, "doc_id")
        cl = (
            mv.where(F.col("reason").isin("kept", "near_duplicate"))
            .groupBy("cluster")
            .agg(
                F.sum(F.col("keep").cast("long")).alias("n_kept"),
                F.count(F.lit(1)).alias("n_eligible"),
                F.min("doc_id").alias("min_id"),
                F.min(F.when(F.col("keep"), F.col("doc_id"))).alias("kept_id"),
            )
            .where(F.col("n_eligible") >= 2)
        ).persist()
        out["clusters_with_2plus_dedup_eligible"] = cl.count()
        out["clusters_keeping_not_exactly_one"] = cl.where(
            F.col("n_kept") != 1
        ).count()
        out["clusters_keeping_non_minimum"] = cl.where(
            (F.col("n_kept") == 1) & (F.col("kept_id") != F.col("min_id"))
        ).count()

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sys.exit(
        main(
            args[0] if args else "lm",
            args[1] if len(args) > 1 else "/root/testdata/sf0.1",
            int(args[2]) if len(args) > 2 else 400,
        )
    )
