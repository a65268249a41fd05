#!/usr/bin/env python
"""2M-doc dedup + curation scale drive (round-5, VERDICT r04 item 5).

The dedup family's caps/audits are unit-tested on hundreds-of-docs
fixtures; this script drives minhash_lsh_pairs and curate_documents at
the bench-headline corpus size (2,000,000 docs) with PLANTED
near-duplicate clusters as exact ground truth, reporting wall time,
pair recall vs the planted truth, and the oversized-bucket audit.

Corpus (deterministic, pure JVM — built from sf0.1 documents, 5,000 base
docs x 400 replicas):
  * background replicas: every token suffixed with the replica index, so
    replicas of the same base doc are mutually SHINGLE-DISJOINT (the base
    corpus's own natural near-dup pairs survive within each replica
    slice — they are part of the workload, not the truth set);
  * planted clusters: for src % 50 == 0 and replica < 20, tokens carry a
    CLUSTER suffix (identical across the 20 members) and each member
    appends one member-specific token — exact 3-shingle Jaccard
    (n-2)/n ~ 0.96 for ~50-token docs, comfortably over the 0.7
    threshold. 100 clusters x C(20,2) = 19,000 planted truth pairs.

Usage: python scripts/dedup_scale_run.py [sf_dir] [replication]
Prints one JSON line consumed by BASELINE.md's round-5 deltas.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def build_corpus(spark, sf_dir: str, replication: int):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("src"), F.col("text").alias("src_text")
    )
    reps = spark.range(replication).select(F.col("id").cast("long").alias("r"))
    c = base.join(F.broadcast(reps))
    planted = (F.col("src") % 50 == 0) & (F.col("r") < 20)
    suffix = F.when(planted, F.concat(F.lit("_p"), F.col("src").cast("string"))).otherwise(
        F.concat(F.lit("_r"), F.col("r").cast("string"))
    )
    toks = F.transform(
        F.filter(F.split(F.col("src_text"), " "), lambda t: t != ""),
        lambda t: F.concat(t, suffix),
    )
    text = F.concat(
        F.array_join(toks, " "),
        F.when(planted, F.concat(F.lit(" zz"), F.col("r").cast("string"))).otherwise(
            F.lit("")
        ),
    )
    # the broadcast replica join inherits the 5,000-row base's 1-2 input
    # splits — 2M rows in 2 partitions starves every downstream stage that
    # doesn't repartition internally (curation's projections would run as
    # single tasks); spread the corpus before anything consumes it
    return c.repartition(64, "src", "r").select(
        (F.col("src") * replication + F.col("r")).alias("doc_id"),
        text.alias("text"),
        F.when(planted, F.col("src")).alias("cluster"),
    )


def main(sf_dir: str = "/root/testdata/sf0.1", replication: int = 400) -> int:
    from json_schema_py_spark.operators.dedup import minhash_lsh_pairs
    from json_schema_py_spark.plans.curation import curate_documents
    from json_schema_py_spark.session import get_spark

    spark = get_spark(app_name="dedup-scale", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = build_corpus(spark, sf_dir, replication).persist()
    n_docs = corpus.count()

    # planted truth: all within-cluster pairs (exact Jaccard ~0.96 by
    # construction; re-derived below from the FOUND pairs rather than a
    # 2M-row brute force — the found side carries exact verified jaccard)
    members = corpus.where(F.col("cluster").isNotNull()).select("cluster", "doc_id")
    truth = (
        members.alias("a")
        .join(members.alias("b"), F.col("a.cluster") == F.col("b.cluster"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .persist()
    )
    n_truth = truth.count()

    t0 = time.time()
    pairs = minhash_lsh_pairs(corpus, threshold=0.7).persist()
    n_pairs = pairs.count()
    lsh_sec = time.time() - t0

    found_planted = pairs.join(truth, ["id_a", "id_b"]).count()
    recall = found_planted / n_truth if n_truth else None

    t0 = time.time()
    # lang=None: the replica token-suffixing is opaque to the stopword
    # language heuristic (everything would drop as lang_mismatch and the
    # dedup stages would never run on this synthetic corpus)
    verdicts = curate_documents(
        corpus.select("doc_id", "text"), near_dup_threshold=0.7, lang=None
    ).persist()
    n_verdicts = verdicts.count()
    cur_sec = time.time() - t0
    reasons = {
        r["reason"] or "kept": r["count"]
        for r in verdicts.groupBy("reason").count().collect()
    }

    print(
        json.dumps(
            {
                "corpus_docs": n_docs,
                "planted_truth_pairs": n_truth,
                "lsh_pairs_found_total": n_pairs,
                "planted_pairs_found": found_planted,
                "planted_pair_recall": round(recall, 4) if recall is not None else None,
                "minhash_lsh_wall_sec": round(lsh_sec, 1),
                "curation_wall_sec": round(cur_sec, 1),
                "curation_verdict_rows": n_verdicts,
                "curation_no_row_loss": n_verdicts == n_docs,
                "curation_reasons": reasons,
            }
        )
    )
    return 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sys.exit(
        main(
            args[0] if args else "/root/testdata/sf0.1",
            int(args[1]) if len(args) > 1 else 400,
        )
    )
