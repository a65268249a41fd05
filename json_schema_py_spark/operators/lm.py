"""N-gram language-model perplexity scoring — the CCNet/Gopher-style
quality filter a pretraining pipeline runs at corpus scale: train a
smoothed bigram LM on a reference corpus, score every candidate document,
drop/bucket by perplexity. A 5-gram KenLM is the production tool; the
bigram form here keeps the SAME distributed shape (count tables + a
per-token scoring join) while staying exactly DuckDB-oracle-able — the
smoothing arithmetic is recomputed bit-for-bit by the gate query
(q_lm_perplexity).

Scale shape:
* ``train_bigram_lm`` — two map-side-combinable groupBys over the
  exploded token stream (unigrams, bigrams) after OOV-mapping to a
  deterministic top-``vocab_size`` vocabulary (count DESC, token ASC —
  no sketch wobble in the vocab). Output is bounded by the vocabulary:
  ≤ V unigram rows, ≤ observed-bigram rows (≪ V² in practice).
* ``score_perplexity`` — posexplode + ONE broadcast vocab join + ONE
  per-doc window (lead) to form bigrams, then joins against the count
  tables — the unigram table broadcasts (≤ V rows by construction); the
  bigram table shuffle-joins on (w, w2) because its cardinality is
  observed-corpus-bigrams (up to V², multi-TB at web scale), with
  Spark's size threshold still auto-broadcasting genuinely small LMs —
  and one per-doc aggregation. Nothing quadratic, nothing driver-side
  beyond the bounded vocab count.

Smoothing: add-k (Laplace for k=1):
    P(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k·V)
with V = number of distinct unigram types in the LM (including <unk>).
perplexity = exp(−mean ln P) over the document's bigrams; documents with
fewer than 2 tokens carry NULL scores (no bigram evidence — callers
decide their fate, never a silent drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from json_schema_py_spark.functions.text import tokens
from json_schema_py_spark.util import ensure_parallelism

UNK = "<unk>"


def _mapped_token_stream(
    docs: DataFrame, vocab: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, pos, w): the corpus token stream with out-of-vocabulary
    tokens mapped to <unk>. One explode + one broadcast join."""
    toks = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    v = vocab.select(F.col("w").alias("tok"), F.lit(True).alias("_in_v"))
    return toks.join(F.broadcast(v), "tok", "left").select(
        "doc_id",
        "pos",
        F.when(F.col("_in_v"), F.col("tok")).otherwise(F.lit(UNK)).alias("w"),
    )


def train_bigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(vocab, unigrams, bigrams): a deterministic add-k-ready bigram LM.

    vocab     — (w) the top ``vocab_size`` raw tokens by (count DESC,
                token ASC); everything else trains and scores as <unk>.
    unigrams  — (w, cnt) counts over the OOV-mapped stream (<unk> row
                included), the conditioning denominators.
    bigrams   — (w1, w2, cnt) counts of adjacent OOV-mapped pairs within
                each document (never across document boundaries).

    The vocab ranking is an exact top-k over the token-count table
    (≪ corpus; one groupBy + one bounded sort), not a sketch — two runs
    over the same corpus produce the identical LM."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    raw = ensure_parallelism(corpus).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    counts = raw.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    # two-stage exact top-k (the _rank_topk shape): every count partition
    # keeps its LOCAL top vocab_size first, so the global rank sorts
    # ≤ partitions × vocab_size survivors — never the full distinct-token
    # table (Heaps' law: ~10^9 types at 100 TB) through one task. Any
    # global top-k token is by definition in its own partition's top-k,
    # so the prefilter is lossless.
    wl = Window.partitionBy("_pid").orderBy(F.col("cnt").desc(), F.col("tok").asc())
    survivors = (
        counts.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrk", F.row_number().over(wl))
        .where(F.col("_lrk") <= vocab_size)
    )
    wv = Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    vocab = (
        survivors.withColumn("_rk", F.row_number().over(wv))
        .where(F.col("_rk") <= vocab_size)
        .select(F.col("tok").alias("w"))
    )
    stream = _mapped_token_stream(corpus, vocab, text_col, id_col)
    unigrams = stream.groupBy(F.col("w")).agg(F.count(F.lit(1)).alias("cnt"))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    pairs = stream.withColumn("w2", F.lead("w").over(wd)).where(
        F.col("w2").isNotNull()
    )
    bigrams = pairs.groupBy(
        F.col("w").alias("w1"), F.col("w2")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return vocab, unigrams, bigrams


def score_perplexity(
    docs: DataFrame,
    vocab: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logp, perplexity) for EVERY input doc —
    add-k bigram perplexity under the given LM. Docs with < 2 tokens get
    NULL scores (n_bigrams 0). The vocab and unigram tables broadcast
    (≤ V rows); the bigram table shuffle-joins (see module doc); the
    corpus-sized shuffles are the per-doc window, that bigram join, and
    the final per-doc aggregation."""
    if k <= 0:
        raise ValueError(f"smoothing k must be > 0, got {k}")
    # V = unigram TYPE count (incl. <unk>), folded into the plan as a
    # broadcast 1-row aggregate — an eager .count() here re-executed the
    # whole train lineage (full corpus tokenize + vocab + groupBy) once
    # at plan-build time and again inside the scoring job (review r05)
    v_row = F.broadcast(unigrams.agg(F.count(F.lit(1)).cast("double").alias("_V")))
    stream = _mapped_token_stream(docs, vocab, text_col, id_col)
    wd = Window.partitionBy("doc_id").orderBy("pos")
    pairs = stream.withColumn("w2", F.lead("w").over(wd)).where(
        F.col("w2").isNotNull()
    )
    uni = unigrams.select(F.col("w").alias("w"), F.col("cnt").alias("_c1"))
    bi = bigrams.select(
        F.col("w1").alias("w"), F.col("w2"), F.col("cnt").alias("_c2")
    )
    # uni broadcasts (truly bounded by the capped vocab: ≤ V rows); the
    # BIGRAM table is bounded by observed corpus bigrams — up to V² rows
    # (2.5×10^9 at V=50k), multi-TB on a web corpus — so it must NEVER be
    # force-broadcast: a plain shuffle join on (w, w2) with AQE is the
    # right plan, and Spark's size threshold still auto-broadcasts it
    # when a small LM genuinely fits (round-5 VERDICT item 1)
    scored = (
        pairs.join(bi, ["w", "w2"], "left")
        .join(F.broadcast(uni), "w", "left")
        .crossJoin(v_row)
        .select(
            "doc_id",
            (
                F.log(
                    (F.coalesce(F.col("_c2"), F.lit(0)) + F.lit(k))
                    / (F.coalesce(F.col("_c1"), F.lit(0)) + F.lit(k) * F.col("_V"))
                )
            ).alias("_lp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("_lp").alias("_sum_lp"),
    )
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(F.col("_sum_lp") / F.col("n_bigrams"), round_to).alias("avg_logp"),
            F.round(F.exp(-F.col("_sum_lp") / F.col("n_bigrams")), round_to).alias(
                "perplexity"
            ),
        )
    )
    return out
