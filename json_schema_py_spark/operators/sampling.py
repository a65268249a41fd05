"""Deterministic corpus sampling — the mixture-building primitive a
training-data pipeline needs beside select_mixture (operators/packing):
reproducible subsets that survive re-runs, re-partitioning, and engine
upgrades, because membership is a pure function of the ROW (seeded md5 of
the id), never of Spark's partition-RNG state (df.sample is neither
stable across layouts nor oracle-recomputable).

Three flavors, three scale shapes:

* ``hash_sample`` — Bernoulli-by-hash: keep rows whose 60-bit seeded hash
  falls under fraction × 2^60. ZERO shuffle (a pure filter projection,
  pushes to the scan); the realized count is binomial around
  fraction × n. The 10^12-row default.
* ``stratified_sample`` — EXACT n per stratum: rank rows within each
  stratum by (hash, id) and keep the first n. One shuffle+sort on the
  stratum key (a window); deterministic total order, so re-runs pick the
  identical rows. For per-stratum caps/quotas (domain quotas, per-source
  eval slices) where exact counts matter more than the sort.

* ``shuffle_shards`` — deterministic global training shuffle: seeded
  hash → shard assignment + within-shard position. ONE hash shuffle on
  the shard key plus a partition-local external sort; no global sort.

All are exactly recomputable in DuckDB with the same md5 arithmetic
(functions/text.stable_hash64) — gate queries q_hash_sample /
q_stratified_sample recompute every kept row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from json_schema_py_spark.functions.text import stable_hash64

_HASH_SPACE = 1 << 60  # stable_hash64 is a 60-bit value (15 hex chars)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli-ish sample: rows where
    hash(seed|id) < fraction × 2^60. Pure filter — no shuffle, no state;
    disjoint seeds give independent samples; the SAME seed+fraction is a
    deterministic subset relation (fraction 0.1 ⊂ fraction 0.2), which
    makes growing a sample monotone instead of a resample."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(fraction * _HASH_SPACE)
    return df.where(
        stable_hash64(F.col(id_col).cast("string"), seed=seed) < F.lit(cut)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by ascending (hash(seed|id), id) — a deterministic
    uniform draw with a total tie-break order, so identical inputs give
    identical samples at any partitioning. One window per stratum key;
    skewed strata lean on the same AQE skew handling as every groupBy —
    and the output is bounded at strata × n rows regardless of input."""
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    h = stable_hash64(F.col(id_col).cast("string"), seed=seed)
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "shuffle",
) -> DataFrame:
    """Deterministic global shuffle into training shards — the write-path
    op every training run needs: an order that is (a) uniformly random
    w.r.t. any input structure, (b) a pure function of (seed, id) so
    re-runs, resumed runs, and engine upgrades produce the IDENTICAL
    order, (c) splittable into n_shards files.

    One seeded hash drives both coordinates: shard_id = h mod n_shards,
    pos = dense rank of (h, id) within the shard (0-based). Plan shape is
    exactly Spark's production shard-write pattern — one hash-shuffle on
    shard_id, then a PARTITION-LOCAL sort (window per shard; each shard
    is corpus/n_shards rows and Spark's external sort spills, so size
    n_shards for the target corpus: at 100 TB use 10^4-10^5 shards, never
    32). No global sort exists anywhere in the plan.

    Output: input columns + (shard_id, pos). Exactly recomputable in
    DuckDB (gate query q_sampling 'shards' arm)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = stable_hash64(F.col(id_col).cast("string"), seed=seed)
    out = df.withColumn("_h", h).withColumn(
        "shard_id", (F.col("_h") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard_id").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return (
        out.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("_h")
    )
