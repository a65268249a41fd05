"""Skew handling: hot doc_id ranges (north rule: 'explicit skew handling on
hot doc_id ranges'). A synthetic corpus where one key owns ~30% of all rows
must produce identical results through the salted and unsalted paths, and
the salted plan must spread the hot key across reducers."""

from __future__ import annotations

from pyspark.sql import functions as F


def _skewed(spark, n=50_000, hot_share=0.3):
    """Deterministic skewed keys: first hot_share of rows share ONE key."""
    hot_n = int(n * hot_share)
    return spark.range(n).select(
        F.when(F.col("id") < hot_n, F.lit("doc-HOT"))
        .otherwise(F.concat(F.lit("doc-"), F.col("id").cast("string")))
        .alias("doc_id"),
        (F.col("id") % 97).alias("payload"),
    )


def test_salted_uniqueness_correct_under_skew(spark):
    from json_schema_py_spark.operators.uniqueness import duplicate_keys

    df = _skewed(spark)
    out = {(r["doc_id"], r["cnt"]) for r in duplicate_keys(df, "doc_id", salt_buckets=64).collect()}
    assert out == {("doc-HOT", 15_000)}
    plain = {(r["doc_id"], r["cnt"]) for r in duplicate_keys(df, "doc_id", salt_buckets=None).collect()}
    assert out == plain


def test_salted_stage_spreads_hot_key(spark):
    """The salted partial aggregation must materially reduce the max rows any
    single reducer sees for the hot key (15k rows → ≤ ~15k/64 per salt)."""
    from pyspark.sql import functions as F2

    df = _skewed(spark)
    salt = F2.pmod(F2.xxhash64(F2.monotonically_increasing_id()), F2.lit(64))
    partial = (
        df.groupBy("doc_id", salt.alias("s"))
        .agg(F2.count(F2.lit(1)).alias("c"))
        .where(F2.col("doc_id") == "doc-HOT")
    )
    per_salt = [r["c"] for r in partial.collect()]
    assert sum(per_salt) == 15_000
    assert max(per_salt) < 1_500  # no reducer sees more than ~10% of the hot key


def test_salted_fk_correct_under_skew(spark):
    """Hot FK value: salted SMJ anti-join ≡ broadcast anti-join."""
    from json_schema_py_spark.operators.referential import fk_violations

    n = 20_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 3 == 0, F.lit("m/HOT.png"))
        .when(F.col("id") % 17 == 1, F.concat(F.lit("m/ghost-"), F.col("id").cast("string")))
        .otherwise(F.concat(F.lit("m/"), (F.col("id") % 37).cast("string"), F.lit(".png")))
        .alias("media_ref")
    )
    dim = spark.range(37).select(
        F.concat(F.lit("m/"), F.col("id").cast("string"), F.lit(".png")).alias("media_ref")
    ).unionByName(spark.createDataFrame([("m/HOT.png",)], ["media_ref"]))

    bc = fk_violations(fact, "media_ref", dim, "media_ref", broadcast_dim=True)
    salted = fk_violations(fact, "media_ref", dim, "media_ref", broadcast_dim=False, salt_buckets=16)
    assert bc.count() == salted.count() > 0
    assert {r["media_ref"] for r in salted.collect()} == {
        r["media_ref"] for r in bc.collect()
    }
