"""Referential-integrity checks as anti-joins (north rule; reference seed:
property ``dependencies`` + ``$ref``, json_schema/constraints/objects.py:105-116
and constraints/references.py — the cross-table analogue).

Join strategy matters more than anything else here at 10^12 rows:

* small dimension (the media dim is a few thousand refs even in production)
  → ``F.broadcast(dim)`` left-anti: zero shuffle of the fact table.
* large dimension → salted sort-merge anti-join: the fact side's hot FK
  values (a handful of media refs can dominate an interleaved corpus) are
  exploded over ``salt`` replicas of the matching dim rows, so no single
  reducer sees a whole hot key. AQE skew-join remains on as a backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from json_schema_py_spark.errors import ErrorCode


def fk_violations(
    fact: DataFrame,
    fk_col: str,
    dim: DataFrame,
    pk_col: str,
    broadcast_dim: bool = True,
    salt_buckets: int = 0,
) -> DataFrame:
    """Rows of ``fact`` whose non-null ``fk_col`` has no match in
    ``dim.pk_col``. Shape-preserving (returns fact columns)."""
    f = fact.where(F.col(fk_col).isNotNull())
    d = dim.select(F.col(pk_col).alias(fk_col)).dropDuplicates([fk_col])
    if broadcast_dim:
        return f.join(F.broadcast(d), fk_col, "left_anti")
    if salt_buckets > 1:
        # salt the fact side; replicate the dim side over all salts so every
        # (fk, salt) partition can resolve membership locally
        fs = f.withColumn("_salt", F.pmod(F.xxhash64(F.rand(seed=7)), F.lit(salt_buckets)))
        ds = d.crossJoin(
            F.broadcast(
                fs.sparkSession.range(salt_buckets).select(F.col("id").cast("long").alias("_salt"))
            )
        )
        return fs.join(ds, [fk_col, "_salt"], "left_anti").drop("_salt")
    return f.join(d, fk_col, "left_anti")


def spans_fk_violations(
    spans_df: DataFrame,
    media: DataFrame,
    broadcast_dim: bool = True,
) -> DataFrame:
    """media_ref → media dimension check over the interleaved documents
    table, exploded with position so the violation path is exact:
    (doc_id, REFERENTIAL_VIOLATION, /spans/{i}/media_ref, ref)."""
    ex = spans_df.select(
        F.col("doc_id"),
        F.posexplode("spans").alias("pos", "span"),
    ).select(
        "doc_id", "pos", F.col("span.media_ref").alias("media_ref")
    ).where(F.col("media_ref").isNotNull())
    missing = fk_violations(ex, "media_ref", media, "media_ref", broadcast_dim)
    return missing.select(
        F.col("doc_id"),
        F.lit(ErrorCode.REFERENTIAL_VIOLATION.value).alias("rule_id"),
        F.concat(F.lit("/spans/"), F.col("pos").cast("string"), F.lit("/media_ref")).alias("path"),
        F.col("media_ref").alias("observed"),
    )
