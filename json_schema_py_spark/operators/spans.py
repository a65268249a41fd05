"""Span-sequence invariants (BASELINE.json input_hint: per-row invariant vs
the reference — span-sequence equality (kind, text, media_ref, order)).

The engine validates via expressions over the spans array (and posexplode in
the FK path) but must NEVER mutate or reorder a document's spans. These
helpers prove that: a canonical order-sensitive fingerprint per doc, and a
set-difference between two tables of documents. Fingerprint = xxhash64 over
the JSON rendering of the spans array — order-sensitive, null-field-stable,
one projection, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_fingerprints(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """(doc_id, n_spans, span_fp) — order-sensitive sequence fingerprint."""
    return df.select(
        "doc_id",
        F.size(spans_col).alias("n_spans"),
        F.xxhash64(F.to_json(F.col(spans_col))).alias("span_fp"),
    )


def sequence_mismatches(
    before: DataFrame, after: DataFrame, spans_col: str = "spans"
) -> DataFrame:
    """Docs whose span sequence changed between two snapshots (or that
    appear in only one). Empty result = exact span-sequence equality.
    Implemented as a symmetric anti-join on (doc_id, fingerprint)."""
    b = span_fingerprints(before, spans_col).withColumn(
        "doc_id", F.coalesce("doc_id", F.lit("\x00null"))
    )
    a = span_fingerprints(after, spans_col).withColumn(
        "doc_id", F.coalesce("doc_id", F.lit("\x00null"))
    )
    on = ["doc_id", "span_fp"]
    only_b = b.join(a, on, "left_anti").withColumn("side", F.lit("before"))
    only_a = a.join(b, on, "left_anti").withColumn("side", F.lit("after"))
    return only_b.unionByName(only_a)
