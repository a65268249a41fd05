"""Fused single-pass per-column statistics (north rule / SURVEY.md §2.5).

One ``df.agg(...)`` computes, for every watched column in a SINGLE scan +
single partial-aggregation pass (Catalyst fuses all agg expressions into one
HashAggregate; map-side partials mean the shuffle carries one row per
partition, regardless of table size — this is what makes the pass viable at
10^12 rows):

* row count, null count / null rate   (reference seed: required checks,
  json_schema/constraints/objects.py:94-103)
* min / max / mean (numeric columns)
* distinct count — HyperLogLog++ sketch via ``approx_count_distinct``
  (reference seed: uniqueItems, json_schema/constraints/arrays.py:72-98),
  or exact when ``exact_distinct=True`` (exact needs a per-column expand —
  only for oracle comparisons at small scale)
* quantile sketch via ``percentile_approx`` (Spark's GK sketch; the KLL± of
  PAPERS.md with the same error/size contract for this use)

The long-format reshape (one output row per column) happens on the single
aggregated row — a driver-side-size explode, zero extra jobs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def column_stats(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    rsd: float = 0.05,
    exact_distinct: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """One row per watched column:
    (column, n_rows, n_null, null_rate, n_distinct, min, max, mean, quantiles).

    min/max/mean/quantiles are NULL for non-numeric columns; min/max are also
    reported as strings (min_str/max_str) for any orderable column.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns else list(fields)

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = fields[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__nd"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c), rsd).alias(f"{c}__nd"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"{c}__max"))
            # string renderings keep the ORIGINAL type (bigint 553 → '553',
            # not '553.0') for cross-engine comparability
            aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__mins"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__maxs"))
            aggs.append(F.avg(F.col(c)).alias(f"{c}__mean"))
            aggs.append(
                F.percentile_approx(
                    F.col(c).cast("double"), list(quantiles), accuracy
                ).alias(f"{c}__q")
            )
        elif isinstance(dt, (T.StringType, T.DateType, T.TimestampType)):
            aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__mins"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__maxs"))

    agg = df.agg(*aggs)

    per_col = []
    for c in cols:
        dt = fields[c]
        numeric = isinstance(dt, _NUMERIC)
        orderable_str = isinstance(dt, (T.StringType, T.DateType, T.TimestampType))
        per_col.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nn").alias("n_null"),
                (F.col(f"{c}__nn") / F.col("__n")).alias("null_rate"),
                F.col(f"{c}__nd").alias("n_distinct"),
                (F.col(f"{c}__min") if numeric else F.lit(None).cast("double")).alias("min"),
                (F.col(f"{c}__max") if numeric else F.lit(None).cast("double")).alias("max"),
                (F.col(f"{c}__mean") if numeric else F.lit(None).cast("double")).alias("mean"),
                (
                    F.col(f"{c}__q")
                    if numeric
                    else F.lit(None).cast(T.ArrayType(T.DoubleType()))
                ).alias("quantiles"),
                (
                    F.col(f"{c}__mins")
                    if (orderable_str or numeric)
                    else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"{c}__maxs")
                    if (orderable_str or numeric)
                    else F.lit(None).cast("string")
                ).alias("max_str"),
            )
        )

    return agg.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")
