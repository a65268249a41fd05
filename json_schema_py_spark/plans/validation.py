"""End-to-end validation plan: ruleset(s) + engine checks → violations +
per-partition verdicts (the reference's ValidationResult lifted to a table;
reference: json_schema/api.py:42-79, json_schema/validator.py:31-60).

Plan shape (one fused scan for all per-row work):

    parquet scan ──(projection: violations array per ruleset)──┐
        │                                                      ├── union →
        ├── per-partition rollup (spark_partition_id groupBy)  │ violations
        ├── uniqueness: salted 2-stage agg + semi join ────────┤
        └── FK: posexplode + broadcast/salted anti-join ───────┘

Per-row rulesets never shuffle; the only shuffles are the engine-level
cross-row checks, each individually skew-hardened (see their modules).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Any, Mapping, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from json_schema_py_spark.operators.referential import spans_fk_violations
from json_schema_py_spark.operators.uniqueness import uniqueness_violations
from json_schema_py_spark.schema.compiler import validate, with_violations


def partition_verdicts(df_with_valid: DataFrame, run_id: str = "run-0") -> DataFrame:
    """Per-partition pass/fail rollup (north rule): one row per input
    partition — (run_id, partition_id, pass, docs, violations)."""
    return (
        df_with_valid.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.size("violations")).alias("violations"),
            (F.sum(F.size("violations")) == 0).alias("pass"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            "partition_id",
            "pass",
            "docs",
            "violations",
        )
    )


@dataclass
class ValidationRun:
    violations: DataFrame  # (doc_id, rule_id, path, observed)
    verdicts: DataFrame  # (run_id, partition_id, pass, docs, violations)
    annotated: DataFrame  # input + violations array + valid flag


def run_validation(
    df: DataFrame,
    rulesets: Mapping[str, Any],
    key_col: str = "doc_id",
    unique_key: Optional[str] = "doc_id",
    media_dim: Optional[DataFrame] = None,
    drift_baselines: Optional[Mapping[str, DataFrame]] = None,
    drift_histogram: Optional[tuple] = None,
    drift_threshold: float = 0.25,
    run_id: str = "run-0",
) -> ValidationRun:
    """Validate ``df`` against every ruleset plus the engine-level checks.

    ``drift_baselines``: {column: baseline (bucket, cnt) histogram}; current
    histograms use ``drift_histogram=(lo, hi, nbins)`` bounds. A PSI above
    ``drift_threshold`` adds one table-level DISTRIBUTION_DRIFT row
    (doc_id NULL) to the violations union."""
    parts: list[DataFrame] = [
        validate(df, schema, key_col=key_col) for schema in rulesets.values()
    ]
    if unique_key is not None:
        parts.append(uniqueness_violations(df, unique_key))
    if media_dim is not None and "spans" in df.columns:
        parts.append(spans_fk_violations(df, media_dim))
    if drift_baselines:
        from json_schema_py_spark.operators.drift import histogram, psi_drift_violation

        lo, hi, nbins = drift_histogram or (0.0, 1000.0, 20)
        for col, baseline in drift_baselines.items():
            cur = histogram(df, col, lo, hi, nbins)
            parts.append(
                psi_drift_violation(cur, baseline, threshold=drift_threshold, column=col)
            )
    violations = reduce(lambda a, b: a.unionByName(b), parts)

    first_schema = next(iter(rulesets.values()))
    annotated = with_violations(df, first_schema)
    verdicts = partition_verdicts(annotated, run_id)
    return ValidationRun(violations=violations, verdicts=verdicts, annotated=annotated)
