"""Lineage checkpoint / resume: idempotency under retry (north rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _annotated(spark):
    from json_schema_py_spark.schema.compiler import with_violations
    from json_schema_py_spark.sources.synth import DOCUMENTS_RULESET, spans_documents

    return with_violations(
        spans_documents(spark, SF).repartition(4), DOCUMENTS_RULESET
    )


def test_verdict_rollup(spark):
    from json_schema_py_spark.plans.validation import partition_verdicts

    v = partition_verdicts(_annotated(spark), run_id="r1").collect()
    assert len(v) == 4
    assert sum(r["docs"] for r in v) == 500
    assert any(not r["pass"] for r in v)


def test_checkpoint_resume_and_retry_dedup(spark, tmp_path):
    from json_schema_py_spark.plans.checkpoint import LineageLog
    from json_schema_py_spark.plans.validation import partition_verdicts

    log = LineageLog(spark, str(tmp_path / "lineage"))
    ann = _annotated(spark)
    verdicts = partition_verdicts(ann, run_id="r1")

    # checkpoint only partitions 0 and 1 (simulate a killed run)
    log.append(verdicts.where(F.col("partition_id") < 2))
    remaining = log.remaining(ann, "r1")
    done_docs = verdicts.where(F.col("partition_id") < 2).agg(F.sum("docs")).collect()[0][0]
    assert remaining.count() == 500 - done_docs

    # retry appends the same partitions again → last-writer-wins dedup
    log.append(verdicts.where(F.col("partition_id") < 2))
    assert log.completed("r1").count() == 2

    # finish the run; nothing remains
    log.append(verdicts.where(F.col("partition_id") >= 2))
    assert log.remaining(ann, "r1").count() == 0
    assert log.completed("r1").count() == 4

    # a different run_id is unaffected
    assert log.remaining(ann, "r2").count() == 500


def test_run_validation_end_to_end(spark):
    from json_schema_py_spark.plans.validation import run_validation
    from json_schema_py_spark.sources.synth import (
        DOCUMENTS_RULESET,
        MEDIA_DEPENDENCY_RULESET,
        media_dim,
        spans_documents,
    )

    sd = spans_documents(spark, SF)
    run = run_validation(
        sd,
        {"structural": DOCUMENTS_RULESET, "dep": MEDIA_DEPENDENCY_RULESET},
        media_dim=media_dim(spark),
    )
    by_rule = {r["rule_id"]: r["cnt"] for r in
               run.violations.groupBy("rule_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # 7 structural plants + anyOf + uniqueness(2 rows/pair) + referential
    assert by_rule["ANY_OF_NO_MATCH"] == 5
    assert by_rule["UNIQUENESS_VIOLATION"] == 10
    assert by_rule["REFERENTIAL_VIOLATION"] == 5
    assert run.verdicts.agg(F.sum("docs")).collect()[0][0] == 500


def test_run_validation_with_drift(spark):
    """Drift baselines wired into the single validation plan: a shifted
    column trips DISTRIBUTION_DRIFT; a matching baseline doesn't."""
    from pyspark.sql import functions as F2

    from json_schema_py_spark.operators.drift import histogram
    from json_schema_py_spark.plans.validation import run_validation
    from json_schema_py_spark.sources.synth import DOCUMENTS_RULESET, spans_documents

    sd = spans_documents(spark, SF).withColumn("n_spans", F2.size("spans"))
    self_hist = histogram(sd, "n_spans", 0.0, 10.0, 10)
    shifted = histogram(
        sd.withColumn("n_spans", F2.col("n_spans") + 4), "n_spans", 0.0, 10.0, 10
    )

    clean = run_validation(
        sd, {"structural": DOCUMENTS_RULESET},
        drift_baselines={"n_spans": self_hist}, drift_histogram=(0.0, 10.0, 10),
    )
    assert clean.violations.where(F2.col("rule_id") == "DISTRIBUTION_DRIFT").count() == 0

    drifted = run_validation(
        sd, {"structural": DOCUMENTS_RULESET},
        drift_baselines={"n_spans": shifted}, drift_histogram=(0.0, 10.0, 10),
    )
    rows = drifted.violations.where(F2.col("rule_id") == "DISTRIBUTION_DRIFT").collect()
    assert len(rows) == 1 and rows[0]["path"] == "/n_spans"
